"""Pure-Python subsystem parity: data pipeline DAG, encoders, dynamic
batch bucketing, ARPA n-gram LM."""

import io

import numpy as np
import pytest


def test_data_pipeline_parity(ref):
    from speechbrain.utils.data_pipeline import (
        DataPipeline as RefDP,
        takes as ref_takes,
        provides as ref_provides,
    )
    from speechbrain_tpu.utils.data_pipeline import (
        DataPipeline,
        takes,
        provides,
    )

    @ref_takes("a", "b")
    @ref_provides("c")
    def rf1(a, b):
        return a + b

    @ref_takes("c")
    @ref_provides("d", "e")
    def rf2(c):
        yield c * 2
        yield c * 3

    @takes("a", "b")
    @provides("c")
    def of1(a, b):
        return a + b

    @takes("c")
    @provides("d", "e")
    def of2(c):
        yield c * 2
        yield c * 3

    theirs = RefDP(["a", "b"], [rf1, rf2])
    theirs.set_output_keys(["d", "e"])
    ours = DataPipeline(["a", "b"], [of1, of2])
    ours.set_output_keys(["d", "e"])
    t = theirs({"a": 3, "b": 4})
    o = ours({"a": 3, "b": 4})
    assert dict(t) == dict(o) == {"d": 14, "e": 21}


def test_categorical_encoder_parity(ref, tmp_path):
    from speechbrain.dataio.encoder import CategoricalEncoder as RefEnc
    from speechbrain_tpu.dataio.encoder import CategoricalEncoder

    items = ["cat", "dog", "cat", "fish", "dog", "bird"]
    theirs = RefEnc()
    ours = CategoricalEncoder()
    for enc in (theirs, ours):
        enc.update_from_iterable(items)
    assert theirs.lab2ind == ours.lab2ind
    # round-trip through the save format
    p_t = tmp_path / "ref.txt"
    p_o = tmp_path / "ours.txt"
    theirs.save(str(p_t))
    ours.save(str(p_o))
    reload = CategoricalEncoder()
    reload.load(str(p_t))  # our loader reads the reference's format
    assert reload.lab2ind == theirs.lab2ind


def test_text_encoder_bos_eos_parity(ref):
    from speechbrain.dataio.encoder import TextEncoder as RefEnc
    from speechbrain_tpu.dataio.encoder import TextEncoder

    sents = [["hello", "world"], ["good", "day", "world"]]
    theirs = RefEnc()
    theirs.update_from_iterable(sents[0] + sents[1], sequence_input=False)
    theirs.add_bos_eos()
    ours = TextEncoder()
    ours.update_from_iterable(sents[0] + sents[1], sequence_input=False)
    ours.add_bos_eos()
    assert theirs.lab2ind == ours.lab2ind
    t = theirs.prepend_bos_index(theirs.encode_sequence(sents[0]))
    o = ours.prepend_bos_index(ours.encode_sequence(sents[0]))
    assert list(t) == list(o)


def test_dynamic_batch_sampler_boundaries_parity(ref):
    """The lognorm-quantile bucket boundaries and per-bucket batch sizes
    must match (dataio/sampler.py:489-526)."""
    from speechbrain.dataio.sampler import (
        DynamicBatchSampler as RefSampler,
    )
    from speechbrain_tpu.dataio.sampler import DynamicBatchSampler

    rng = np.random.default_rng(101)
    durations = np.abs(rng.lognormal(1.0, 0.5, 200)) + 0.3

    from speechbrain.dataio.dataset import (
        DynamicItemDataset as RefDataset,
    )
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset

    data = {
        str(i): {"duration": float(d)} for i, d in enumerate(durations)
    }
    ref_sampler = RefSampler(
        RefDataset(data),
        max_batch_length=20.0,
        num_buckets=8,
        shuffle=False,
        length_func=lambda x: x["duration"],
    )
    ours = DynamicBatchSampler(
        DynamicItemDataset(data),
        max_batch_length=20.0,
        num_buckets=8,
        shuffle=False,
        length_func=lambda x: x["duration"],
    )
    ref_bounds = [float(b) for b in ref_sampler._bucket_boundaries]
    our_bounds = [float(b) for b in ours._bucket_boundaries]
    assert np.allclose(ref_bounds, our_bounds, rtol=1e-6), (
        ref_bounds,
        our_bounds,
    )
    assert list(ref_sampler._bucket_lens) == list(ours._bucket_lens)


ARPA_TEXT = """\\
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-1.0 hello -0.2
-1.2 world -0.1
-0.5 </s>
-0.8 <s> -0.3

\\2-grams:
-0.4 <s> hello
-0.3 hello world

\\end\\
"""


def test_arpa_backoff_lm_parity(ref, tmp_path):
    import speechbrain.lm.arpa as ref_arpa
    import speechbrain.lm.ngram as ref_ngram
    import speechbrain_tpu.lm.arpa as arpa
    import speechbrain_tpu.lm.ngram as ngram

    text = ARPA_TEXT.replace("\\\\", "\\")
    num_g_t, ngrams_t, backoffs_t = ref_arpa.read_arpa(io.StringIO(text))
    num_g_o, ngrams_o, backoffs_o = arpa.read_arpa(io.StringIO(text))
    assert num_g_t == num_g_o
    assert ngrams_t == ngrams_o
    assert backoffs_t == backoffs_o

    lm_t = ref_ngram.BackoffNgramLM(ngrams_t, backoffs_t)
    lm_o = ngram.BackoffNgramLM(ngrams_o, backoffs_o)
    for context, token in [
        (("<s>",), "hello"),
        (("hello",), "world"),
        (("world",), "</s>"),  # backoff path
        (("<s>",), "world"),  # backoff path
    ]:
        t = lm_t.logprob(token, context)
        o = lm_o.logprob(token, context)
        assert abs(t - o) < 1e-9, (context, token, t, o)
