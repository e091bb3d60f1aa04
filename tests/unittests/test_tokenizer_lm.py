import io

import pytest

from speechbrain_tpu.lm.arpa import read_arpa, write_arpa
from speechbrain_tpu.lm.ngram import (
    BackoffNgramLM,
    ngram_evaluation_details,
    ngram_perplexity,
)
from speechbrain_tpu.tokenizers.SentencePiece import BPEModel, SentencePiece

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat and the dog sat",
]


def test_bpe_roundtrip():
    model = BPEModel(vocab_size=60, model_type="bpe").train(CORPUS)
    for line in CORPUS:
        ids = model.encode_as_ids(line)
        assert model.decode_ids(ids) == line


def test_bpe_merges_learned():
    model = BPEModel(vocab_size=60, model_type="bpe").train(CORPUS)
    # "the" is frequent; should become few pieces
    pieces = model.encode_as_pieces("the the the")
    assert len(pieces) <= 6


def test_char_model():
    model = BPEModel(vocab_size=100, model_type="char").train(CORPUS)
    ids = model.encode_as_ids("cat")
    assert len(ids) == 4  # ▁ c a t
    assert model.decode_ids(ids) == "cat"


def test_unknown_char_maps_to_unk():
    model = BPEModel(vocab_size=60, model_type="bpe").train(CORPUS)
    ids = model.encode_as_ids("zebra")  # z, b, r not in corpus
    assert model.unk_id in ids


def test_sentencepiece_wrapper(tmp_path):
    csv_path = tmp_path / "train.csv"
    csv_path.write_text(
        "ID,words\n" + "\n".join(
            f"u{i},{line}" for i, line in enumerate(CORPUS)
        )
    )
    sp = SentencePiece(
        model_dir=str(tmp_path),
        vocab_size=60,
        annotation_train=str(csv_path),
        annotation_read="words",
        model_type="bpe",
    )
    out, lens = sp(["the cat", "a dog sat"])
    assert out.shape[0] == 2
    decoded = sp([out[1][: int(round(lens[1] * out.shape[1]))].tolist()],
                 task="decode_from_list")
    assert decoded[0] == ["a", "dog", "sat"]
    # Reload from disk
    sp2 = SentencePiece(
        model_dir=str(tmp_path), vocab_size=60, model_type="bpe"
    )
    assert sp2.sp.pieces == sp.sp.pieces


ARPA_TEXT = """\\data\\
ngram 1=3
ngram 2=2

\\1-grams:
-0.5\ta\t-0.4
-0.6\tb\t-0.3
-0.9\t</s>

\\2-grams:
-0.2\ta b
-0.3\tb </s>

\\end\\
"""


def test_read_arpa():
    num, ngrams, backoffs = read_arpa(io.StringIO(ARPA_TEXT))
    assert num == {1: 3, 2: 2}
    assert ngrams[1][()]["a"] == -0.5
    assert ngrams[2][("a",)]["b"] == -0.2
    assert backoffs[1][("a",)] == -0.4


def test_arpa_roundtrip():
    _, ngrams, backoffs = read_arpa(io.StringIO(ARPA_TEXT))
    flat = {}
    for d in backoffs.values():
        flat.update(d)
    out = io.StringIO()
    write_arpa(out, ngrams, flat)
    num2, ngrams2, backoffs2 = read_arpa(io.StringIO(out.getvalue()))
    assert ngrams2 == ngrams


def test_backoff_lm():
    _, ngrams, backoffs = read_arpa(io.StringIO(ARPA_TEXT))
    flat = {}
    for d in backoffs.values():
        flat.update(d)
    lm = BackoffNgramLM(ngrams, flat)
    assert lm.logprob("b", ("a",)) == -0.2
    # Unseen bigram (b a): backoff(b) + unigram(a) = -0.3 + -0.5
    assert abs(lm.logprob("a", ("b",)) - (-0.8)) < 1e-9


def test_perplexity():
    details = [{"num_tokens": 4, "neglogprob": 4.0}]
    assert ngram_perplexity(details) == 10.0


def test_unigram_training_and_roundtrip():
    """Native unigram: Viterbi-EM learns multi-char pieces, encoding
    round-trips, and save/load preserves scores."""
    import random

    from speechbrain_tpu.tokenizers.SentencePiece import BPEModel

    random.seed(0)
    words = [
        "printing", "interest", "inter", "nation", "international",
        "printer", "nationally", "print", "rest", "ring",
    ]
    sents = [" ".join(random.choices(words, k=6)) for _ in range(200)]
    m = BPEModel(vocab_size=60, model_type="unigram").train(sents)
    multi = [p for p in m.pieces if len(p.replace("▁", "")) > 2]
    assert len(multi) > 5  # real subword pieces, not chars
    for text in ["printing international interest", "restation print"]:
        assert m.decode_ids(m.encode_as_ids(text)) == text
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        m.save(f.name)
        m2 = BPEModel.load(f.name)
        assert m2.encode_as_ids("printing rest") == m.encode_as_ids(
            "printing rest"
        )
        assert m2.scores and m2.model_type == "unigram"
