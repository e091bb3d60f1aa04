import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.decoders.ctc import (
    CTCPrefixScorer,
    ctc_greedy_decode,
    filter_ctc_output,
)
from speechbrain_tpu.decoders.seq2seq import (
    S2SBeamSearcher,
    S2SGreedySearcher,
)
from speechbrain_tpu.decoders.transducer import TransducerBeamSearcher


def test_filter_ctc():
    assert filter_ctc_output([0, 0, 1, 1, 0, 2, 2], blank_id=0) == [1, 2]
    assert filter_ctc_output([1, 1, 1], blank_id=0) == [1]
    assert filter_ctc_output([], blank_id=0) == []


def test_greedy_ctc_decode():
    probs = jnp.array(
        [[[0.1, 0.9, 0.0], [0.1, 0.9, 0.0], [0.9, 0.1, 0.0], [0.0, 0.0, 1.0]]]
    )
    assert ctc_greedy_decode(probs, jnp.ones(1), blank_id=0) == [[1, 2]]


def _brute_force_ctc_logprob(lp, target, blank, min_start=False):
    """Total log P(target | x) by enumerating alignments.

    With ``min_start=True``, only count alignments where the k-th target
    symbol (1-indexed) is first emitted at frame >= k — the reference
    CTCPrefixScorer's convention (decoders/ctc.py:190: the recursion for
    the k-th expansion starts at frame max(1, prefix_length) with the
    bos counted in prefix_length), which excludes the earliest-frame
    paths from the score.
    """
    import itertools

    T, V = lp.shape
    total = -np.inf
    for alignment in itertools.product(range(V), repeat=T):
        collapsed = []
        first_frames = []
        for i, v in enumerate(alignment):
            if (i == 0 or v != alignment[i - 1]) and v != blank:
                collapsed.append(v)
                first_frames.append(i)
        if collapsed != list(target):
            continue
        if min_start and any(
            frame < k + 1 for k, frame in enumerate(first_frames)
        ):
            continue
        total = np.logaddexp(
            total, sum(lp[t, c] for t, c in enumerate(alignment))
        )
    return total


def test_ctc_prefix_scorer_matches_full_prob():
    """Committing y1..yU then scoring eos == CTC log-prob over the\n    reference-convention path set (k-th symbol emitted at frame >= k)."""
    rng = np.random.default_rng(0)
    T, V = 4, 4  # vocab: 0=blank, 1, 2, 3=eos
    blank, eos = 0, 3
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.normal(size=(1, T, V))), -1)
    )
    target = [1, 2]
    scorer = CTCPrefixScorer(
        jnp.asarray(lp), jnp.ones(1), batch_size=1, beam_size=1,
        blank_index=blank, eos_index=eos,
    )
    state = None
    inp = jnp.asarray([eos])  # bos placeholder (ignored at step 0)
    total = 0.0
    for tok in target:
        scores, state = scorer.forward_step(inp, state)
        total += float(scores[0, tok])
        state = scorer.permute_mem(state, jnp.asarray([tok]))
        inp = jnp.asarray([tok])
    scores, state = scorer.forward_step(inp, state)
    total += float(scores[0, eos])
    expected = _brute_force_ctc_logprob(lp[0], target, blank, min_start=True)
    assert abs(total - expected) < 1e-4


class _ToyTableSearcher(S2SGreedySearcher):
    """Emits a fixed log-prob table depending only on the step."""

    def __init__(self, table, **kwargs):
        super().__init__(**kwargs)
        self.table = jnp.asarray(table)

    def reset_mem(self, batch_size, enc_states):
        return {"t": jnp.zeros((batch_size,), jnp.int32)}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        step = memory["t"][0]
        row = self.table[jnp.minimum(step, self.table.shape[0] - 1)]
        log_probs = jnp.broadcast_to(
            row, (inp_tokens.shape[0], row.shape[-1])
        )
        return log_probs, {"t": memory["t"] + 1}, None


class _ToyTableBeam(S2SBeamSearcher):
    def __init__(self, table, **kwargs):
        super().__init__(**kwargs)
        self.table = jnp.asarray(table)

    def reset_mem(self, batch_size, enc_states):
        return {"t": jnp.zeros((batch_size,), jnp.int32)}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        step = memory["t"][0]
        row = self.table[jnp.minimum(step, self.table.shape[0] - 1)]
        log_probs = jnp.broadcast_to(
            row, (inp_tokens.shape[0], row.shape[-1])
        )
        return log_probs, {"t": memory["t"] + 1}, None


def _make_table():
    # vocab: 0, 1, 2(eos). step0: prefer 1; step1: prefer 0; step2: eos.
    table = np.full((3, 3), -5.0)
    table[0, 1] = -0.1
    table[1, 0] = -0.1
    table[2, 2] = -0.05
    return np.asarray(jax.nn.log_softmax(jnp.asarray(table), -1))


def test_greedy_searcher_follows_argmax():
    table = _make_table()
    searcher = _ToyTableSearcher(
        table, bos_index=2, eos_index=2, min_decode_ratio=0.0,
        max_decode_ratio=1.0,
    )
    enc = jnp.zeros((2, 10, 4))
    hyps, scores = searcher(enc, jnp.ones(2))
    assert hyps == [[1, 0], [1, 0]]


def test_beam_matches_greedy_on_peaked_scores():
    table = _make_table()
    greedy = _ToyTableSearcher(
        table, bos_index=2, eos_index=2, min_decode_ratio=0.0,
        max_decode_ratio=1.0,
    )
    beam = _ToyTableBeam(
        table, bos_index=2, eos_index=2, min_decode_ratio=0.0,
        max_decode_ratio=1.0, beam_size=3, using_eos_threshold=False,
        length_normalization=True,
    )
    enc = jnp.zeros((1, 10, 4))
    ghyps, _ = greedy(enc, jnp.ones(1))
    bhyps, _ = beam(enc, jnp.ones(1))
    assert bhyps == ghyps


def test_beam_finds_delayed_reward():
    """Beam > greedy: token 0 first looks worse but pays off later."""
    # vocab: 0, 1, 2(eos)
    # Sequences: after picking 0, eos is very likely (good score);
    # after picking 1, forced low-prob continuation.
    # Model: log-probs depend on previous token (memory = last token).
    class _Searcher(S2SBeamSearcher):
        def reset_mem(self, n, enc_states):
            return {"step": jnp.zeros((n,), jnp.int32)}

        def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
            # inp_tokens is the LAST COMMITTED token of each row.
            # First step (inp == bos): slightly prefer 1; after 0:
            # strongly prefer eos; after 1: everything bad.
            first = memory["step"] == 0
            after0 = inp_tokens == 0
            row_first = jnp.asarray([0.45, 0.55, 0.0])
            row_after0 = jnp.asarray([0.01, 0.01, 0.98])
            row_after1 = jnp.asarray([0.33, 0.33, 0.34])
            probs = jnp.where(
                first[:, None],
                row_first,
                jnp.where(after0[:, None], row_after0, row_after1),
            )
            log_probs = jnp.log(probs + 1e-9)
            return log_probs, {"step": memory["step"] + 1}, None

    beam = _Searcher(
        bos_index=2, eos_index=2, min_decode_ratio=0.0,
        max_decode_ratio=0.3, beam_size=3, using_eos_threshold=False,
        length_normalization=False,
    )
    # memory["last"] starts -1; first forward_step gets bos -> treat as first
    enc = jnp.zeros((1, 10, 4))
    hyps, scores = beam(enc, jnp.ones(1))
    # best full path: [0] then eos: log(0.45*0.98) > log(0.55*0.34)
    assert hyps == [[0]]


def test_transducer_greedy():
    """Joint net reads the encoder frame only -> deterministic emits."""
    B, T, V = 2, 5, 4
    blank = 0
    frame_tokens = np.array([[0, 1, 1, 0, 2], [3, 0, 0, 2, 0]])

    def pred_step(tokens, state, batch):
        return jnp.zeros((batch, 4)), {"dummy": jnp.zeros((batch, 1))}

    def joint(enc_t, pred_out):
        return enc_t  # logits directly from encoder frame

    searcher = TransducerBeamSearcher(
        decode_fn=pred_step, joint_fn=joint, blank_id=blank, beam_size=1
    )
    enc = np.full((B, T, V), -5.0, np.float32)
    for b in range(B):
        for t in range(T):
            enc[b, t, frame_tokens[b, t]] = 5.0
    hyps, scores = searcher(jnp.asarray(enc))
    assert hyps[0] == [1, 1, 2]
    assert hyps[1] == [3, 2]


def test_transducer_beam_equals_greedy_when_peaked():
    B, T, V = 1, 4, 4
    blank = 0

    def pred_step(tokens, state, batch):
        # pred_out = one-hot of the last emitted token (zero at start)
        if tokens is None:
            return jnp.zeros((batch, V)), {"dummy": jnp.zeros((batch, 1))}
        return (
            jax.nn.one_hot(tokens, V),
            {"dummy": jnp.zeros((batch, 1))},
        )

    def joint(enc_t, pred_out):
        # discourage immediate re-emission of the same token
        return enc_t - 8.0 * pred_out

    # Blank is plausible everywhere (frame-advance cost is moderate);
    # token 2 has a clear peak at frame 1 only.
    enc = np.full((B, T, V), -4.0, np.float32)
    enc[0, :, blank] = 2.0
    enc[0, 1, 2] = 4.0
    greedy = TransducerBeamSearcher(
        decode_fn=pred_step, joint_fn=joint, blank_id=blank, beam_size=1
    )
    beam = TransducerBeamSearcher(
        decode_fn=pred_step, joint_fn=joint, blank_id=blank, beam_size=3
    )
    g, _ = greedy(jnp.asarray(enc))
    b, _ = beam(jnp.asarray(enc))
    assert g[0] == [2]
    assert b[0] == [2]


def test_ctc_prefix_scorer_attention_window():
    """Windowed CTC prefix scoring: a full-width window reproduces the
    unwindowed scores exactly; a narrow window confines the alignment."""
    import numpy as np

    from speechbrain_tpu.decoders.ctc import CTCPrefixScorer

    rng = np.random.default_rng(11)
    B, beam, T, V = 1, 2, 12, 6
    x = np.log(
        rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
    )
    enc_lens = np.ones(B)
    n = B * beam

    full = CTCPrefixScorer(x, enc_lens, B, beam, blank_index=0, eos_index=1)
    wide = CTCPrefixScorer(
        x, enc_lens, B, beam, blank_index=0, eos_index=1,
        ctc_window_size=T,
    )
    narrow = CTCPrefixScorer(
        x, enc_lens, B, beam, blank_index=0, eos_index=1,
        ctc_window_size=1,
    )
    inp = np.full(n, 2, np.int64)
    # Attention peaked at frame 5 for every row.
    attn = np.zeros((n, T), np.float32)
    attn[:, 5] = 1.0

    s_full, st_full = full.forward_step(inp, None)
    s_wide, st_wide = wide.forward_step(inp, None, attn=attn)
    # Window [5-12, 5+12) covers all frames -> identical scores.
    assert np.allclose(np.asarray(s_full), np.asarray(s_wide), atol=1e-5)

    s_nar, _ = narrow.forward_step(inp, None, attn=attn)
    s_nar = np.asarray(s_nar)
    # Narrow window [4, 6) restricts the alignment mass: scores differ
    # from full scoring but stay finite for real candidates.
    assert not np.allclose(s_nar, np.asarray(s_full), atol=1e-3)
    assert np.isfinite(s_nar[:, 2:]).all()


def test_transducer_beam_batch_matches_per_utterance():
    """The lockstep-batched beam search must give each utterance exactly
    what a solo (B=1) run gives it — guards the cross-utterance batching
    of joint/prediction-net dispatches."""
    rng = np.random.default_rng(7)
    B, T, V, H = 4, 6, 5, 3
    blank = 0
    E = (0.5 * rng.standard_normal((V, H))).astype(np.float32)
    W = (0.5 * rng.standard_normal((H, V))).astype(np.float32)
    bias = rng.standard_normal((V,)).astype(np.float32)
    bias[blank] += 3.0  # keep blank in the topk (reference requirement)
    enc = (0.7 * rng.standard_normal((B, T, H))).astype(np.float32)

    def pred_step(tokens, state, batch):
        if tokens is None:
            return jnp.asarray(E[blank])[None].repeat(batch, 0), None
        return jnp.asarray(E)[tokens], None

    def joint(enc_t, pred_out):
        return (enc_t + pred_out) @ jnp.asarray(W) + jnp.asarray(bias)

    beam = TransducerBeamSearcher(
        decode_fn=pred_step, joint_fn=joint, blank_id=blank, beam_size=3
    )
    lens = np.array([1.0, 0.5, 1.0, 5 / 6])
    hyps, scores = beam.transducer_beam_search_decode(enc, lens)
    for b in range(B):
        solo_h, solo_s = beam.transducer_beam_search_decode(
            enc[b : b + 1], lens[b : b + 1]
        )
        assert hyps[b] == solo_h[0], (b, hyps[b], solo_h[0])
        np.testing.assert_allclose(scores[b], solo_s[0], rtol=1e-5)


def test_rnn_beam_hs_predecessor_permutation():
    """Regression: S2SRNNBeamSearcher must permute LAYER-MAJOR RNN
    hidden states (num_layers, n, H) by predecessor when beams reorder.

    Before round 3 the raw layer-major state went through the
    leading-axis gather, which permuted the LAYER axis (silently, via
    jax's clamped out-of-range gather) and left the batch axis alone —
    every recipe's beam search carried wrong hidden states.  The oracle
    here is an independent numpy beam search that tracks one explicit
    state per hypothesis.
    """
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    rng = np.random.default_rng(3)
    B, V, H, L, T = 2, 5, 4, 2, 4
    beam = 3
    eos = V - 1
    emb_W = rng.standard_normal((V, H)).astype(np.float32)
    out_W = rng.standard_normal((L * H, V)).astype(np.float32)
    enc = rng.standard_normal((B, T, H)).astype(np.float32)

    # toy recurrent decoder: hs (L, n, H); hs' = tanh(hs + emb(tok));
    # logits depend on the WHOLE hs stack, so wrong permutation of
    # either axis changes the scores.
    def step_np(tok, hs):
        hs = np.tanh(hs + emb_W[tok][None])
        logits = hs.transpose(1, 0, 2).reshape(hs.shape[1], -1) @ out_W
        logits[:, eos] = -100.0  # never end: pure permutation test
        return logits, hs

    def decoder_step_fn(emb_tok, hs, c, es, el, ast):
        tok = jnp.argmax(emb_tok, axis=-1)  # emb = one-hot (below)
        hs2 = jnp.tanh(hs + jnp.asarray(emb_W)[tok][None])
        logits = jnp.swapaxes(hs2, 0, 1).reshape(
            hs2.shape[1], -1
        ) @ jnp.asarray(out_W)
        logits = logits.at[:, eos].set(-100.0)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, hs2, c, None, ast

    searcher = S2SRNNBeamSearcher(
        embedding_fn=lambda t: jax.nn.one_hot(t, V),
        decoder_step_fn=decoder_step_fn,
        linear_fn=lambda d: d,  # decoder already returns log-probs
        dec_hidden_size=H,
        attn_init_fn=lambda es: jnp.zeros((es.shape[0], 1)),
        rnn_init_fn=lambda n, dtype: jnp.zeros((L, n, H), dtype),
        bos_index=0,
        eos_index=eos,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        beam_size=beam,
        using_eos_threshold=False,
        length_normalization=False,
    )
    import jax

    got_hyps, _ = searcher(enc, np.ones(B))

    # independent numpy beam search with per-hypothesis states
    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    for b in range(B):
        hyps = [([], 0.0, np.zeros((L, 1, H), np.float32), 0)]
        for _ in range(T):
            cands = []
            for tokens, score, hs, last in hyps:
                logits, hs2 = step_np(np.array([last]), hs)
                lp = logsoftmax(logits)[0]
                for v in range(V):
                    cands.append(
                        (tokens + [v], score + lp[v], hs2, v)
                    )
            cands.sort(key=lambda x: -x[1])
            hyps = cands[:beam]
        best = max(hyps, key=lambda x: x[1])
        assert got_hyps[b] == best[0], (b, got_hyps[b], best[0])


def test_transformer_beam_kv_cache_parity():
    """The KV-cached incremental decode path (decode_cache_init /
    decode_step) must produce the same hypotheses and scores as the
    prefix-buffer path that re-runs the full decoder each step —
    same parameters, same search configuration."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )

    rng = np.random.default_rng(0)
    B, T, F, V, D = 2, 12, 8, 11, 16
    model = TransformerASR(
        tgt_vocab=V, input_size=F, d_model=D, nhead=2,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=32,
        dropout=0.0, encoder_module="transformer",
        attention_type="regularMHA",
    )
    src = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    tgt = jnp.zeros((B, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, train=False)
    enc = model.apply(params, src, method="encode")
    lens = jnp.asarray([1.0, 0.7])

    W_out = jnp.asarray(rng.standard_normal((D, V)), jnp.float32)
    common = dict(
        linear_fn=lambda d: d @ W_out,
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=3,
        using_eos_threshold=False, length_normalization=True,
    )
    slow = S2STransformerBeamSearch(
        decode_fn=lambda prefix, e, el: model.apply(
            params, prefix, e, el, method="decode"
        )[0],
        **common,
    )
    fast = S2STransformerBeamSearch(
        decode_fn=None,
        cache_init_fn=lambda e, max_steps: model.apply(
            params, e, max_steps, method="decode_cache_init"
        ),
        step_fn=lambda tok, cache, pos, el: model.apply(
            params, tok, cache, pos, el, method="decode_step"
        ),
        **common,
    )
    h_slow, s_slow = slow(enc, lens)
    h_fast, s_fast = fast(enc, lens)
    assert h_slow == h_fast, (h_slow, h_fast)
    np.testing.assert_allclose(s_slow, s_fast, rtol=1e-4, atol=1e-5)


def test_transducer_beam_device_matches_host():
    """The fixed-shape while_loop device beam search must reproduce the
    host lockstep loop (itself reference-oracle-tested) — predictions
    exactly, normalized scores to f32 tolerance.  Exercises a stateful
    prediction net so per-hypothesis state routing through the masked
    process tensors is covered."""
    rng = np.random.default_rng(11)
    B, T, V, H = 4, 8, 6, 4
    blank = 0
    E = (0.5 * rng.standard_normal((V, H))).astype(np.float32)
    U = (0.3 * rng.standard_normal((H, H))).astype(np.float32)
    W = (0.5 * rng.standard_normal((H, V))).astype(np.float32)
    bias = rng.standard_normal((V,)).astype(np.float32)
    bias[blank] += 3.0  # trained-like: blank stays in the topk
    enc = (0.7 * rng.standard_normal((B, T, H))).astype(np.float32)

    def pred_step(tokens, state, batch):
        # simple recurrent state: h' = tanh(h @ U + emb(tok))
        if tokens is None:
            h = jnp.zeros((batch, H))
            return jnp.asarray(E[blank])[None].repeat(batch, 0), h
        h = jnp.tanh(state @ jnp.asarray(U) + jnp.asarray(E)[tokens])
        return h, h

    def joint(enc_t, pred_out):
        return (enc_t + pred_out) @ jnp.asarray(W) + jnp.asarray(bias)

    beam = TransducerBeamSearcher(
        decode_fn=pred_step, joint_fn=joint, blank_id=blank, beam_size=3
    )
    lens = np.array([1.0, 0.5, 1.0, 7 / 8])
    host_hyps, host_scores = beam.transducer_beam_search_decode(enc, lens)
    toks, tok_lens, dev_scores = jax.jit(
        lambda e, l: beam.transducer_beam_search_device(
            e, l, max_symbols=16
        )
    )(enc, lens)
    toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
    for b in range(B):
        dev_hyp = [int(t) for t in toks[b, : tok_lens[b]]]
        assert dev_hyp == host_hyps[b], (b, dev_hyp, host_hyps[b])
    np.testing.assert_allclose(
        np.asarray(dev_scores), host_scores, rtol=1e-4, atol=1e-5
    )


def test_transducer_beam_device_starved_terminates():
    """Blank-starved logits (reference loop would hang): the device
    valve must terminate and agree with the host valve's promote
    semantics."""
    rng = np.random.default_rng(5)
    B, T, V, H = 2, 4, 5, 3
    blank = 0
    E = (0.5 * rng.standard_normal((V, H))).astype(np.float32)
    W = (0.5 * rng.standard_normal((H, V))).astype(np.float32)
    bias = rng.standard_normal((V,)).astype(np.float32)
    bias[blank] -= 8.0  # blank never in the topk
    enc = (0.7 * rng.standard_normal((B, T, H))).astype(np.float32)

    def pred_step(tokens, state, batch):
        if tokens is None:
            return jnp.asarray(E[blank])[None].repeat(batch, 0), None
        return jnp.asarray(E)[tokens], None

    def joint(enc_t, pred_out):
        return (enc_t + pred_out) @ jnp.asarray(W) + jnp.asarray(bias)

    beam = TransducerBeamSearcher(
        decode_fn=pred_step,
        joint_fn=joint,
        blank_id=blank,
        beam_size=2,
        max_expand_per_frame=6,
    )
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        host_hyps, host_scores = beam.transducer_beam_search_decode(enc)
    toks, tok_lens, dev_scores = beam.transducer_beam_search_device(
        enc, max_symbols=64
    )
    toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
    for b in range(B):
        dev_hyp = [int(t) for t in toks[b, : tok_lens[b]]]
        assert dev_hyp == host_hyps[b], (b, dev_hyp, host_hyps[b])
    np.testing.assert_allclose(
        np.asarray(dev_scores), host_scores, rtol=1e-4, atol=1e-5
    )


def test_transformer_beam_fused_rows_parity():
    """Deferred-permutation mode (step_fn accepting ``rows``: the beam
    predecessor gather is fused into the model's cache update, see
    ``ops.pallas.beam_cache``) must produce the same hypotheses and
    scores as the eager whole-cache gather path."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )

    rng = np.random.default_rng(3)
    B, T, F, V, D = 2, 12, 8, 11, 16
    model = TransformerASR(
        tgt_vocab=V, input_size=F, d_model=D, nhead=2,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=32,
        dropout=0.0, encoder_module="transformer",
        attention_type="regularMHA",
    )
    src = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    tgt = jnp.zeros((B, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, train=False)
    enc = model.apply(params, src, method="encode")
    lens = jnp.asarray([1.0, 0.7])

    W_out = jnp.asarray(rng.standard_normal((D, V)), jnp.float32)
    common = dict(
        decode_fn=None,
        cache_init_fn=lambda e, max_steps: model.apply(
            params, e, max_steps, method="decode_cache_init"
        ),
        linear_fn=lambda d: d @ W_out,
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=3,
        using_eos_threshold=False, length_normalization=True,
    )
    eager = S2STransformerBeamSearch(
        step_fn=lambda tok, cache, pos, el: model.apply(
            params, tok, cache, pos, el, method="decode_step"
        ),
        **common,
    )
    fused = S2STransformerBeamSearch(
        step_fn=lambda tok, cache, pos, el, rows: model.apply(
            params, tok, cache, pos, el, rows=rows,
            method="decode_step"
        ),
        **common,
    )
    assert not eager._step_rows and fused._step_rows
    h_eager, s_eager = eager(enc, lens)
    h_fused, s_fused = fused(enc, lens)
    assert h_eager == h_fused, (h_eager, h_fused)
    np.testing.assert_allclose(s_eager, s_fused, rtol=1e-4, atol=1e-5)


def test_transformer_beam_ping_pong_parity():
    """Ping-pong double-buffered self caches (spare ``alt`` buffer per
    layer + loop unrolled by 2, see ``ops.pallas.beam_cache``'s
    ``dst``) must be result-identical to the single-buffer fused path
    — including when ``max_steps`` is ODD, where the unrolled body's
    final sub-step runs one step past the cap and its score-bearing
    updates are masked out."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )

    rng = np.random.default_rng(7)
    B, T, F, V, D = 2, 13, 8, 11, 16  # T odd -> odd max_steps
    model = TransformerASR(
        tgt_vocab=V, input_size=F, d_model=D, nhead=2,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=32,
        dropout=0.0, encoder_module="transformer",
        attention_type="regularMHA",
    )
    src = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    tgt = jnp.zeros((B, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, train=False)
    enc = model.apply(params, src, method="encode")
    lens = jnp.asarray([1.0, 0.8])

    W_out = jnp.asarray(rng.standard_normal((D, V)), jnp.float32)
    # min_decode_ratio=1.0 suppresses eos until the cap: the loop must
    # run all max_steps steps, exercising the gated odd tail.
    common = dict(
        decode_fn=None,
        cache_init_fn=lambda e, max_steps: model.apply(
            params, e, max_steps, method="decode_cache_init"
        ),
        step_fn=lambda tok, cache, pos, el, rows: model.apply(
            params, tok, cache, pos, el, rows=rows,
            method="decode_step"
        ),
        linear_fn=lambda d: d @ W_out,
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=1.0, max_decode_ratio=1.0, beam_size=3,
        using_eos_threshold=False, length_normalization=True,
    )
    single = S2STransformerBeamSearch(ping_pong=False, **common)
    pp = S2STransformerBeamSearch(ping_pong=True, **common)
    assert not single._unroll2 and pp._unroll2
    h1, s1 = single(enc, lens)
    h2, s2 = pp(enc, lens)
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)

    # and an even-cap config with normal eos behavior (early exit)
    common["min_decode_ratio"] = 0.0
    even_single = S2STransformerBeamSearch(ping_pong=False, **common)
    even_pp = S2STransformerBeamSearch(ping_pong=True, **common)
    # even cap: T=13 at ratio 1.0 is odd; shrink ratio for an even cap
    h3, s3 = even_single(enc[:, :12], lens)
    h4, s4 = even_pp(enc[:, :12], lens)
    assert h3 == h4, (h3, h4)
    np.testing.assert_allclose(s3, s4, rtol=1e-5, atol=1e-6)
