"""Beam-search parity breadth: LM fusion, coverage penalty,
max-attn-shift, and the transducer beam (VERDICT round-1 item 7).

Same table-driven toy-model strategy as test_parity_beamsearch.py —
the step log-probs (and attention rows) depend only on the decoding
step, so the reference searcher and ours traverse identical score
surfaces; hypothesis and score agreement pins the intricate
state-permutation logic of every scoring path.
"""

import numpy as np
import pytest

from tests.parity.conftest import to_np

import jax
import jax.numpy as jnp


def _log_softmax_np(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _make_table(rng, steps, vocab, scale=2.0):
    return _log_softmax_np(
        rng.standard_normal((steps, vocab)).astype(np.float32) * scale
    )


def _make_attn(rng, steps, t_enc, drift):
    """Per-step attention rows with a (possibly jumpy) moving peak."""
    attn = rng.random((steps, t_enc)).astype(np.float32) * 0.1
    peak = 0
    for s in range(steps):
        attn[s, peak] = 1.0
        peak = min(t_enc - 1, peak + int(drift[s]))
    return attn / attn.sum(-1, keepdims=True)


def _make_token_attn(rng, vocab, t_enc, max_peak):
    """Per-TOKEN attention rows: each beam's attention peak depends on
    its last emitted token, so the max-attn-shift constraint prunes
    some beams while others survive.  Peaks stay within [0, max_peak]
    (bos pinned at 0) so blocking is PARTIAL — a fully blocked step
    degenerates to topk over all -inf, whose tie order torch leaves
    unspecified."""
    attn = rng.random((vocab, t_enc)).astype(np.float32) * 0.1
    peaks = rng.integers(0, max_peak + 1, vocab)
    peaks[vocab - 1] = 0  # bos/eos token anchors at frame 0
    # two permanently-far tokens: always masked, never fully blocking
    peaks[1] = t_enc - 1
    peaks[2] = t_enc - 1
    for v in range(vocab):
        attn[v, peaks[v]] = 1.0
    return attn / attn.sum(-1, keepdims=True)


def _ref_searcher(ref, torch, table, attn_table=None, lm_table=None,
                  token_attn=None, **kwargs):
    from speechbrain.decoders.seq2seq import S2SBeamSearcher

    class TableSearcher(S2SBeamSearcher):
        def reset_mem(self, batch_size, device):
            return torch.zeros(batch_size, dtype=torch.long)

        def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
            step = int(memory[0])
            lp = torch.tensor(table[min(step, len(table) - 1)])
            log_probs = lp.unsqueeze(0).repeat(inp_tokens.size(0), 1)
            attn = None
            if attn_table is not None:
                a = torch.tensor(
                    attn_table[min(step, len(attn_table) - 1)]
                )
                attn = a.unsqueeze(0).repeat(inp_tokens.size(0), 1)
            if token_attn is not None:
                attn = torch.tensor(token_attn)[inp_tokens.long()]
            return log_probs, memory + 1, attn

        def permute_mem(self, memory, index):
            return memory

        def reset_lm_mem(self, batch_size, device):
            return torch.zeros(batch_size, dtype=torch.long)

        def lm_forward_step(self, inp_tokens, memory):
            # LM depends on the last emitted token (order-sensitive)
            lp = torch.tensor(lm_table)[inp_tokens.long()]
            return lp, memory + 1

        def permute_lm_mem(self, memory, index):
            return memory

    return TableSearcher(**kwargs)


def _our_searcher(table, attn_table=None, lm_table=None,
                  token_attn=None, **kwargs):
    from speechbrain_tpu.decoders.seq2seq import S2SBeamSearcher

    class TableSearcher(S2SBeamSearcher):
        def reset_mem(self, batch_size, enc_states):
            return jnp.zeros((batch_size,), jnp.int32)

        def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
            tbl = jnp.asarray(table)
            step = jnp.minimum(memory[0], tbl.shape[0] - 1)
            lp = jax.lax.dynamic_index_in_dim(tbl, step, keepdims=False)
            log_probs = jnp.broadcast_to(
                lp[None], (inp_tokens.shape[0], tbl.shape[1])
            )
            attn = None
            if attn_table is not None:
                at = jnp.asarray(attn_table)
                astep = jnp.minimum(step, at.shape[0] - 1)
                row = jax.lax.dynamic_index_in_dim(
                    at, astep, keepdims=False
                )
                attn = jnp.broadcast_to(
                    row[None], (inp_tokens.shape[0], at.shape[1])
                )
            if token_attn is not None:
                attn = jnp.asarray(token_attn)[
                    inp_tokens.astype(jnp.int32)
                ]
            return log_probs, memory + 1, attn

        def permute_mem(self, memory, index):
            return memory

        def reset_lm_mem(self, n):
            return jnp.zeros((n,), jnp.int32)

        def lm_forward_step(self, inp_tokens, memory):
            lp = jnp.asarray(lm_table)[inp_tokens.astype(jnp.int32)]
            return lp, memory + 1

        def permute_lm_mem(self, memory, index):
            return memory

    return TableSearcher(**kwargs)


def _run_both(ref, torch, table, t_enc, common, attn_table=None,
              lm_table=None, token_attn=None):
    theirs = _ref_searcher(
        ref, torch, table, attn_table=attn_table, lm_table=lm_table,
        token_attn=token_attn, **common,
    )
    enc = torch.zeros((2, t_enc, 4))
    with torch.no_grad():
        t_hyps, t_scores = theirs(enc, torch.ones(2))

    ours = _our_searcher(
        table, attn_table=attn_table, lm_table=lm_table,
        token_attn=token_attn, **common,
    )
    o_hyps, o_scores = ours(jnp.zeros((2, t_enc, 4)), jnp.ones(2))
    o_hyps = [list(map(int, h)) for h in o_hyps]
    t_hyps = [list(map(int, h)) for h in t_hyps]
    assert o_hyps == t_hyps, (o_hyps, t_hyps)
    np.testing.assert_allclose(
        np.asarray(o_scores, np.float64).reshape(-1),
        to_np(t_scores).astype(np.float64).reshape(-1),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.parametrize("seed,lm_weight", [(0, 0.4), (3, 0.8), (5, 0.2)])
def test_beam_lm_fusion_parity(ref, torch, seed, lm_weight):
    """LM shallow fusion: token-conditioned LM table
    (reference decoders/seq2seq.py:757-760 fusion path)."""
    V, steps, beam = 8, 6, 4
    rng = np.random.default_rng(seed)
    table = _make_table(rng, steps, V)
    table[:, V - 1] -= 1.0
    lm_table = _make_table(rng, V, V, scale=1.5)  # row per last token
    common = dict(
        bos_index=V - 1,
        eos_index=V - 1,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        beam_size=beam,
        length_normalization=True,
        using_eos_threshold=True,
        eos_threshold=1.5,
        lm_weight=lm_weight,
    )
    _run_both(ref, torch, table, steps, common, lm_table=lm_table)


@pytest.mark.parametrize("seed,cov", [(0, 1.5), (2, 5.0), (7, 0.5)])
def test_beam_coverage_penalty_parity(ref, torch, seed, cov):
    """Coverage penalty over accumulated attention
    (reference decoders/seq2seq.py:826-860)."""
    V, steps, beam, t_enc = 8, 6, 4, 10
    rng = np.random.default_rng(seed)
    table = _make_table(rng, steps, V)
    table[:, V - 1] -= 1.0
    drift = rng.integers(0, 3, steps)
    attn_table = _make_attn(rng, steps, t_enc, drift)
    common = dict(
        bos_index=V - 1,
        eos_index=V - 1,
        min_decode_ratio=0.0,
        max_decode_ratio=0.6,
        beam_size=beam,
        length_normalization=True,
        using_eos_threshold=True,
        eos_threshold=1.5,
        coverage_penalty=cov,
    )
    _run_both(ref, torch, table, t_enc, common, attn_table=attn_table)


@pytest.mark.parametrize("seed,shift", [(0, 2), (2, 1), (9, 3)])
def test_beam_max_attn_shift_parity(ref, torch, seed, shift):
    """Max-attn-shift gating: candidates whose attention peak jumps
    more than max_attn_shift are blocked
    (reference decoders/seq2seq.py:735-742)."""
    V, steps, beam, t_enc = 8, 6, 3, 12
    rng = np.random.default_rng(seed)
    table = _make_table(rng, steps, V)
    table[:, V - 1] -= 1.0
    # token-dependent peaks: some beams get blocked, others survive
    token_attn = _make_token_attn(rng, V, t_enc, max_peak=shift)
    common = dict(
        bos_index=V - 1,
        eos_index=V - 1,
        min_decode_ratio=0.0,
        max_decode_ratio=0.5,
        beam_size=beam,
        length_normalization=True,
        using_eos_threshold=False,
        using_max_attn_shift=True,
        max_attn_shift=shift,
    )
    _run_both(ref, torch, table, t_enc, common, token_attn=token_attn)


def _run_both_finite(*a, **k):  # pragma: no cover - helper alias
    return _run_both(*a, **k)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_transducer_beam_parity(ref, torch, seed):
    """Transducer beam search: identical toy transducer (embedding
    prediction net + sum joint + linear head) on both sides; the
    intricate hypothesis-expansion/pruning loop must agree
    (reference decoders/transducer.py:10)."""
    from speechbrain.nnet.transducer.transducer_joint import (
        Transducer_joint,
    )
    from speechbrain.decoders.transducer import (
        TransducerBeamSearcher as Ref,
    )
    from speechbrain_tpu.decoders.transducer import (
        TransducerBeamSearcher as Ours,
    )

    rng = np.random.default_rng(seed)
    V, H, B, T = 6, 5, 2, 7
    blank = 0
    E = (0.5 * rng.standard_normal((V, H))).astype(np.float32)  # PN emb
    W = (0.5 * rng.standard_normal((H, V))).astype(np.float32)  # head
    b_out = rng.standard_normal((V,)).astype(np.float32)
    # blank must stay in the topk, otherwise the reference's while-loop
    # expansion never fills its beam (it only fills via blank
    # extensions) and loops forever
    b_out[blank] += 3.0
    enc = (0.5 * rng.standard_normal((B, T, H))).astype(np.float32)

    # reference toy: Embedding -> sum joint -> Linear
    emb = torch.nn.Embedding(V, H)
    emb.weight.data = torch.tensor(E)
    lin = torch.nn.Linear(H, V)
    lin.weight.data = torch.tensor(W.T)
    lin.bias.data = torch.tensor(b_out)
    theirs = Ref(
        decode_network_lst=[emb],
        tjoint=Transducer_joint(joint="sum"),
        classifier_network=[lin],
        blank_id=blank,
        beam_size=3,
        nbest=3,
    )
    with torch.no_grad():
        t_hyps, t_score, t_nbest, t_nbest_scores = theirs(
            torch.tensor(enc)
        )

    def pred_step(tokens, state, n=1):
        if tokens is None:
            return jnp.asarray(E[blank])[None], None
        return jnp.asarray(E)[tokens], None

    def joint(enc_t, pred_out):
        # Transducer_joint default applies LeakyReLU to the sum
        # (reference transducer_joint.py:41)
        j = jax.nn.leaky_relu(enc_t + pred_out, 0.01)
        return j @ jnp.asarray(W) + jnp.asarray(b_out)

    ours = Ours(
        decode_fn=pred_step,
        joint_fn=joint,
        blank_id=blank,
        beam_size=3,
        nbest=3,
    )
    o_hyps, o_scores = ours.transducer_beam_search_decode(enc)
    t_hyps = [list(map(int, h)) for h in t_hyps]
    o_hyps = [list(map(int, h)) for h in o_hyps]
    assert o_hyps == t_hyps, (o_hyps, t_hyps)
    # reference's scalar is exp(score).mean over the batch
    np.testing.assert_allclose(
        float(np.exp(np.asarray(o_scores)).mean()),
        float(to_np(t_score)),
        rtol=1e-4,
    )


@pytest.mark.parametrize("seed,lm_weight", [(0, 0.4), (2, 0.8)])
def test_transducer_beam_lm_fusion_parity(ref, torch, seed, lm_weight):
    """Transducer beam search with shallow LM fusion: a recurrent toy
    LM (tanh state) on both sides.  Pins (a) the LM score/state
    bookkeeping against the reference loop (decoders/transducer.py:
    313-352, BOS = blank_id) and (b) that our LM runs as BATCHED
    lockstep dispatches computed lazily only for rows with surviving
    non-blank expansions — far fewer calls than the reference's
    one-dispatch-per-chosen-hypothesis."""
    from speechbrain.nnet.transducer.transducer_joint import (
        Transducer_joint,
    )
    from speechbrain.decoders.transducer import (
        TransducerBeamSearcher as Ref,
    )
    from speechbrain_tpu.decoders.transducer import (
        TransducerBeamSearcher as Ours,
    )

    rng = np.random.default_rng(seed)
    V, H, B, T = 6, 5, 2, 7
    blank = 0
    E = (0.5 * rng.standard_normal((V, H))).astype(np.float32)
    W = (0.5 * rng.standard_normal((H, V))).astype(np.float32)
    b_out = rng.standard_normal((V,)).astype(np.float32)
    b_out[blank] += 3.0  # keep blank in the topk (see above)
    enc = (0.5 * rng.standard_normal((B, T, H))).astype(np.float32)
    # toy recurrent LM params
    Elm = (0.5 * rng.standard_normal((V, H))).astype(np.float32)
    R = (0.5 * rng.standard_normal((H, H))).astype(np.float32)
    Wl = (0.5 * rng.standard_normal((H, V))).astype(np.float32)
    bl = (0.3 * rng.standard_normal((V,))).astype(np.float32)

    emb = torch.nn.Embedding(V, H)
    emb.weight.data = torch.tensor(E)
    lin = torch.nn.Linear(H, V)
    lin.weight.data = torch.tensor(W.T)
    lin.bias.data = torch.tensor(b_out)

    class ToyLM(torch.nn.Module):
        """h' = tanh(emb[tok] + h R); logits = h' Wl + bl."""

        def forward(self, x, hx=None):
            tok = int(x.view(-1)[0])
            h = (
                torch.zeros(1, H)
                if hx is None
                else hx
            )
            h = torch.tanh(
                torch.tensor(Elm[tok])[None] + h @ torch.tensor(R)
            )
            logits = h @ torch.tensor(Wl) + torch.tensor(bl)
            return logits.view(1, 1, V), h

    theirs = Ref(
        decode_network_lst=[emb],
        tjoint=Transducer_joint(joint="sum"),
        classifier_network=[lin],
        blank_id=blank,
        beam_size=3,
        nbest=3,
        lm_module=ToyLM(),
        lm_weight=lm_weight,
    )
    with torch.no_grad():
        t_hyps, t_score, _, _ = theirs(torch.tensor(enc))

    def pred_step(tokens, state, n=1):
        if tokens is None:
            return jnp.asarray(E[blank])[None], None
        return jnp.asarray(E)[tokens], None

    def joint(enc_t, pred_out):
        j = jax.nn.leaky_relu(enc_t + pred_out, 0.01)
        return j @ jnp.asarray(W) + jnp.asarray(b_out)

    lm_calls = {"n": 0}

    def lm_fn(tokens, state):
        lm_calls["n"] += 1
        n = tokens.shape[0]
        h = jnp.zeros((n, H)) if state is None else state
        h = jnp.tanh(jnp.asarray(Elm)[tokens] + h @ jnp.asarray(R))
        logits = h @ jnp.asarray(Wl) + jnp.asarray(bl)
        return jax.nn.log_softmax(logits, -1), h

    ours = Ours(
        decode_fn=pred_step,
        joint_fn=joint,
        blank_id=blank,
        beam_size=3,
        nbest=3,
        lm_fn=lm_fn,
        lm_weight=lm_weight,
    )
    o_hyps, o_scores = ours.transducer_beam_search_decode(enc)
    t_hyps = [list(map(int, h)) for h in t_hyps]
    o_hyps = [list(map(int, h)) for h in o_hyps]
    assert o_hyps == t_hyps, (o_hyps, t_hyps)
    np.testing.assert_allclose(
        float(np.exp(np.asarray(o_scores)).mean()),
        float(to_np(t_score)),
        rtol=1e-4,
    )
    # Batched-lazy dispatch: at most 2 LM calls (fresh/carry groups)
    # per lockstep round; the reference pays one per chosen hypothesis
    # per round.  With B=2, beam=3 over 7 frames the serial count is
    # O(B * T * beam); ours must stay well under it.
    assert lm_calls["n"] < B * T * 3, lm_calls["n"]
