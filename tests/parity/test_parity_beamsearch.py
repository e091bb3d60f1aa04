"""End-to-end beam-search parity: a table-driven toy model (the step
log-probs depend only on the decoding step) driven through the
reference S2SBeamSearcher and ours with identical settings must produce
the same hypotheses and scores."""

import numpy as np
import pytest

from tests.parity.conftest import to_np

import jax.numpy as jnp


def _make_table(rng, steps, vocab):
    logits = rng.standard_normal((steps, vocab)).astype(np.float32) * 2.0
    x = logits - logits.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _ref_searcher(ref, torch, table, **kwargs):
    from speechbrain.decoders.seq2seq import S2SBeamSearcher

    class TableSearcher(S2SBeamSearcher):
        def reset_mem(self, batch_size, device):
            return torch.zeros(batch_size, dtype=torch.long)

        def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
            step = int(memory[0])
            lp = torch.tensor(table[min(step, len(table) - 1)])
            log_probs = lp.unsqueeze(0).repeat(inp_tokens.size(0), 1)
            return log_probs, memory + 1, None

        def permute_mem(self, memory, index):
            return memory

    return TableSearcher(**kwargs)


def _our_searcher(table, **kwargs):
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
            return log_probs, memory + 1, None

        def permute_mem(self, memory, index):
            return memory

    import jax

    return TableSearcher(**kwargs)


import jax  # noqa: E402


@pytest.mark.parametrize("seed,length_norm", [(0, True), (1, False), (2, True)])
def test_beam_search_table_parity(ref, torch, seed, length_norm):
    V, steps, beam = 8, 6, 4
    bos, eos = V - 1, V - 1  # shared bos/eos, SB convention
    rng = np.random.default_rng(seed)
    table = _make_table(rng, steps, V)
    # give eos a plausible (not dominant) score so search must weigh it
    table[:, eos] -= 1.0

    common = dict(
        bos_index=bos,
        eos_index=eos,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        beam_size=beam,
        length_normalization=length_norm,
        using_eos_threshold=True,
        eos_threshold=1.5,
    )
    theirs = _ref_searcher(ref, torch, table, **common)
    enc = torch.zeros((2, steps, 4))
    wav_len = torch.ones(2)
    with torch.no_grad():
        t_hyps, t_scores = theirs(enc, wav_len)

    ours = _our_searcher(table, **common)
    o_hyps, o_scores = ours(jnp.zeros((2, steps, 4)), jnp.ones(2))

    o_hyps = [list(map(int, h)) for h in o_hyps]
    t_hyps = [list(map(int, h)) for h in t_hyps]
    assert o_hyps == t_hyps, (o_hyps, t_hyps)
    np.testing.assert_allclose(
        np.asarray(o_scores, dtype=np.float64).reshape(-1),
        to_np(t_scores).astype(np.float64).reshape(-1),
        rtol=1e-4,
        atol=1e-4,
    )
