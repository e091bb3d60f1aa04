"""Autoregressive search for seq2seq models, fixed-shape and batched.

The reference's ``S2SBeamSearcher`` (``decoders/seq2seq.py:349``) is a
batched beam search over batch*beam rows with a Python step loop; here
the step loop is a ``lax.scan`` with static ``max_decode_steps`` and all
hypothesis bookkeeping as masked tensors — one compiled program per
(batch, enc_len) bucket, no host sync inside the search.

Subclasses provide three hooks (mirroring the reference):
- ``reset_mem(n, enc_states)`` -> memory pytree with LEADING batch axis
- ``forward_step(inp_tokens, memory, enc_states, enc_lens)``
    -> (log_probs (n, V), memory, attn)
- memory permutation after topk is a generic leading-axis gather.

Features carried over: eos threshold gate (``seq2seq.py:527``), min/max
decode ratios, length normalization, LM shallow fusion (``lm_weight``),
joint CTC scoring (``ctc_weight`` via CTCPrefixScorer), coverage penalty.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.decoders.ctc import CTCPrefixScorer

__all__ = [
    "S2SBaseSearcher",
    "S2SGreedySearcher",
    "S2SRNNGreedySearcher",
    "S2SBeamSearcher",
    "S2SRNNBeamSearcher",
    "S2SRNNBeamSearchLM",
    "S2STransformerBeamSearch",
    "S2SWhisperGreedySearch",
    "S2SWhisperBeamSearch",
]

MINUS_INF = -1e20


class S2SBaseSearcher:
    """Interface for autoregressive searchers (greedy/beam)."""
    def __init__(
        self, bos_index, eos_index, min_decode_ratio, max_decode_ratio
    ):
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.min_decode_ratio = min_decode_ratio
        self.max_decode_ratio = max_decode_ratio

    def __call__(self, enc_states, wav_len):
        raise NotImplementedError

    def reset_mem(self, batch_size, enc_states):
        """Initial decoder memory for a fresh search."""
        raise NotImplementedError

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        """One decoder step: scores + updated memory."""
        raise NotImplementedError

    def lm_forward_step(self, inp_tokens, memory):
        """One LM step: log-probs + updated LM memory."""
        raise NotImplementedError


def _gather_rows(tree, index):
    """Reorder every leaf's leading axis by ``index``."""
    return jax.tree_util.tree_map(
        lambda x: x[index] if hasattr(x, "shape") and x.ndim >= 1 else x,
        tree,
    )


def _swap01(tree):
    """Swap the first two axes of every leaf (layer-major <-> batch-
    major RNN hidden states).  Searcher memories must be BATCH-major so
    ``_gather_rows``'s predecessor permutation reorders rows, not
    layers; RNN cells produce (num_layers, B, H)."""
    return jax.tree_util.tree_map(
        lambda x: (
            jnp.swapaxes(x, 0, 1)
            if hasattr(x, "ndim") and x.ndim >= 2
            else x
        ),
        tree,
    )


class S2SGreedySearcher(S2SBaseSearcher):
    """Vectorized greedy decoding via lax.scan.

    Returns (hyps list[list[int]], top_scores (B,)).
    """

    def __call__(self, enc_states, wav_len):
        enc_states = jnp.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        enc_lens = jnp.asarray(wav_len)
        max_steps = max(1, int(T * self.max_decode_ratio))
        memory = self.reset_mem(B, enc_states)
        inp0 = jnp.full((B,), self.bos_index, jnp.int32)

        def step(carry, _):
            inp, memory, finished, score = carry
            log_probs, memory, attn = self.forward_step(
                inp, memory, enc_states, enc_lens
            )
            token = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            tok_score = jnp.max(log_probs, axis=-1)
            token = jnp.where(finished, self.eos_index, token)
            score = score + jnp.where(finished, 0.0, tok_score)
            finished = finished | (token == self.eos_index)
            return (token, memory, finished, score), token

        (last, memory, finished, scores), tokens = jax.lax.scan(
            step,
            (inp0, memory, jnp.zeros(B, bool), jnp.zeros(B)),
            None,
            length=max_steps,
        )
        tokens = np.asarray(jnp.swapaxes(tokens, 0, 1))  # (B, L)
        hyps = []
        for row in tokens:
            hyp = []
            for t in row:
                if t == self.eos_index:
                    break
                hyp.append(int(t))
            hyps.append(hyp)
        return hyps, np.asarray(scores)


class S2SRNNGreedySearcher(S2SGreedySearcher):
    """Greedy search for AttentionalRNNDecoder models.

    Arguments
    ---------
    embedding_fn : tokens (n,) -> (n, E)
    decoder_step_fn : (emb, hs, c, enc_states, enc_lens, attn_state)
        -> (dec_out, hs, c, w, attn_state)   [the decoder's forward_step]
    linear_fn : (n, H) -> (n, V) log-probs
    dec_hidden_size : int, context dim for the initial zero context
    """

    def __init__(
        self,
        embedding_fn,
        decoder_step_fn,
        linear_fn,
        dec_hidden_size,
        attn_init_fn,
        rnn_init_fn,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.embedding_fn = embedding_fn
        self.decoder_step_fn = decoder_step_fn
        self.linear_fn = linear_fn
        self.dec_hidden_size = dec_hidden_size
        self.attn_init_fn = attn_init_fn
        self.rnn_init_fn = rnn_init_fn

    def reset_mem(self, batch_size, enc_states):
        """Initial decoder memory for a fresh search."""
        # RNN hidden states arrive layer-major (num_layers, B, H);
        # store them BATCH-major so beam predecessor permutation (a
        # leading-axis gather) reorders rows, not layers.
        return {
            "hs": _swap01(
                self.rnn_init_fn(batch_size, enc_states.dtype)
            ),
            "c": jnp.zeros(
                (batch_size, self.dec_hidden_size), enc_states.dtype
            ),
            "attn_state": self.attn_init_fn(enc_states),
        }

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        """One decoder step: scores + updated memory."""
        emb = self.embedding_fn(inp_tokens)
        dec_out, hs, c, w, attn_state = self.decoder_step_fn(
            emb, _swap01(memory["hs"]), memory["c"], enc_states,
            enc_lens, memory["attn_state"],
        )
        log_probs = self.linear_fn(dec_out)
        return (
            log_probs,
            {"hs": _swap01(hs), "c": c, "attn_state": attn_state},
            w,
        )


class S2SBeamSearcher(S2SBaseSearcher):
    """Batched beam search with masked fixed-shape bookkeeping.

    Returns (hyps list[list[int]], top_scores (B,)).
    """

    def __init__(
        self,
        bos_index,
        eos_index,
        min_decode_ratio,
        max_decode_ratio,
        beam_size,
        topk=1,
        return_log_probs=False,
        using_eos_threshold=True,
        eos_threshold=1.5,
        length_normalization=True,
        length_rewarding=0,
        coverage_penalty=0.0,
        lm_weight=0.0,
        lm_modules=None,
        ctc_weight=0.0,
        blank_index=0,
        ctc_score_mode="full",
        ctc_window_size=0,
        using_max_attn_shift=False,
        max_attn_shift=60,
        minus_inf=MINUS_INF,
    ):
        super().__init__(
            bos_index, eos_index, min_decode_ratio, max_decode_ratio
        )
        self.beam_size = beam_size
        self.topk = topk
        self.using_eos_threshold = using_eos_threshold
        self.eos_threshold = eos_threshold
        self.length_normalization = length_normalization
        self.length_rewarding = length_rewarding
        self.coverage_penalty = coverage_penalty
        self.lm_weight = lm_weight
        self.ctc_weight = ctc_weight
        self.blank_index = blank_index
        self.ctc_score_mode = ctc_score_mode
        self.ctc_window_size = ctc_window_size
        self.using_max_attn_shift = using_max_attn_shift
        self.max_attn_shift = max_attn_shift
        self.return_log_probs = return_log_probs
        # reference decoders/seq2seq.py:460: attention scores are scaled
        # by (1 - ctc_weight); LM and CTC terms are added unscaled
        self.att_weight = 1.0 - ctc_weight
        self.minus_inf = minus_inf
        # device_loop=True runs the whole search as ONE lax.while_loop
        # (early exit in the loop condition; jit-cacheable, zero
        # per-step host dispatch).  Set False to step from the host
        # (same step_fn, same numerics — useful for debugging).
        # static_memory marks whether reset_mem produces fixed-shape
        # pytrees; subclasses with growing memories (Whisper prompts)
        # clear it and fall back to the host loop.
        self.device_loop = True
        # jit_call=True caches jax.jit(search_device) across __call__s
        # (one compile per (B, T) bucket, then zero trace overhead).
        # Opt-in because decode_fn typically closes over model params:
        # the cache is only valid while those params are FROZEN (e.g.
        # pretrained serving interfaces, which enable it).  Training
        # loops that evaluate with live params should jit with params
        # as explicit arguments instead (see
        # recipes/LibriSpeech/ASR/transformer/train.py:_search_impl).
        self.jit_call = False
        self._jit_search_fn = None
        if length_normalization and length_rewarding > 0:
            raise ValueError(
                "length normalization is not compatible with length rewarding"
            )

    static_memory = True

    # -- hooks for subclasses -------------------------------------------

    def reset_lm_mem(self, n):
        """Initial LM memory for a fresh search."""
        return None

    def lm_forward_step(self, inp_tokens, memory):
        """One LM step: log-probs + updated LM memory."""
        raise NotImplementedError

    def ctc_forward_step(self, enc_states):
        """Produce (batch, T, vocab) CTC log-probs from enc states."""
        raise NotImplementedError

    # -- main loop -------------------------------------------------------

    def __call__(self, enc_states, wav_len):
        if self.jit_call and self.device_loop and self.static_memory:
            if self._jit_search_fn is None:
                import functools

                self._jit_search_fn = jax.jit(
                    functools.partial(self.search_device, early_exit=True)
                )
            return self.finalize(
                *self._jit_search_fn(enc_states, wav_len)
            )
        return self.finalize(*self.search_device(enc_states, wav_len))

    def clear_jit_cache(self):
        """Drop the cached jitted search (call after rebinding the
        params captured by ``decode_fn``/``lm_fn``)."""
        self._jit_search_fn = None

    def search_device(self, enc_states, wav_len, early_exit=True):
        """Device-side search: all jnp, jittable with
        ``early_exit=False`` (no host syncs in the loop; finished rows
        only extend eos at zero score, so running the full unrolled
        loop is result-identical).

        Returns (alived_seq (B*beam, max_steps), beam_scores (B, beam)).
        """
        enc_states = jnp.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        beam = self.beam_size
        n = B * beam
        enc_lens = jnp.asarray(wav_len)
        max_steps = max(1, int(T * self.max_decode_ratio))
        min_steps = int(T * self.min_decode_ratio)
        # static per (B, T) bucket; lets reset_lm_mem size its buffer
        self._cur_max_steps = max_steps

        # Inflate encoder states to batch*beam.
        enc_states_i = jnp.repeat(enc_states, beam, axis=0)
        enc_lens_i = jnp.repeat(enc_lens, beam, axis=0)

        # KV-cache searchers read this to build the cross-attention
        # caches at BATCH granularity (one row per item, not per beam):
        # every beam of an item attends identical encoder states, so
        # the beam-tiled copy only multiplies the per-step cache read
        # traffic by `beam` (measured 32% of the search loop).
        self._enc_states_base = enc_states
        memory = self.reset_mem(n, enc_states_i)
        self._enc_states_base = None
        lm_memory = self.reset_lm_mem(n) if self.lm_weight > 0 else None
        ctc_scorer = None
        ctc_state = None
        if self.ctc_weight > 0:
            x_ctc = self.ctc_forward_step(enc_states)
            ctc_scorer = CTCPrefixScorer(
                x_ctc, enc_lens, B, beam, self.blank_index,
                self.eos_index, ctc_window_size=self.ctc_window_size,
            )
            ctc_state = ctc_scorer.init_state()

        # Beam scores: only beam 0 alive initially.
        beam_scores = jnp.full((B, beam), self.minus_inf)
        beam_scores = beam_scores.at[:, 0].set(0.0)
        inp = jnp.full((n,), self.bos_index, jnp.int32)
        finished = jnp.zeros((n,), bool)
        alived_seq = jnp.full((n, max_steps), self.eos_index, jnp.int32)
        batch_idx = jnp.arange(B)[:, None]

        # Finalized-hypothesis store, replicating the reference's
        # hyps_and_scores lists (decoders/seq2seq.py:546-596): at most
        # beam_size hyps per batch, FIRST-COME (earliest eos, then beam
        # rank) — later eos'd beams are dropped once full.  One extra
        # slot serves as the out-of-bounds write sink.
        store_seq = jnp.zeros((B, beam + 1, max_steps), jnp.int32)
        store_len = jnp.zeros((B, beam + 1), jnp.int32)
        store_score = jnp.full((B, beam + 1), self.minus_inf)
        store_count = jnp.zeros((B,), jnp.int32)
        prev_attn_peak = jnp.zeros((n,), jnp.int32)
        # Coverage state must be fixed-shape for the device loop; it
        # accumulates attention over encoder frames, so (n, T).
        coverage = (
            jnp.zeros((n, T)) if self.coverage_penalty > 0 else None
        )
        sel_scores = jnp.zeros((B, beam))

        def _store(store_seq, store_len, store_score, store_count,
                   is_eos_bb, seqs_bb, lens_bb, scores_bb):
            offs = jnp.cumsum(is_eos_bb, axis=1) - is_eos_bb
            slot = store_count[:, None] + offs  # (B, beam)
            write = is_eos_bb.astype(bool) & (slot < beam)
            slot_safe = jnp.where(write, slot, beam)  # sink slot
            store_seq = store_seq.at[batch_idx, slot_safe].set(seqs_bb)
            store_len = store_len.at[batch_idx, slot_safe].set(lens_bb)
            store_score = store_score.at[batch_idx, slot_safe].set(
                scores_bb
            )
            store_count = jnp.minimum(
                store_count + is_eos_bb.sum(axis=1), beam
            )
            return store_seq, store_len, store_score, store_count

        carry0 = {
            "t": jnp.asarray(0, jnp.int32),
            "inp": inp,
            "memory": memory,
            "lm_memory": lm_memory,
            "ctc_state": ctc_state,
            "beam_scores": beam_scores,
            "finished": finished,
            "alived_seq": alived_seq,
            "prev_attn_peak": prev_attn_peak,
            "coverage": coverage,
            "sel_scores": sel_scores,
            "store_seq": store_seq,
            "store_len": store_len,
            "store_score": store_score,
            "store_count": store_count,
        }

        def step_fn(c):
            """One search step; every op is traced-t safe so the same
            body drives both the Python loop and lax.while_loop."""
            t = c["t"]
            memory, lm_memory, ctc_state = (
                c["memory"], c["lm_memory"], c["ctc_state"],
            )
            beam_scores, finished = c["beam_scores"], c["finished"]
            alived_seq = c["alived_seq"]
            prev_attn_peak, coverage = c["prev_attn_peak"], c["coverage"]
            log_probs, memory, attn = self.forward_step(
                c["inp"], memory, enc_states_i, enc_lens_i
            )
            # reference scales the attention scores ONCE by
            # att_weight = 1 - ctc_weight (seq2seq.py:728); LM/CTC terms
            # are added unscaled afterwards
            log_probs = self.att_weight * jnp.asarray(
                log_probs, jnp.float32
            )
            V = log_probs.shape[-1]
            if self.using_max_attn_shift and attn is not None:
                attn_peak = jnp.argmax(
                    jnp.asarray(attn), axis=-1
                ).reshape(n)
                # reference bounds are asymmetric: <= prev+shift but
                # STRICTLY > prev-shift (seq2seq.py:519-521)
                ok = (
                    attn_peak <= prev_attn_peak + self.max_attn_shift
                ) & (attn_peak > prev_attn_peak - self.max_attn_shift)
                log_probs = jnp.where(
                    ok[:, None], log_probs, self.minus_inf
                )
                prev_attn_peak = attn_peak
            # eos column: -inf before min_steps; optionally gated by the
            # eos threshold afterwards (reference if/elif collapsed into
            # where() so ``t`` may be traced)
            eos_col = log_probs[:, self.eos_index]
            if self.using_eos_threshold:
                max_probs = jnp.max(log_probs, axis=-1)
                gate = eos_col > self.eos_threshold * max_probs
                eos_col = jnp.where(gate, eos_col, self.minus_inf)
            log_probs = log_probs.at[:, self.eos_index].set(
                jnp.where(t < min_steps, self.minus_inf, eos_col)
            )
            if self.lm_weight > 0:
                lm_log_probs, lm_memory = self.lm_forward_step(
                    c["inp"], lm_memory
                )
                log_probs = log_probs + self.lm_weight * jnp.asarray(
                    lm_log_probs, jnp.float32
                )
            # Candidate selection in COMPACT per-row form: stage-1 topk
            # within each of the n rows, stage-2 topk over the B x
            # (beam * K_row) survivors.  Exactly equivalent to one topk
            # over the dense (B, beam * V) table (the global top-beam
            # is a subset of every row's top-beam) but ~V/beam x less
            # sort work — the dense topk was a measured chunk of the
            # 1.45 ms/step search bookkeeping (PERFORMANCE.md round 3).
            if ctc_state is not None:
                log_probs = log_probs.at[:, self.blank_index].set(
                    self.minus_inf
                )
                if self.ctc_score_mode == "partial":
                    # Score only the attention-selected top candidates
                    # (2*beam, reference ctc.py:120-146): lattice memory
                    # O(T*n*K) instead of O(T*n*V).
                    K = min(2 * beam, V)
                    # top_k's values ARE take_along(log_probs, cand_k)
                    # — reusing them drops a (n, V) gather from the
                    # loop body.
                    cand_v, cand_k = jax.lax.top_k(log_probs, K)
                    ctc_scores, ctc_state = ctc_scorer.forward_step(
                        c["inp"], ctc_state, candidates=cand_k,
                        attn=attn,
                    )
                    row_scores = (
                        cand_v + self.ctc_weight * ctc_scores
                    )  # (n, K) over tokens cand_k
                    row_tokens = cand_k
                else:
                    ctc_scores, ctc_state = ctc_scorer.forward_step(
                        c["inp"], ctc_state, attn=attn
                    )
                    mixed = (
                        log_probs + self.ctc_weight * ctc_scores
                    )
                    K = min(beam, V)
                    row_scores, row_tokens = jax.lax.top_k(mixed, K)
            else:
                K = min(beam, V)
                row_scores, row_tokens = jax.lax.top_k(log_probs, K)

            # Finished rows are out of the search (reference fills their
            # sequence_scores with -inf): all their candidates are -inf.
            row_scores = jnp.where(
                finished[:, None], self.minus_inf, row_scores
            )

            cand = beam_scores.reshape(n, 1) + row_scores  # (n, K)
            if self.length_normalization:
                cand = cand / (t + 1)
            cand = cand.reshape(B, beam * K)
            sel_scores, idx2 = jax.lax.top_k(cand, beam)  # (B, beam)
            pred_beam = idx2 // K  # (B, beam)
            tokens = jnp.take_along_axis(
                row_tokens.reshape(B, beam * K),
                pred_beam * K + (idx2 % K),
                axis=1,
            ).astype(jnp.int32)
            flat_idx = pred_beam * V + tokens
            rows = (
                jnp.arange(B)[:, None] * beam + pred_beam
            ).reshape(-1)  # (n,)
            tokens_flat = tokens.reshape(-1)

            # raw (denormalized) running scores; length rewarding is
            # applied only to FINALIZED scores (reference seq2seq.py:592)
            beam_scores = (
                sel_scores * (t + 1)
                if self.length_normalization
                else sel_scores
            )

            if getattr(self, "_step_rows", False):
                # Deferred permutation: the cache gather is fused into
                # the NEXT step's cache update (ops.pallas.beam_cache);
                # only the predecessor map is carried.
                memory = {**memory, "rows": rows}
            else:
                memory = _gather_rows(memory, rows)
            if lm_memory is not None:
                lm_memory = _gather_rows(lm_memory, rows)
            if ctc_state is not None:
                ctc_state = ctc_scorer.permute_mem(
                    ctc_state, flat_idx.reshape(-1)
                )
            if self.using_max_attn_shift:
                prev_attn_peak = prev_attn_peak[rows]
            alived_seq = alived_seq[rows]
            alived_seq = alived_seq.at[:, t].set(tokens_flat)
            finished = finished[rows] | (tokens_flat == self.eos_index)

            # Coverage penalty adjusts the FINALIZED scores only
            # (reference updates `scores` post-topk, seq2seq.py:824-852;
            # sequence_scores was already saved un-penalized).
            if self.coverage_penalty > 0 and attn is not None:
                cur_attn = jnp.asarray(attn)[rows]
                if cur_attn.ndim > 2:
                    coverage = cur_attn.sum(axis=1)
                else:
                    # reference quirk kept for exactness: at t == 0 the
                    # coverage is initialized to cur_attn AND then the
                    # update still runs (seq2seq.py:829-841), so the
                    # first step's attention is counted twice (once
                    # predecessor-permuted).  With the zeros init this
                    # is the extra where() term below.
                    coverage = (
                        coverage[rows]
                        + cur_attn
                        + jnp.where(t == 0, cur_attn[rows], 0.0)
                    )
                penalty = jnp.maximum(coverage, 0.5).sum(-1)
                penalty = penalty - coverage.shape[-1] * 0.5
                if self.length_normalization:
                    penalty = penalty / (t + 1)
                sel_scores = sel_scores - (
                    self.coverage_penalty * penalty.reshape(B, beam)
                )

            is_eos_bb = (tokens_flat == self.eos_index).reshape(
                B, beam
            ).astype(jnp.int32)
            final_scores = sel_scores + self.length_rewarding * (t + 1)
            store_seq, store_len, store_score, store_count = _store(
                c["store_seq"], c["store_len"], c["store_score"],
                c["store_count"],
                is_eos_bb, alived_seq.reshape(B, beam, -1),
                jnp.broadcast_to(t, (B, beam)).astype(
                    jnp.int32
                ),  # tokens before eos
                final_scores,
            )
            beam_scores = jnp.where(
                is_eos_bb.astype(bool), self.minus_inf, beam_scores
            )
            return {
                "t": t + 1,
                "inp": tokens_flat,
                "memory": memory,
                "lm_memory": lm_memory,
                "ctc_state": ctc_state,
                "beam_scores": beam_scores,
                "finished": finished,
                "alived_seq": alived_seq,
                "prev_attn_peak": prev_attn_peak,
                "coverage": coverage,
                "sel_scores": sel_scores,
                "store_seq": store_seq,
                "store_len": store_len,
                "store_score": store_score,
                "store_count": store_count,
            }

        if self.device_loop and self.static_memory:
            # ONE compiled program: lax.while_loop with early exit in
            # the loop condition — no per-step dispatch, no host syncs.
            def cond_fn(c):
                more = c["t"] < max_steps
                if early_exit:
                    more = more & jnp.logical_not(
                        jnp.all(c["store_count"] >= beam)
                    )
                return more

            body_fn = step_fn
            if getattr(self, "_unroll2", False):
                # Ping-pong caches: two steps per body so each cache
                # buffer returns to its own carry slot (read-A/write-B
                # then read-B/write-A — see reset_mem).  When
                # max_steps is odd the body's second sub-step may run
                # one step past the cap: its score-bearing updates are
                # masked back to the pre-step values (all tiny
                # tensors), so results are identical to the
                # non-unrolled loop; the cache/ctc/lm memories may
                # advance one garbage step that nothing reads.
                _result_keys = (
                    "t", "inp", "beam_scores", "finished",
                    "alived_seq", "prev_attn_peak", "coverage",
                    "sel_scores", "store_seq", "store_len",
                    "store_score", "store_count",
                )

                def _gated(c):
                    valid = c["t"] < max_steps
                    nc = step_fn(c)
                    out = dict(nc)
                    for k in _result_keys:
                        if c[k] is None:
                            continue
                        out[k] = jnp.where(valid, nc[k], c[k])
                    return out

                def body_fn(c):
                    return _gated(_gated(c))

            carry = jax.lax.while_loop(cond_fn, body_fn, carry0)
        else:
            # Host-driven loop (reference-style): used when the memory
            # pytree changes shape across steps (e.g. Whisper's growing
            # prompt) or for debugging with device_loop=False.
            carry = carry0
            for _ in range(max_steps):
                carry = step_fn(carry)
                if early_exit and bool(
                    jnp.all(carry["store_count"] >= beam)
                ):
                    break
        t_final = carry["t"]
        alived_seq = carry["alived_seq"]
        sel_scores = carry["sel_scores"]
        store_seq, store_len = carry["store_seq"], carry["store_len"]
        store_score, store_count = (
            carry["store_score"], carry["store_count"],
        )

        # Fill remaining slots from still-alive beams (reference's
        # end-of-loop all-eos fill, seq2seq.py:889-903) using the LAST
        # step's (penalized, normalized) selection scores.
        # reference fills with ALL beams (it marks every row eos); rows
        # already stored are naturally skipped by the capacity check
        fill_all = jnp.ones((B, beam), jnp.int32)
        final_scores = sel_scores + self.length_rewarding * (
            t_final + 1
        )
        store_seq, store_len, store_score, store_count = _store(
            store_seq, store_len, store_score, store_count,
            fill_all, alived_seq.reshape(B, beam, -1),
            jnp.broadcast_to(t_final, (B, beam)).astype(jnp.int32),
            final_scores,
        )
        return (
            store_seq[:, :beam],
            store_len[:, :beam],
            store_score[:, :beam],
        )

    def finalize(self, store_seq, store_len, store_score):
        """Host-side top-k selection over the finalized store; the best
        hypothesis per batch is truncated at its first eos (reference
        ``batch_filter_seq2seq_output``)."""
        seqs = np.asarray(store_seq)
        lens = np.asarray(store_len)
        scores = np.asarray(store_score)
        B = seqs.shape[0]
        order = np.argsort(-scores, axis=1, kind="stable")
        best_hyps = []
        for b in range(B):
            k = order[b, 0]
            hyp = []
            for tok in seqs[b, k, : lens[b, k]]:
                if tok == self.eos_index:
                    break
                hyp.append(int(tok))
            best_hyps.append(hyp)
        top_scores = np.take_along_axis(scores, order, axis=1)[
            :, : self.topk
        ]
        if self.topk > 1:
            topk_hyps = []
            for b in range(B):
                row = []
                for k in order[b, : self.topk]:
                    hyp = []
                    for tok in seqs[b, k, : lens[b, k]]:
                        if tok == self.eos_index:
                            break
                        hyp.append(int(tok))
                    row.append(hyp)
                topk_hyps.append(row)
            return best_hyps, top_scores, topk_hyps
        return best_hyps, top_scores[:, 0]


class S2SRNNBeamSearcher(S2SBeamSearcher):
    """Beam search for AttentionalRNNDecoder models.

    Same callable hooks as S2SRNNGreedySearcher plus optional
    ctc_linear_fn for joint CTC scoring.
    """

    def __init__(
        self,
        embedding_fn,
        decoder_step_fn,
        linear_fn,
        dec_hidden_size,
        attn_init_fn,
        rnn_init_fn,
        ctc_linear_fn=None,
        temperature=1.0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.embedding_fn = embedding_fn
        self.decoder_step_fn = decoder_step_fn
        self.linear_fn = linear_fn
        self.dec_hidden_size = dec_hidden_size
        self.attn_init_fn = attn_init_fn
        self.rnn_init_fn = rnn_init_fn
        self.ctc_linear_fn = ctc_linear_fn
        self.temperature = temperature

    def reset_mem(self, batch_size, enc_states):
        """Initial decoder memory for a fresh search."""
        # RNN hidden states arrive layer-major (num_layers, B, H);
        # store them BATCH-major so beam predecessor permutation (a
        # leading-axis gather) reorders rows, not layers.
        return {
            "hs": _swap01(
                self.rnn_init_fn(batch_size, enc_states.dtype)
            ),
            "c": jnp.zeros(
                (batch_size, self.dec_hidden_size), enc_states.dtype
            ),
            "attn_state": self.attn_init_fn(enc_states),
        }

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        """One decoder step: scores + updated memory."""
        emb = self.embedding_fn(inp_tokens)
        dec_out, hs, c, w, attn_state = self.decoder_step_fn(
            emb, _swap01(memory["hs"]), memory["c"], enc_states,
            enc_lens, memory["attn_state"],
        )
        logits = self.linear_fn(dec_out)
        log_probs = jax.nn.log_softmax(logits / self.temperature, axis=-1)
        return (
            log_probs,
            {"hs": _swap01(hs), "c": c, "attn_state": attn_state},
            w,
        )

    def ctc_forward_step(self, enc_states):
        """CTC log-probabilities over the encoder states."""
        return jax.nn.log_softmax(self.ctc_linear_fn(enc_states), axis=-1)


class S2SRNNBeamSearchLM(S2SRNNBeamSearcher):
    """RNN beam search + RNNLM shallow fusion.

    lm_step_fn(tokens (n,), lm_mem) -> (log_probs (n, V), lm_mem)
    lm_init_fn(n) -> lm_mem with leading batch axis
    """

    def __init__(self, lm_step_fn, lm_init_fn, **kwargs):
        super().__init__(**kwargs)
        self.lm_step_fn = lm_step_fn
        self.lm_init_fn = lm_init_fn

    def reset_lm_mem(self, n):
        """Initial LM memory for a fresh search."""
        return self.lm_init_fn(n)

    def lm_forward_step(self, inp_tokens, memory):
        """One LM step: log-probs + updated LM memory."""
        return self.lm_step_fn(inp_tokens, memory)


class S2STransformerBeamSearch(S2SBeamSearcher):
    """Beam search for TransformerASR: memory = growing token prefix.

    Arguments
    ---------
    decode_fn : (prefix (n, L), enc_states) -> (n, L, d) decoder output
    linear_fn : (n, d) -> (n, V) logits (seq2seq head)
    ctc_linear_fn : optional (n, T, d) -> CTC logits
    lm_fn : optional (prefix) -> (n, L, V) LM logits
    """

    def __init__(
        self,
        decode_fn,
        linear_fn,
        ctc_linear_fn=None,
        lm_fn=None,
        temperature=1.0,
        temperature_lm=1.0,
        step_fn=None,
        cache_init_fn=None,
        ping_pong=True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.decode_fn = decode_fn
        self.linear_fn = linear_fn
        self.ctc_linear_fn = ctc_linear_fn
        self.lm_fn = lm_fn
        self.temperature = temperature
        self.temperature_lm = temperature_lm
        # KV-cached incremental decoding (the serving fast path):
        # cache_init_fn(enc_states (n,T,d), max_steps) -> cache pytree
        #   with leading batch axis on every leaf;
        # step_fn(tokens (n,), cache, pos, enc_lens) -> (out (n, d),
        #   cache) — the decoder output at position pos.
        # Without these, the searcher re-decodes a fixed-size prefix
        # buffer each step (correct, ~L_max x more decoder FLOPs).
        self.step_fn = step_fn
        self.cache_init_fn = cache_init_fn
        # If step_fn accepts a ``rows`` argument, the beam-predecessor
        # permutation of the self caches is DEFERRED one step and
        # fused into the model's cache update (one Pallas pass per
        # layer: permute + append + attend, see ops.pallas.beam_cache)
        # instead of a separate whole-cache gather here — the gather
        # plus its broken-in-place dynamic-update-slice were measured
        # at 36% of the search program (PERFORMANCE.md round 4).
        self._step_rows = False
        if step_fn is not None:
            try:
                import inspect

                self._step_rows = (
                    "rows" in inspect.signature(step_fn).parameters
                )
            except (TypeError, ValueError):
                self._step_rows = False
        # Ping-pong self caches: carry a spare buffer per layer and
        # alternate read/write roles every step so the fused cache
        # update (ops.pallas.beam_cache) writes IN PLACE into the
        # spare (input_output_aliases) instead of a fresh allocation
        # XLA must copy back into the while-loop carry slot — the
        # measured "four full-cache while-carry copies" of
        # PERFORMANCE.md round 4's decode profile.  Requires the
        # search loop to be unrolled by 2 (see forward()) so each
        # buffer returns to its own carry position every body.
        # Costs 2x self-cache HBM capacity (inference-only).
        self.ping_pong = bool(ping_pong) and self._step_rows
        self._unroll2 = self.ping_pong

    def reset_mem(self, batch_size, enc_states):
        """Initial decoder memory.

        KV-cache path (``step_fn``/``cache_init_fn`` given): per-layer
        caches + a position counter; O(1) projections per step.

        Buffer path: a FIXED-size prefix buffer of ``max_steps`` token
        slots plus a write cursor ``len`` — static shapes every step,
        so the whole search compiles to one ``lax.while_loop`` program.
        The decoder runs over the full (padded) buffer each step; with
        the causal lookahead mask, position ``len`` never attends to
        the unwritten slots, so the step output is identical to
        decoding the true growing prefix.
        """
        max_steps = max(
            1, int(enc_states.shape[1] * self.max_decode_ratio)
        )
        if self.step_fn is not None:
            # Cross-attention K/V depend only on the encoder states,
            # which are identical for every beam of a batch item, and
            # the predecessor permutation only reorders beams WITHIN a
            # batch item — so ck/cv are invariant under the gather.
            # Keeping them out of the carried memory makes them
            # while_loop constants, and (when the searcher provides the
            # un-inflated states via ``_enc_states_base``) they are
            # built at BATCH granularity: the grouped cross-attention
            # step then reads each item's K/V once per step instead of
            # once per beam (beam_size x less HBM traffic).
            base = getattr(self, "_enc_states_base", None)
            if base is not None and base.shape[0] != batch_size:
                cache = self.cache_init_fn(base, max_steps)
                group = batch_size // base.shape[0]
                for c in cache:
                    c["skv"] = jnp.repeat(c["skv"], group, axis=0)
            else:
                cache = self.cache_init_fn(enc_states, max_steps)
            self._static_cross = [
                {"ck": c.pop("ck"), "cv": c.pop("cv")} for c in cache
            ]
            if self.ping_pong:
                # spare self-cache buffers for ping-pong in-place
                # updates (contents never read before overwrite)
                for c in cache:
                    c["alt"] = jnp.zeros_like(c["skv"])
            mem = {
                "cache": cache,
                "len": jnp.asarray(0, jnp.int32),
            }
            if self._step_rows:
                # Deferred-permutation mode: identity predecessors at
                # the first step.
                mem["rows"] = jnp.arange(batch_size, dtype=jnp.int32)
            return mem
        return {
            "buf": jnp.zeros((batch_size, max_steps), jnp.int32),
            "len": jnp.asarray(0, jnp.int32),
        }

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        """One decoder step: scores + updated memory."""
        ln = memory["len"]
        if self.step_fn is not None:
            full = [
                {**dyn, **stat}
                for dyn, stat in zip(
                    memory["cache"], self._static_cross
                )
            ]
            if self._step_rows:
                out_t, cache = self.step_fn(
                    inp_tokens, full, ln, enc_lens, memory["rows"]
                )
            else:
                out_t, cache = self.step_fn(
                    inp_tokens, full, ln, enc_lens
                )
            cache = [
                {k: c[k] for k in ("skv", "alt") if k in c}
                for c in cache
            ]
            logits = self.linear_fn(out_t)
            log_probs = jax.nn.log_softmax(
                logits / self.temperature, axis=-1
            )
            new_mem = {"cache": cache, "len": ln + 1}
            if self._step_rows:
                # Placeholder; the search step overwrites it with this
                # step's predecessor selection.
                new_mem["rows"] = memory["rows"]
            return log_probs, new_mem, None
        buf = memory["buf"].at[:, ln].set(inp_tokens)
        dec_out = self.decode_fn(buf, enc_states, enc_lens)
        logits = self.linear_fn(dec_out[:, ln])
        log_probs = jax.nn.log_softmax(
            logits / self.temperature, axis=-1
        )
        return log_probs, {"buf": buf, "len": ln + 1}, None

    def reset_lm_mem(self, n):
        """Initial LM memory: fixed buffer seeded with bos.

        ``calls`` distinguishes the first LM step (whose input IS bos
        and must not be appended — reference keeps the prefix at
        [bos]) from later steps that append their input token.
        """
        max_steps = self._cur_max_steps
        return {
            "buf": jnp.full((n, max_steps + 1), self.bos_index,
                            jnp.int32),
            "len": jnp.asarray(1, jnp.int32),
            "calls": jnp.asarray(0, jnp.int32),
        }

    def lm_forward_step(self, inp_tokens, memory):
        """One LM step: log-probs + updated LM memory."""
        buf, ln, calls = (
            memory["buf"], memory["len"], memory["calls"],
        )
        append = calls > 0
        written = buf.at[:, ln].set(inp_tokens)
        buf = jnp.where(append, written, buf)
        ln = ln + append.astype(jnp.int32)
        logits = self.lm_fn(buf)
        log_probs = jax.nn.log_softmax(
            logits[:, ln - 1] / self.temperature_lm, axis=-1
        )
        return log_probs, {"buf": buf, "len": ln, "calls": calls + 1}

    def ctc_forward_step(self, enc_states):
        """CTC log-probabilities over the encoder states."""
        return jax.nn.log_softmax(self.ctc_linear_fn(enc_states), axis=-1)


class _WhisperTokenMixin:
    """Whisper decoder-prompt bookkeeping shared by greedy/beam search
    (reference ``decoders/seq2seq.py:199-284,1401-1520``).

    Whisper decoding is conditioned on a task prompt
    ``[bos, language, task, timestamp]``; the first three live in the
    initial memory and the timestamp token plays the role of
    ``bos_index`` (the first ``inp_tokens`` fed to the decoder), so the
    model sees the full prompt in order.
    """

    def _init_whisper_tokens(
        self, language_token, bos_token, task_token, timestamp_token
    ):
        self.language_token = language_token
        self.bos_token = bos_token
        self.task_token = task_token
        self.timestamp_token = timestamp_token
        self.decoder_input_tokens = None

    def set_language_token(self, language_token):
        """Set the language token used in the decoder prompt."""
        self.language_token = language_token

    def set_bos_token(self, bos_token):
        """Set the bos token used in the decoder prompt."""
        self.bos_token = bos_token

    def set_task_token(self, task_token):
        """Set the task token used in the decoder prompt."""
        self.task_token = task_token

    def set_timestamp_token(self, timestamp_token):
        """Set the timestamp token; it becomes ``bos_index`` (the first
        searched input), reference ``seq2seq.py:243-249``."""
        self.timestamp_token = timestamp_token
        self.bos_index = self.timestamp_token

    def set_decoder_input_tokens(self, decoder_input_tokens):
        """Install ``[bos, language, task, timestamp]`` (e.g. a
        tokenizer's ``prefix_tokens``), reference ``seq2seq.py:251-267``."""
        self.set_bos_token(decoder_input_tokens[0])
        self.set_language_token(decoder_input_tokens[1])
        self.set_task_token(decoder_input_tokens[2])
        self.set_timestamp_token(decoder_input_tokens[3])
        self.decoder_input_tokens = [
            self.bos_token,
            self.language_token,
            self.task_token,
        ]

    def _prompt_mem(self, batch_size):
        if self.decoder_input_tokens is None:
            self.decoder_input_tokens = [
                self.bos_token,
                self.language_token,
                self.task_token,
            ]
            self.bos_index = self.timestamp_token
        return {
            "prefix": jnp.tile(
                jnp.asarray(self.decoder_input_tokens, jnp.int32)[None, :],
                (batch_size, 1),
            )
        }

    def _whisper_step(self, inp_tokens, memory, enc_states, temperature=1.0):
        prefix = jnp.concatenate(
            [memory["prefix"], inp_tokens[:, None]], axis=1
        )
        logits, attn = self.model.forward_decoder(enc_states, prefix)
        log_probs = jax.nn.log_softmax(
            jnp.asarray(logits[:, -1], jnp.float32) / temperature, axis=-1
        )
        return log_probs, {"prefix": prefix}, attn


class S2SWhisperGreedySearch(_WhisperTokenMixin, S2SGreedySearcher):
    """Greedy decoding for Whisper models (reference
    ``decoders/seq2seq.py:199``).

    Arguments
    ---------
    model : object with ``forward_decoder(enc_states, ids) ->
        (logits, attn)`` — a ``lobes.models.whisper.Whisper`` bound to
        params, or a ``HuggingFaceWhisper``.
    language_token, bos_token, task_token, timestamp_token : int
        Default prompt (multilingual vocab ids); override per-language
        with ``set_decoder_input_tokens``.
    """

    def __init__(
        self,
        model,
        language_token=50259,
        bos_token=50258,
        task_token=50359,
        timestamp_token=50363,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.model = model
        self._init_whisper_tokens(
            language_token, bos_token, task_token, timestamp_token
        )

    def reset_mem(self, batch_size, enc_states):
        """Initial memory = the ``[bos, language, task]`` prompt."""
        return self._prompt_mem(batch_size)

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        """One decoder step over the growing prompt."""
        return self._whisper_step(inp_tokens, memory, enc_states)

    def __call__(self, enc_states, wav_len):
        # The prompt prefix grows every step, so the scan-based greedy
        # loop (fixed carry shapes) does not apply; step in Python like
        # the beam searcher (one compiled program per prefix length,
        # cached across utterances of the same bucket).
        enc_states = jnp.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        enc_lens = jnp.asarray(wav_len)
        max_steps = max(1, int(T * self.max_decode_ratio))
        memory = self.reset_mem(B, enc_states)
        inp = jnp.full((B,), self.bos_index, jnp.int32)
        finished = jnp.zeros(B, bool)
        scores = jnp.zeros(B)
        out_tokens = []
        for _ in range(max_steps):
            log_probs, memory, _ = self.forward_step(
                inp, memory, enc_states, enc_lens
            )
            token = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            tok_score = jnp.max(log_probs, axis=-1)
            token = jnp.where(finished, self.eos_index, token)
            scores = scores + jnp.where(finished, 0.0, tok_score)
            finished = finished | (token == self.eos_index)
            out_tokens.append(token)
            inp = token
            if bool(jnp.all(finished)):
                break
        tokens = np.asarray(jnp.stack(out_tokens, axis=1))
        hyps = []
        for row in tokens:
            hyp = []
            for t in row:
                if t == self.eos_index:
                    break
                hyp.append(int(t))
            hyps.append(hyp)
        return hyps, np.asarray(scores)


class S2SWhisperBeamSearch(_WhisperTokenMixin, S2SBeamSearcher):
    """Beam search for Whisper models (reference
    ``decoders/seq2seq.py:1401``).

    Arguments
    ---------
    module : list
        ``[model]`` or ``[model, ctc_linear_fn]`` — matching the
        reference's optional CTC head.
    lm_fn : optional (prefix (n, L)) -> (n, L, V) LM logits for shallow
        fusion.
    """

    # the decoder prompt grows every step -> host loop driver
    static_memory = False

    def __init__(
        self,
        module,
        temperature=1.0,
        temperature_lm=1.0,
        language_token=50259,
        bos_token=50258,
        task_token=50359,
        timestamp_token=50363,
        lm_fn=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.model = module[0]
        self.ctc_linear_fn = module[1] if len(module) == 2 else None
        self.temperature = temperature
        self.temperature_lm = temperature_lm
        self.lm_fn = lm_fn
        self._init_whisper_tokens(
            language_token, bos_token, task_token, timestamp_token
        )

    def reset_mem(self, batch_size, enc_states):
        """Initial memory = the ``[bos, language, task]`` prompt."""
        return self._prompt_mem(batch_size)

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        """One decoder step over the growing prompt."""
        return self._whisper_step(
            inp_tokens, memory, enc_states, self.temperature
        )

    def ctc_forward_step(self, enc_states):
        """CTC log-probabilities over the encoder states."""
        return jax.nn.log_softmax(self.ctc_linear_fn(enc_states), axis=-1)

    def reset_lm_mem(self, n):
        """Initial LM memory for a fresh search."""
        return {"prefix": jnp.full((n, 1), self.bos_index, jnp.int32)}

    def lm_forward_step(self, inp_tokens, memory):
        """One LM step: log-probs + updated LM memory."""
        prefix = jnp.concatenate(
            [memory["prefix"], inp_tokens[:, None]], axis=1
        )
        logits = self.lm_fn(prefix)
        log_probs = jax.nn.log_softmax(
            logits[:, -1] / self.temperature_lm, axis=-1
        )
        return log_probs, {"prefix": prefix}


class S2SRNNBeamSearchTransformerLM(S2SRNNBeamSearchLM):
    """RNN beam search + Transformer-LM shallow fusion (reference
    ``decoders/seq2seq.py:1168``).

    Identical machinery to :class:`S2SRNNBeamSearchLM`; the supplied
    ``lm_step_fn`` is expected to keep the growing token prefix in its
    memory and rescore it with a transformer LM each step (see
    ``S2STransformerBeamSearch`` for the prefix-memory convention).
    """


def inflate_tensor(tensor, times, dim):
    """Repeat-interleave along ``dim`` (reference
    ``decoders/seq2seq.py:1255``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> inflate_tensor(jnp.array([[1., 2.], [3., 4.]]), 2, dim=0).tolist()
    [[1.0, 2.0], [1.0, 2.0], [3.0, 4.0], [3.0, 4.0]]
    """
    return jnp.repeat(tensor, times, axis=dim)


def mask_by_condition(tensor, cond, fill_value):
    """Keep values where ``cond`` is True, else ``fill_value``
    (reference ``decoders/seq2seq.py:1285``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> mask_by_condition(
    ...     jnp.array([[1., 2.], [3., 4.]]),
    ...     jnp.array([[True, False], [True, True]]), 0).tolist()
    [[1.0, 0.0], [3.0, 4.0]]
    """
    return jnp.where(cond, tensor, fill_value)


def filter_seq2seq_output(string_pred, eos_id=-1):
    """Filter a predicted sequence up to the first eos (exclusive)
    (reference ``decoders/seq2seq.py:1217``).

    Example
    -------
    >>> filter_seq2seq_output(['a', 'b', 'c', 'eos', 'e'], eos_id='eos')
    ['a', 'b', 'c']
    """
    if not isinstance(string_pred, list):
        raise ValueError("The input must be a list.")
    try:
        eos_index = next(
            i for i, v in enumerate(string_pred) if v == eos_id
        )
    except StopIteration:
        eos_index = len(string_pred)
    return string_pred[:eos_index]


def batch_filter_seq2seq_output(prediction, eos_id=-1):
    """Apply :func:`filter_seq2seq_output` to each sequence in a batch
    (reference ``decoders/seq2seq.py:1191``).

    Example
    -------
    >>> batch_filter_seq2seq_output([[1, 2, 3, -1], [4, -1, 5]])
    [[1, 2, 3], [4]]
    """
    return [
        filter_seq2seq_output(list(seq), eos_id=eos_id)
        for seq in prediction
    ]
