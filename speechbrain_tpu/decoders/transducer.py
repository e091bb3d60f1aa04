"""Transducer (RNN-T) decoding.

Greedy decode is fully vectorized: a lax.scan over time frames with the
prediction-network state in the carry (at most one emission per frame,
matching the reference greedy path, ``decoders/transducer.py:10``).
Beam search follows the reference's per-utterance hypothesis loop on the
host, calling device-stepped prediction/joint functions (parity first;
the greedy path is the production one).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TransducerBeamSearcher"]


class TransducerBeamSearcher:
    """Transducer decoding interface.

    Arguments
    ---------
    decode_fn : pred_step_fn(tokens (B,) or None, state) ->
        (pred_out (B, H), state); tokens None = blank/start state.
    joint_fn : (enc_frames (..., He), pred_out (..., Hp)) -> logits
    blank_id : int
    beam_size : int (1 = vectorized greedy)
    nbest : int
    state_beam, expand_beam : pruning (reference defaults 2.3 / 2.3)
    lm_fn, lm_weight : optional shallow fusion (beam only)
    max_expand_per_frame : int or None
        Safety valve the reference lacks: its while-loop only fills the
        beam through blank extensions, so when blank falls out of the
        topk on every expansion (typical for an untrained model) the
        hypothesis list grows forever and the reference never
        terminates.  After this many expansions on one frame the frame
        is force-advanced (promoting the best hypotheses if the beam is
        still empty).  Terminating reference runs use ~1-3x beam_size
        expansions per frame, far below the default 10x cap, so results
        on trained models are unchanged.  Default (None) = 10x
        beam_size; pass ``float("inf")`` for exact reference behavior
        (including the hang).
    """

    def __init__(
        self,
        decode_fn,
        joint_fn,
        blank_id,
        beam_size=4,
        nbest=5,
        lm_fn=None,
        lm_weight=0.0,
        state_beam=2.3,
        expand_beam=2.3,
        max_expand_per_frame=None,
    ):
        if max_expand_per_frame is None:
            max_expand_per_frame = 10 * beam_size
        self.max_expand_per_frame = max_expand_per_frame
        self.pred_step_fn = decode_fn
        self.joint_fn = joint_fn
        self.blank_id = blank_id
        self.beam_size = beam_size
        self.nbest = nbest
        self.lm_fn = lm_fn
        self.lm_weight = lm_weight
        self.state_beam = state_beam
        self.expand_beam = expand_beam
        # Diagnostics for the max_expand_per_frame valve: frames
        # force-advanced in the most recent decode call (0 on runs that
        # match reference semantics exactly).
        self.forced_advance_count = 0
        self._warned_forced = False

    def __call__(self, enc_states, enc_lens=None):
        if self.beam_size == 1:
            return self.transducer_greedy_decode(enc_states, enc_lens)
        return self.transducer_beam_search_decode(enc_states, enc_lens)

    def transducer_greedy_decode(self, enc_states, enc_lens=None):
        """Vectorized greedy: (B, T, H) -> (hyps, scores)."""
        tokens, scores = self.transducer_greedy_decode_device(
            enc_states, enc_lens
        )
        tokens = np.asarray(tokens)
        hyps = [
            [int(t) for t in row if t != self.blank_id] for row in tokens
        ]
        return hyps, np.asarray(scores)

    def transducer_greedy_decode_device(self, enc_states, enc_lens=None):
        """Device-only greedy core: (B, T, H) -> (tokens (B, T) i32
        with blank at non-emitting frames, scores (B,)).

        Traceable (wrap in jit/AOT); the host wrapper above converts to
        per-utterance hypothesis lists."""
        enc_states = jnp.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        if enc_lens is None:
            abs_lens = jnp.full((B,), T, jnp.int32)
        else:
            abs_lens = jnp.round(jnp.asarray(enc_lens) * T).astype(jnp.int32)
        pred_out0, state0 = self.pred_step_fn(None, None, B)

        def step(carry, inputs):
            pred_out, state, score = carry
            enc_t, t = inputs
            logits = self.joint_fn(enc_t, pred_out)
            log_probs = jax.nn.log_softmax(
                jnp.asarray(logits, jnp.float32), axis=-1
            )
            token = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            tok_lp = jnp.max(log_probs, axis=-1)
            valid = t < abs_lens
            emit = (token != self.blank_id) & valid
            # Update prediction network only for emitting rows.
            new_pred_out, new_state = self.pred_step_fn(token, state, B)
            pred_out = jnp.where(emit[:, None], new_pred_out, pred_out)
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    emit.reshape((-1,) + (1,) * (old.ndim - 1)), new, old
                ),
                new_state,
                state,
            )
            score = score + jnp.where(valid, tok_lp, 0.0)
            out_token = jnp.where(emit, token, self.blank_id)
            return (pred_out, state, score), out_token

        (pred_out, state, scores), tokens = jax.lax.scan(
            step,
            (pred_out0, state0, jnp.zeros(B)),
            (jnp.swapaxes(enc_states, 0, 1), jnp.arange(T)),
        )
        return jnp.swapaxes(tokens, 0, 1), scores

    # ------------------------------------------------------------------
    # Device-side beam search: ONE fixed-shape lax.while_loop per batch
    # ------------------------------------------------------------------

    def transducer_beam_search_device(
        self, enc_states, enc_lens=None, max_symbols=100
    ):
        """Beam search as one compiled program (no-LM path).

        Same hypothesis semantics as the host lockstep loop
        (`transducer_beam_search_decode`, itself the reference
        ``decoders/transducer.py:10`` oracle): length-normalized a_best
        selection, raw-score state_beam gate, topk-gated blank
        extension, expand_beam pruning, and the max_expand_per_frame
        starvation valve — but with masked fixed-shape hypothesis
        tensors inside a single ``lax.while_loop`` per utterance,
        vmapped over the batch.  Traceable: wrap in jit/AOT for
        dispatch-free decoding.

        Arguments
        ---------
        enc_states : (B, T, H) encoder states
        enc_lens : optional (B,) relative lengths
        max_symbols : int
            Token-buffer capacity per hypothesis; emissions beyond it
            are dropped (scores still accumulate).

        Returns
        -------
        (tokens (B, max_symbols) i32 padded with blank_id,
         lengths (B,) i32, norm_scores (B,) f32)
        """
        if self.lm_fn is not None and self.lm_weight > 0:
            raise NotImplementedError(
                "device beam path does not support LM fusion; use the "
                "host lockstep loop"
            )
        enc_states = jnp.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        if enc_lens is None:
            abs_lens = jnp.full((B,), T, jnp.int32)
        else:
            abs_lens = jnp.round(
                jnp.asarray(enc_lens) * T
            ).astype(jnp.int32)
        pred_out0, state0 = self.pred_step_fn(None, None, B)
        search = jax.vmap(
            lambda enc, n, p0, s0: self._beam_device_single(
                enc, n, p0, s0, max_symbols
            )
        )
        return search(
            enc_states,
            abs_lens,
            pred_out0,
            state0,
        )

    def _beam_device_single(self, enc, abs_len, pred_out0, state0, U):
        """Single-utterance while_loop beam search (vmapped by caller).

        enc: (T, He); pred_out0: (Hp,) initial prediction output;
        state0: pytree of per-row prediction-net state (leading dim
        stripped by vmap).
        """
        K = self.beam_size
        max_expand = int(min(self.max_expand_per_frame, 1_000_000))
        P = K + max_expand * K  # process-set capacity (worst case)
        T = enc.shape[0]
        NEG = jnp.float32(-1e30)

        def store(n, template):
            """(n, ...) zero storage shaped like one entry."""
            return jax.tree_util.tree_map(
                lambda x: jnp.zeros((n,) + x.shape, x.dtype), template
            )

        entry0 = {
            "tok": jnp.full((U,), self.blank_id, jnp.int32),
            "len": jnp.int32(0),
            "score": jnp.float32(0.0),
            "pred_out": pred_out0,
            "state": state0,
        }

        def put(storage, i, entry):
            return jax.tree_util.tree_map(
                lambda s, e: s.at[i].set(e), storage, entry
            )

        def get(storage, i):
            return jax.tree_util.tree_map(lambda s: s[i], storage)

        beam = store(K, entry0)
        beam_mask = jnp.zeros((K,), bool)
        proc = store(P, entry0)
        proc_mask = jnp.zeros((P,), bool).at[0].set(True)
        proc = put(proc, 0, entry0)

        def norm_scores(st, mask):
            return jnp.where(
                mask,
                st["score"] / (st["len"].astype(jnp.float32) + 1.0),
                NEG,
            )

        carry0 = {
            "t": jnp.int32(0),
            "done": abs_len <= 0,
            "nexp": jnp.int32(0),
            "iter": jnp.int32(0),
            "beam": beam,
            "beam_mask": beam_mask,
            "proc": proc,
            "proc_mask": proc_mask,
        }

        def cond(c):
            return (~c["done"]) & (
                c["iter"] < T * (max_expand + 2) + 4
            )

        def advance_frame(c):
            """Frame boundary: promote if starved, move beam->process."""
            starved = ~jnp.any(c["beam_mask"])
            # promote: top-K of process by normalized score
            pnorm = norm_scores(c["proc"], c["proc_mask"])
            _, top_idx = jax.lax.top_k(pnorm, K)
            promoted = jax.tree_util.tree_map(
                lambda s: s[top_idx], c["proc"]
            )
            promoted_mask = c["proc_mask"][top_idx]
            new_beam = jax.tree_util.tree_map(
                lambda p, b: jnp.where(
                    jnp.reshape(starved, (1,) * p.ndim), p, b
                ),
                promoted,
                c["beam"],
            )
            new_beam_mask = jnp.where(
                starved, promoted_mask, c["beam_mask"]
            )
            t1 = c["t"] + 1
            done = t1 >= abs_len
            # process := beam (pad beam storage K -> P)
            pad = P - K
            proc1 = jax.tree_util.tree_map(
                lambda b, p: jnp.concatenate(
                    [b, p[K:]], axis=0
                ),
                new_beam,
                c["proc"],
            )
            proc_mask1 = jnp.concatenate(
                [new_beam_mask, jnp.zeros((pad,), bool)]
            )
            return {
                "t": t1,
                "done": done,
                "nexp": jnp.int32(0),
                "iter": c["iter"] + 1,
                "beam": new_beam,
                "beam_mask": jnp.where(
                    done, new_beam_mask, jnp.zeros((K,), bool)
                ),
                "proc": proc1,
                "proc_mask": jnp.where(
                    done, jnp.zeros((P,), bool), proc_mask1
                ),
            }

        def expand(c, a_idx):
            """Pop process[a_idx], run joint, append blank + expansions."""
            a = get(c["proc"], a_idx)
            proc_mask = c["proc_mask"].at[a_idx].set(False)
            enc_t = jax.lax.dynamic_index_in_dim(
                enc, c["t"], keepdims=False
            )
            logits = self.joint_fn(enc_t, a["pred_out"])
            lp = jax.nn.log_softmax(
                jnp.asarray(logits, jnp.float32), axis=-1
            )
            top_lp, top_tok = jax.lax.top_k(lp, K)
            is_blank = top_tok == self.blank_id
            blank_in_topk = jnp.any(is_blank)
            # best non-blank logp among ALL tokens (reference: top-1 or
            # top-2, which is exactly the best non-blank)
            best_logp = jnp.max(
                jnp.where(
                    jnp.arange(lp.shape[-1]) == self.blank_id, NEG, lp
                )
            )
            # ---- blank extension: append a_best + blank score to beam
            free_b = jnp.argmin(c["beam_mask"])  # expansion implies room
            blank_entry = {
                **a,
                "score": a["score"] + lp[self.blank_id],
            }
            beam = jax.tree_util.tree_map(
                lambda s, e: s.at[free_b].set(
                    jnp.where(
                        jnp.broadcast_to(
                            blank_in_topk, jnp.shape(s[free_b])
                        ),
                        e,
                        s[free_b],
                    )
                ),
                c["beam"],
                blank_entry,
            )
            beam_mask = c["beam_mask"].at[free_b].set(
                blank_in_topk | c["beam_mask"][free_b]
            )
            # ---- non-blank expansions: step the prediction net once
            accept = (
                (~is_blank)
                & (top_lp >= best_logp - self.expand_beam)
            )
            state_k = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x[None], (K,) + x.shape
                ),
                a["state"],
            )
            new_pred_out, new_state = self.pred_step_fn(
                top_tok, state_k, K
            )
            tok_buf = jnp.where(
                (jnp.arange(U) == a["len"])[None, :],
                top_tok[:, None],
                a["tok"][None, :],
            )
            cand = {
                "tok": tok_buf,
                "len": jnp.broadcast_to(
                    jnp.minimum(a["len"] + 1, U), (K,)
                ),
                "score": a["score"] + top_lp,
                "pred_out": new_pred_out,
                "state": new_state,
            }
            # scatter accepted candidates into free process slots:
            # free-slot rank r(i) over storage; candidate rank j over
            # accepted; slot i receives accepted candidate of rank r(i)
            cand_rank = jnp.cumsum(accept) - 1  # (K,)
            n_acc = jnp.sum(accept)
            # perm[j] = candidate index with rank j (non-accepted
            # candidates scatter out of bounds and are dropped)
            perm = jnp.zeros((K,), jnp.int32)
            perm = perm.at[jnp.where(accept, cand_rank, K)].set(
                jnp.arange(K, dtype=jnp.int32),
                mode="drop",
            )
            free_rank = jnp.cumsum(~proc_mask) - 1  # (P,)
            takes = (~proc_mask) & (free_rank < n_acc)
            src = perm[jnp.clip(free_rank, 0, K - 1)]  # (P,)
            picked = jax.tree_util.tree_map(
                lambda s: s[src], cand
            )
            proc = jax.tree_util.tree_map(
                lambda old, new: jnp.where(
                    jnp.reshape(
                        takes, (P,) + (1,) * (old.ndim - 1)
                    ),
                    new,
                    old,
                ),
                c["proc"],
                picked,
            )
            proc_mask = proc_mask | takes
            return {
                "t": c["t"],
                "done": c["done"],
                "nexp": c["nexp"] + 1,
                "iter": c["iter"] + 1,
                "beam": beam,
                "beam_mask": beam_mask,
                "proc": proc,
                "proc_mask": proc_mask,
            }

        def body(c):
            beam_n = jnp.sum(c["beam_mask"])
            proc_any = jnp.any(c["proc_mask"])
            forced = (
                (c["nexp"] >= max_expand) & (beam_n < K) & proc_any
            )
            advance = (beam_n >= K) | (~proc_any) | forced
            # a_best (only meaningful when not advancing)
            pnorm = norm_scores(c["proc"], c["proc_mask"])
            a_idx = jnp.argmax(pnorm)
            a_raw = c["proc"]["score"][a_idx]
            bnorm = norm_scores(c["beam"], c["beam_mask"])
            b_idx = jnp.argmax(bnorm)
            b_raw = c["beam"]["score"][b_idx]
            state_beam_stop = jnp.any(c["beam_mask"]) & (
                b_raw >= self.state_beam + a_raw
            )
            advance = advance | state_beam_stop
            return jax.lax.cond(
                advance,
                advance_frame,
                lambda cc: expand(cc, a_idx),
                c,
            )

        final = jax.lax.while_loop(cond, body, carry0)
        fnorm = norm_scores(final["beam"], final["beam_mask"])
        best = jnp.argmax(fnorm)
        any_beam = jnp.any(final["beam_mask"])
        tokens = jnp.where(
            any_beam,
            final["beam"]["tok"][best],
            jnp.full((U,), self.blank_id, jnp.int32),
        )
        length = jnp.where(any_beam, final["beam"]["len"][best], 0)
        score = jnp.where(any_beam, fnorm[best], NEG)
        return tokens, length, score

    def transducer_beam_search_decode(self, enc_states, enc_lens=None):
        """Reference beam search, batched lockstep across utterances.

        Per-utterance semantics are exactly the reference's hypothesis
        loop (``decoders/transducer.py:10``): length-normalized
        hypothesis selection, state_beam early stop, topk-gated blank
        extension, expand_beam pruning.  The difference is purely in
        scheduling: every lockstep iteration, each still-decoding
        utterance contributes ONE chosen hypothesis, and all joint-net
        evaluations (and all prediction-net expansions) across the
        batch go to the device as single batched dispatches instead of
        one dispatch per hypothesis per token.  Utterances advance
        through their frames independently (no idle lockstep waits).
        All score arithmetic stays row-wise identical, so results match
        the serial loop.
        """
        enc_states = np.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        if enc_lens is None:
            abs_lens = [T] * B
        else:
            abs_lens = [
                int(round(float(l) * T)) for l in np.asarray(enc_lens)
            ]

        def norm_key(x):
            # reference normalizes by len(prediction) where prediction
            # includes the initial blank -> +1 (ours stores tokens only)
            return x["logp_score"] / (len(x["prediction"]) + 1)

        self.forced_advance_count = 0
        pred_out0, state0 = self.pred_step_fn(None, None, 1)
        utts = []
        for b in range(B):
            hyp = {
                "prediction": [],
                "logp_score": 0.0,
                "pred_out": pred_out0,
                "state": state0,
                "lm_state": None,
            }
            utts.append(
                {
                    "b": b,
                    "t": -1,
                    "process": [],
                    "beam": [hyp],
                    "done": False,
                    "nexp": 0,
                }
            )

        def next_a_best(u):
            """Advance one utterance's control flow (frame boundaries,
            beam-filled / state_beam exits) to its next expansion point;
            returns the popped a_best hyp, or None when decoding ends."""
            while True:
                if u["done"]:
                    return None
                forced = (
                    u["nexp"] >= self.max_expand_per_frame
                    and len(u["beam"]) < self.beam_size
                    and bool(u["process"])
                )
                advance = (
                    len(u["beam"]) >= self.beam_size
                    or not u["process"]
                    or forced
                )
                a_best = None
                if not advance:
                    a_best = max(u["process"], key=norm_key)
                    if u["beam"]:
                        b_best = max(u["beam"], key=norm_key)
                        if (
                            b_best["logp_score"]
                            >= self.state_beam + a_best["logp_score"]
                        ):
                            advance = True
                if advance:
                    if forced or not u["beam"]:
                        # valve fired: the frame advanced without a
                        # full beam of blank extensions — observable
                        # divergence from reference semantics
                        self.forced_advance_count += 1
                        if not self._warned_forced:
                            self._warned_forced = True
                            warnings.warn(
                                "TransducerBeamSearcher: a frame was "
                                "force-advanced by max_expand_per_frame"
                                " (blank starvation — the reference "
                                "loop would not terminate here); "
                                "results may diverge from reference "
                                "semantics.  See "
                                "forced_advance_count for how often.",
                                RuntimeWarning,
                                stacklevel=3,
                            )
                    # frame done: beam becomes next frame's process set
                    if not u["beam"]:
                        # blank-starved frame (reference would hang):
                        # promote the best surviving hypotheses
                        u["beam"] = sorted(
                            u["process"], key=norm_key, reverse=True
                        )[: self.beam_size] or u["beam"]
                    u["t"] += 1
                    u["nexp"] = 0
                    if u["t"] >= abs_lens[u["b"]]:
                        u["done"] = True
                        return None
                    u["process"] = u["beam"]
                    u["beam"] = []
                    continue
                u["process"].remove(a_best)
                u["nexp"] += 1
                return a_best

        def tree_concat(trees):
            if len(trees) == 1:
                return trees[0]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *trees
            )

        def tree_slice(tree, j):
            return jax.tree_util.tree_map(lambda x: x[j : j + 1], tree)

        use_lm = self.lm_fn is not None and self.lm_weight > 0
        while True:
            chosen = []  # (utt_index, a_best_hyp)
            for b in range(B):
                h = next_a_best(utts[b])
                if h is not None:
                    chosen.append((b, h))
            if not chosen:
                break
            enc_batch = jnp.asarray(
                np.stack(
                    [enc_states[b, utts[b]["t"]] for b, _ in chosen]
                )
            )
            pred_batch = tree_concat([h["pred_out"] for _, h in chosen])
            logits = self.joint_fn(enc_batch, pred_batch)
            log_probs = np.asarray(
                jax.nn.log_softmax(
                    jnp.asarray(logits, jnp.float32), axis=-1
                )
            )
            expansions = []  # (utt_index, hyp, tok, chosen_row)
            for i, (b, a_best_hyp) in enumerate(chosen):
                lp = log_probs[i]
                order = np.argsort(-lp)
                best_logp = (
                    lp[order[0]]
                    if order[0] != self.blank_id
                    else lp[order[1]]
                )
                # reference semantics: ONLY candidates in the topk are
                # considered — the blank extension too exists only when
                # blank made the topk (transducer.py: positions loop)
                for tok in order[: self.beam_size]:
                    tok = int(tok)
                    if tok == self.blank_id:
                        utts[b]["beam"].append(
                            {
                                "prediction": list(
                                    a_best_hyp["prediction"]
                                ),
                                "logp_score": a_best_hyp["logp_score"]
                                + float(lp[self.blank_id]),
                                "pred_out": a_best_hyp["pred_out"],
                                "state": a_best_hyp["state"],
                                "lm_state": a_best_hyp["lm_state"],
                            }
                        )
                        continue
                    if float(lp[tok]) < best_logp - self.expand_beam:
                        continue
                    expansions.append((b, a_best_hyp, tok, i))
            if expansions:
                # LM shallow fusion: one batched _lm step per lockstep
                # round, computed lazily only for chosen rows that
                # actually produced a non-blank expansion (blank
                # extensions never consult the LM).  Rows with no LM
                # state yet and rows carrying a state are batched
                # separately (their pytrees cannot be concatenated).
                lm_scores_row, lm_state_row = {}, {}
                if use_lm:
                    rows = sorted({i for _, _, _, i in expansions})

                    def _last_tok(h):
                        # reference BOS for the LM is blank_id
                        # (transducer.py:253-257, input_PN init)
                        return (
                            h["prediction"][-1]
                            if h["prediction"]
                            else self.blank_id
                        )

                    fresh = [
                        i
                        for i in rows
                        if chosen[i][1]["lm_state"] is None
                    ]
                    carry = [i for i in rows if i not in fresh]
                    for grp in (fresh, carry):
                        if not grp:
                            continue
                        lm_tokens = jnp.asarray(
                            [_last_tok(chosen[i][1]) for i in grp],
                            jnp.int32,
                        )
                        lm_state_in = (
                            None
                            if grp is fresh
                            else tree_concat(
                                [
                                    chosen[i][1]["lm_state"]
                                    for i in grp
                                ]
                            )
                        )
                        scores, new_lm_state = self.lm_fn(
                            lm_tokens, lm_state_in
                        )
                        scores = np.asarray(scores)
                        for j, i in enumerate(grp):
                            lm_scores_row[i] = scores[j]
                            lm_state_row[i] = tree_slice(
                                new_lm_state, j
                            )
                tokens = jnp.asarray(
                    [tok for _, _, tok, _ in expansions], jnp.int32
                )
                states = tree_concat(
                    [h["state"] for _, h, _, _ in expansions]
                )
                pred_out, new_state = self.pred_step_fn(
                    tokens, states, len(expansions)
                )
                for j, (b, a_best_hyp, tok, i) in enumerate(expansions):
                    new_hyp = {
                        "prediction": a_best_hyp["prediction"] + [tok],
                        "logp_score": a_best_hyp["logp_score"]
                        + float(log_probs[i, tok]),
                        "pred_out": pred_out[j : j + 1],
                        "state": tree_slice(new_state, j),
                        "lm_state": a_best_hyp["lm_state"],
                    }
                    if use_lm:
                        new_hyp["logp_score"] += self.lm_weight * float(
                            lm_scores_row[i][tok]
                        )
                        new_hyp["lm_state"] = lm_state_row[i]
                    utts[b]["process"].append(new_hyp)

        nbest_hyps, nbest_scores = [], []
        for b in range(B):
            beam_hyps = sorted(utts[b]["beam"], key=norm_key, reverse=True)
            if not beam_hyps:  # fully starved utterance: empty hyp
                beam_hyps = [
                    {"prediction": [], "logp_score": float("-inf")}
                ]
            best = beam_hyps[: self.nbest]
            nbest_hyps.append(best[0]["prediction"])
            nbest_scores.append(norm_key(best[0]))
        return nbest_hyps, np.asarray(nbest_scores)
