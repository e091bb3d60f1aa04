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
        tokens = np.asarray(jnp.swapaxes(tokens, 0, 1))
        hyps = [
            [int(t) for t in row if t != self.blank_id] for row in tokens
        ]
        return hyps, np.asarray(scores)

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
