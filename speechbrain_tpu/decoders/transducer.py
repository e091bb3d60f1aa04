"""Transducer (RNN-T) decoding.

Greedy decode is fully vectorized: a lax.scan over time frames with the
prediction-network state in the carry (at most one emission per frame,
matching the reference greedy path, ``decoders/transducer.py:10``).
Beam search follows the reference's per-utterance hypothesis loop on the
host, calling device-stepped prediction/joint functions (parity first;
the greedy path is the production one).
"""

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
    ):
        self.pred_step_fn = decode_fn
        self.joint_fn = joint_fn
        self.blank_id = blank_id
        self.beam_size = beam_size
        self.nbest = nbest
        self.lm_fn = lm_fn
        self.lm_weight = lm_weight
        self.state_beam = state_beam
        self.expand_beam = expand_beam

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
        """Per-utterance beam search (host loop, reference parity)."""
        import math

        enc_states = np.asarray(enc_states)
        B, T = enc_states.shape[0], enc_states.shape[1]
        if enc_lens is None:
            abs_lens = [T] * B
        else:
            abs_lens = [
                int(round(float(l) * T)) for l in np.asarray(enc_lens)
            ]
        nbest_hyps, nbest_scores = [], []
        for b in range(B):
            pred_out0, state0 = self.pred_step_fn(None, None, 1)
            hyp = {
                "prediction": [],
                "logp_score": 0.0,
                "pred_out": pred_out0,
                "state": state0,
                "lm_state": None,
            }
            beam_hyps = [hyp]
            for t in range(abs_lens[b]):
                process_hyps = beam_hyps
                beam_hyps = []
                while len(beam_hyps) < self.beam_size:
                    # reference selects by length-normalized score
                    # (decoders/transducer.py:  logp/len(prediction),
                    # where prediction includes the initial blank ->
                    # +1 here since ours stores tokens only)
                    a_best_hyp = max(
                        process_hyps,
                        key=lambda x: x["logp_score"]
                        / (len(x["prediction"]) + 1),
                    )
                    if beam_hyps:
                        b_best = max(
                            beam_hyps,
                            key=lambda x: x["logp_score"]
                            / (len(x["prediction"]) + 1),
                        )
                        if (
                            b_best["logp_score"]
                            >= self.state_beam + a_best_hyp["logp_score"]
                        ):
                            break
                    process_hyps.remove(a_best_hyp)
                    enc_t = jnp.asarray(enc_states[b, t])[None]
                    logits = self.joint_fn(enc_t, a_best_hyp["pred_out"])
                    log_probs = np.asarray(
                        jax.nn.log_softmax(
                            jnp.asarray(logits, jnp.float32), axis=-1
                        )
                    )[0]
                    if self.lm_fn is not None and self.lm_weight > 0:
                        lm_scores, lm_state = self._lm_step(a_best_hyp)
                    order = np.argsort(-log_probs)
                    best_logp = (
                        log_probs[order[0]]
                        if order[0] != self.blank_id
                        else log_probs[order[1]]
                    )
                    # reference semantics: ONLY candidates in the topk
                    # are considered — the blank extension too exists
                    # only when blank made the topk (transducer.py:
                    # positions loop)
                    for tok in order[: self.beam_size]:
                        tok = int(tok)
                        if tok == self.blank_id:
                            blank_hyp = {
                                "prediction": list(
                                    a_best_hyp["prediction"]
                                ),
                                "logp_score": a_best_hyp["logp_score"]
                                + float(log_probs[self.blank_id]),
                                "pred_out": a_best_hyp["pred_out"],
                                "state": a_best_hyp["state"],
                                "lm_state": a_best_hyp["lm_state"],
                            }
                            beam_hyps.append(blank_hyp)
                            continue
                        if (
                            float(log_probs[tok])
                            < best_logp - self.expand_beam
                        ):
                            continue
                        pred_out, state = self.pred_step_fn(
                            jnp.asarray([tok], jnp.int32),
                            a_best_hyp["state"],
                            1,
                        )
                        new_hyp = {
                            "prediction": a_best_hyp["prediction"] + [tok],
                            "logp_score": a_best_hyp["logp_score"]
                            + float(log_probs[tok]),
                            "pred_out": pred_out,
                            "state": state,
                            "lm_state": a_best_hyp["lm_state"],
                        }
                        if self.lm_fn is not None and self.lm_weight > 0:
                            new_hyp["logp_score"] += (
                                self.lm_weight * float(lm_scores[tok])
                            )
                            new_hyp["lm_state"] = lm_state
                        process_hyps.append(new_hyp)
            beam_hyps.sort(
                key=lambda x: x["logp_score"] / (len(x["prediction"]) + 1),
                reverse=True,
            )
            best = beam_hyps[: self.nbest]
            nbest_hyps.append(best[0]["prediction"])
            nbest_scores.append(
                best[0]["logp_score"] / (len(best[0]["prediction"]) + 1)
            )
        return nbest_hyps, np.asarray(nbest_scores)

    def _lm_step(self, hyp):
        tokens = jnp.asarray(
            [hyp["prediction"][-1] if hyp["prediction"] else 0], jnp.int32
        )
        scores, state = self.lm_fn(tokens, hyp["lm_state"])
        return np.asarray(scores)[0], state
