"""CTC decoding: greedy decode + batched prefix scorer for joint
CTC/attention beam search.

Parity targets: reference ``decoders/ctc.py:334`` (ctc_greedy_decode),
``:297`` (filter_ctc_output), ``:13-296`` (CTCPrefixScorer — the
Watanabe "Algorithm 2" psi recursion; deep-dive notes SURVEY.md §8.1).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["filter_ctc_output", "ctc_greedy_decode", "CTCPrefixScorer"]


def filter_ctc_output(string_pred, blank_id=-1):
    """Merge repeats then drop blanks from a single prediction list.

    Example
    -------
    >>> filter_ctc_output([0, 0, 1, 1, 0, 2, 2], blank_id=0)
    [1, 2]
    """
    if isinstance(string_pred, list):
        out = [
            v
            for i, v in enumerate(string_pred)
            if i == 0 or v != string_pred[i - 1]
        ]
        out = [v for v in out if v != blank_id]
        return out
    raise ValueError("filter_ctc_output expects a list")


def ctc_greedy_decode(probabilities, seq_lens, blank_id=-1):
    """Argmax + merge + blank-removal per utterance.

    Arguments
    ---------
    probabilities : (batch, time, classes) posteriors (or log-probs)
    seq_lens : (batch,) relative lengths
    blank_id : int (negative indexes from the end)

    Returns list[list[int]] (host side).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> probs = jnp.array([[[0.1, 0.9, 0.0], [0.1, 0.9, 0.0],
    ...                     [0.9, 0.1, 0.0], [0.0, 0.0, 1.0]]])
    >>> ctc_greedy_decode(probs, jnp.ones(1), blank_id=0)
    [[1, 2]]
    """
    probabilities = np.asarray(probabilities)
    seq_lens = np.asarray(seq_lens)
    if blank_id < 0:
        blank_id = probabilities.shape[-1] + blank_id
    batch_max_len = probabilities.shape[1]
    argmaxes = probabilities.argmax(-1)
    outputs = []
    for seq, seq_len in zip(argmaxes, seq_lens):
        actual_size = int(round(float(seq_len) * batch_max_len))
        outputs.append(
            filter_ctc_output(seq[:actual_size].tolist(), blank_id=blank_id)
        )
    return outputs


class CTCPrefixScorer:
    """Batched CTC prefix scoring for joint CTC/attention decoding.

    Computes, per step, the delta CTC prefix score psi for EVERY vocab
    candidate given each beam's current prefix — vectorized over
    (batch*beam, T, vocab) with the time recursion as a lax.scan.

    State threading is functional: ``state = None`` initially;
    ``forward_step(inp_tokens, state, ...)`` returns (scores, state);
    ``permute_mem(state, index)`` reindexes after topk.

    Arguments
    ---------
    x : (batch, T, vocab) encoder CTC log-probs
    enc_lens : (batch,) relative lengths
    batch_size, beam_size : int
    blank_index, eos_index : int
    """

    def __init__(self, x, enc_lens, batch_size, beam_size, blank_index, eos_index, ctc_window_size=0):
        self.blank_index = blank_index
        self.eos_index = eos_index
        self.ctc_window_size = int(ctc_window_size)
        self.batch_size = batch_size
        self.beam_size = beam_size
        self.minus_inf = -1e20
        x = jnp.asarray(x, jnp.float32)
        T = x.shape[1]
        self.vocab_size = x.shape[-1]
        abs_lens = jnp.round(jnp.asarray(enc_lens) * T).astype(jnp.int32)
        # Mask frames beyond enc_lens: only blank emittable (log 0), all
        # others -inf (ctc.py:58-62).
        mask = jnp.arange(T)[None, :] < abs_lens[:, None]  # (B, T)
        pad_row = jnp.full((self.vocab_size,), self.minus_inf)
        pad_row = pad_row.at[blank_index].set(0.0)
        x = jnp.where(mask[..., None], x, pad_row[None, None, :])
        # Inflate to batch*beam rows.
        x = jnp.repeat(x, beam_size, axis=0)  # (B*beam, T, V)
        self.x = x
        self.abs_lens = jnp.repeat(abs_lens, beam_size, axis=0)
        self.T = T
        self.last_frame_index = jnp.clip(self.abs_lens - 1, 0, T - 1)

    def init_state(self):
        """Build the initial decoding state."""
        n = self.batch_size * self.beam_size
        # r: (T, 2, n) forward lattice of the CURRENT prefix
        # [0]=nonblank, [1]=blank ending.
        r = jnp.full((self.T, 2, n), self.minus_inf)
        # Initial prefix = empty: blank path = cumsum of blank posteriors.
        blank_lp = self.x[:, :, self.blank_index]  # (n, T)
        r = r.at[:, 1, :].set(jnp.cumsum(blank_lp, axis=1).T)
        psi_prev = jnp.zeros((n,))
        last_token = jnp.full((n,), -1, jnp.int32)
        return {
            "r": r,
            "psi_prev": psi_prev,
            "last_token": last_token,
            # i32 scalar (not a python int) so the state is a valid
            # fixed-structure lax.while_loop carry
            "step": jnp.asarray(0, jnp.int32),
        }

    def forward_step(self, inp_tokens, state, candidates=None, attn=None):
        """Score all vocab candidates for each row's prefix + inp_tokens.

        inp_tokens: (n,) the tokens JUST added to each prefix (the
        attention search's current expansion); state reflects the prefix
        BEFORE inp_tokens on the first call semantics of the reference:
        here we follow the reference's convention that forward_step is
        called with the prefix's last tokens and returns candidate
        scores for the NEXT tokens.
        """
        if state is None:
            state = self.init_state()
        n = self.batch_size * self.beam_size
        V = self.vocab_size
        x = self.x  # (n, T, V)
        r_prev = state["r"]  # (T, 2, n) lattice of prefix g
        psi_prev = state["psi_prev"]

        # Partial mode (reference ctc.py:120-146): only score the given
        # K candidate tokens per row — the lattice storage drops from
        # O(T*n*V) to O(T*n*K), making vocab-5k/beam-66 decoding viable.
        if candidates is not None:
            candidates = jnp.asarray(candidates, jnp.int32)  # (n, K)
            K = candidates.shape[1]
            xc_full = x  # (n, T, V)
            x_sel = jnp.take_along_axis(
                xc_full, candidates[:, None, :], axis=2
            )  # (n, T, K)
            xc = jnp.swapaxes(x_sel, 0, 1)  # (T, n, K)
            cand_ids = candidates
            width = K
        else:
            xc = jnp.swapaxes(x, 0, 1)  # (T, n, V)
            cand_ids = jnp.broadcast_to(jnp.arange(V)[None, :], (n, V))
            width = V

        # phi: (T, n, width) score of ending in blank or different char
        r_sum = jnp.logaddexp(r_prev[:, 0], r_prev[:, 1])  # (T, n)
        phi = jnp.broadcast_to(
            r_sum[:, :, None], (self.T, n, width)
        )
        # When candidate == last token of prefix, phi = r_prev[blank]
        last = state["last_token"]  # (n,)
        same = cand_ids == last[:, None]  # (n, width)
        phi = jnp.where(
            same[None, :, :], r_prev[:, 1][:, :, None], phi
        )

        # Time recursion for prefix h = g + c:
        # r_nb[t] = logaddexp(r_nb[t-1], phi[t-1]) + x[t, c]
        # r_b[t]  = logaddexp(r_nb[t-1], r_b[t-1]) + x[t, blank]
        xb = jnp.swapaxes(x, 0, 1)[:, :, self.blank_index][
            :, :, None
        ]  # (T, n, 1)

        # Reference convention (ctc.py:190-192): the prefix INCLUDES the
        # bos token, so prefix_length = step + 1 and the time recursion
        # starts at start = max(1, prefix_length) — each emitted symbol
        # consumes at least one frame, and a frame-0 emission for the
        # first real character is excluded (r[0] stays -inf because
        # prefix_length is never 0 in the searcher).
        prefix_length = state["step"] + 1
        start = jnp.maximum(1, jnp.asarray(prefix_length, jnp.int32))
        r_nb0 = jnp.full((n, width), self.minus_inf)
        psi_init_0 = jnp.full((n, width), self.minus_inf)
        r_b0 = jnp.full((n, width), self.minus_inf)

        # Attention-window mode (reference ctc.py:190-197): restrict the
        # time recursion to [min(attn_peak)-W, max(attn_peak)+W).  The
        # reference extracts the bounds with .item() (host sync +
        # dynamic loop range); here they stay traced and the scan is
        # masked — identical numerics, static shapes, no sync.
        win_lo = win_hi = None
        if self.ctc_window_size > 0 and attn is not None:
            attn = jnp.asarray(attn)
            if attn.ndim == 4:  # (n, heads, q, T): avg heads, last q
                attn = attn.mean(axis=1)[:, -1, :]
            elif attn.ndim == 3:  # (n, q, T): last query step
                attn = attn[:, -1, :]
            attn_peak = jnp.argmax(attn, axis=-1)  # (n,)
            win_lo = jnp.maximum(
                start, jnp.min(attn_peak) - self.ctc_window_size
            )
            win_hi = jnp.minimum(
                self.T, jnp.max(attn_peak) + self.ctc_window_size
            )

        # The time recursions are LINEAR in the log semiring
        # (logaddexp as +, addition as *), so instead of a sequential
        # T-step lax.scan (250 tiny fused iterations per decode step —
        # per-iteration overhead dominated the scorer's cost) they run
        # as parallel associative scans of depth ceil(log2 T):
        #   r_nb[t] = (r_nb[t-1] * x[t]) + (phi[t-1] * x[t])
        #     => a[t] = x[t], b[t] = phi[t-1] + x[t]
        #   r_b[t]  = (r_b[t-1] * xb[t]) + (r_nb[t-1] * xb[t])
        # Masked frames (t < start, or outside the attention window)
        # force r[t] = -inf, which is a[t] = b[t] = -inf: both the
        # frame's own contribution and any propagation through it die,
        # exactly like the sequential where() masking.
        t_idx = jnp.arange(1, self.T).reshape(-1, 1, 1)
        bad = t_idx < start
        if win_lo is not None:
            bad = bad | ~((t_idx >= win_lo) & (t_idx < win_hi))
        xc_t = jnp.where(bad, self.minus_inf, xc[1:])
        xb_t = jnp.broadcast_to(xb[1:], xc[1:].shape)
        xb_t = jnp.where(bad, self.minus_inf, xb_t)
        phix = phi[:-1] + xc[1:]  # phi[t-1] + x[t]
        b_nb = jnp.where(bad, self.minus_inf, phix)

        def semiring_op(left, right):
            a1, b1 = left
            a2, b2 = right
            return a1 + a2, jnp.logaddexp(b2, a2 + b1)

        _, r_nbs_t = jax.lax.associative_scan(
            semiring_op, (xc_t, b_nb), axis=0
        )
        r_nb_prev_t = jnp.concatenate(
            [r_nb0[None], r_nbs_t[:-1]], axis=0
        )
        b_b = jnp.where(bad, self.minus_inf, r_nb_prev_t + xb[1:])
        _, r_bs_t = jax.lax.associative_scan(
            semiring_op, (xb_t, b_b), axis=0
        )
        # psi accumulates logaddexp over valid t of phi[t-1] + x[t]
        # (+ the -inf init terms): a pure masked logsumexp reduction
        psi0 = jnp.logaddexp(psi_init_0, r_nb0)
        psi = jnp.logaddexp(
            psi0,
            jax.nn.logsumexp(
                jnp.where(bad, self.minus_inf, phix), axis=0
            ),
        )
        r_nbs = jnp.concatenate([r_nb0[None], r_nbs_t], axis=0)
        r_bs = jnp.concatenate([r_b0[None], r_bs_t], axis=0)

        # psi currently integrates frames 1..T-1 (+ t=0 via psi0); limit
        # to each row's true length: psi over t < abs_len. Because x is
        # masked (-inf for non-blank past abs_len), the extra terms are
        # -inf and psi is already correct.

        # EOS candidate: psi(eos) = r_sum at the last valid frame.
        final_r_sum = r_sum[self.last_frame_index, jnp.arange(n)]  # (n,)
        psi = jnp.where(
            cand_ids == self.eos_index, final_r_sum[:, None], psi
        )
        # Blank candidate is excluded (never expanded).
        psi = jnp.where(cand_ids == self.blank_index, self.minus_inf, psi)

        scores = psi - psi_prev[:, None]  # delta score
        new_state = {
            "r_all": jnp.stack([r_nbs, r_bs], axis=1),  # (T, 2, n, width)
            "psi_all": psi,
            "cand_ids": cand_ids,
            "r": r_prev,
            "psi_prev": psi_prev,
            "last_token": last,
            "step": state["step"] + 1,
        }
        return scores, new_state

    def permute_mem(self, state, index):
        """Commit the chosen candidates: index (n,) flat candidate ids
        = beam_offset * V + token.  Select each row's lattice slice for
        its chosen token, and reorder rows by predecessor beams.
        """
        n = self.batch_size * self.beam_size
        V = self.vocab_size
        tokens = index % V  # (n,) chosen token per new row
        # predecessor row within the whole n = batch*beam layout:
        beam_pred = index // V  # (n,) in [0, beam) relative to batch
        batch_idx = jnp.repeat(
            jnp.arange(self.batch_size), self.beam_size
        )
        rows = batch_idx * self.beam_size + beam_pred  # (n,)
        r_all = state["r_all"]  # (T, 2, n, width)
        cand_ids = state["cand_ids"]  # (n, width)
        # Position of the chosen token in the predecessor's candidate
        # list (identity map in full mode).
        pos = jnp.argmax(
            cand_ids[rows] == tokens[:, None], axis=1
        )  # (n,)
        r_new = r_all[:, :, rows, pos]  # (T, 2, n)
        psi_new = state["psi_all"][rows, pos]  # (n,)
        return {
            "r": r_new,
            "psi_prev": psi_new,
            "last_token": tokens.astype(jnp.int32),
            "step": state["step"],
        }
