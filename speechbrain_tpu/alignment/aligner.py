"""HMM forced alignment over network posteriors (log-space DP in jnp).

Parity targets: reference ``alignment/aligner.py:17`` (HMMAligner),
``:596`` (_dp_forward), ``:668`` (_dp_viterbi), ``:1398,1437``
(batch_log_matvecmul / batch_log_maxvecmul).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HMMAligner",
    "batch_log_matvecmul",
    "batch_log_maxvecmul",
]

NEG_INF = -1e20


def batch_log_matvecmul(A, b):
    """Log-space batched matrix-vector product:
    out[i] = logsumexp_j(A[i, j] + b[j]), batched.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> A = jnp.zeros((1, 2, 2))
    >>> b = jnp.zeros((1, 2))
    >>> out = batch_log_matvecmul(A, b)
    >>> round(float(out[0, 0]), 4)
    0.6931
    """
    return jax.nn.logsumexp(A + b[:, None, :], axis=-1)


def batch_log_maxvecmul(A, b):
    """Max-product analogue: out[i] = max_j(A[i,j] + b[j]), plus argmax.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> A = jnp.array([[[0.0, -1.0], [-1.0, 0.0]]])
    >>> b = jnp.array([[0.0, 1.0]])
    >>> out, argmax = batch_log_maxvecmul(A, b)
    >>> int(argmax[0, 1])
    1
    """
    scores = A + b[:, None, :]
    return scores.max(axis=-1), scores.argmax(axis=-1)


class HMMAligner:
    """Left-to-right HMM alignment over posteriors.

    Supports forward (accumulated likelihood) and Viterbi (state path)
    over a per-utterance linear phone-state graph with self-loops and
    optional blank states between phones.

    Arguments
    ---------
    states_per_phoneme : int
    output_folder : str (accepted for parity; alignments kept in memory)
    neg_inf : float
    """

    def __init__(
        self, states_per_phoneme=1, output_folder="", neg_inf=-1e20
    ):
        self.states_per_phoneme = states_per_phoneme
        self.neg_inf = neg_inf
        self.align_dict = {}

    def _build_graph(self, phns):
        """Expand phones to HMM states: (U * states_per_phoneme,) ids."""
        phns = np.asarray(phns)
        states = np.repeat(
            phns * self.states_per_phoneme, self.states_per_phoneme
        )
        offs = np.tile(
            np.arange(self.states_per_phoneme), len(phns)
        )
        return states + offs

    def expand_phns_by_states_per_phoneme(self, phns, phn_lens):
        """Host helper mirroring the reference API."""
        out = []
        phns = np.asarray(phns)
        U = phns.shape[1]
        abs_lens = np.round(np.asarray(phn_lens) * U).astype(int)
        for row, n in zip(phns, abs_lens):
            out.append(self._build_graph(row[:n]))
        max_len = max(len(o) for o in out)
        padded = np.zeros((len(out), max_len), dtype=np.int64)
        for i, o in enumerate(out):
            padded[i, : len(o)] = o
        return jnp.asarray(padded)

    def _emission(self, emission_pred, states):
        """Gather per-state emissions: (B, T, S)."""
        return jnp.take_along_axis(
            emission_pred,
            jnp.asarray(states, jnp.int32)[:, None, :],
            axis=-1,
        )

    def forward(self, emission_pred, lens, phns, phn_lens, dp="forward"):
        """Run alignment DP.

        Arguments
        ---------
        emission_pred : (B, T, n_symbols) log-posteriors
        lens : relative wave lengths (B,)
        phns : (B, U) int states/phonemes
        phn_lens : relative phone lengths (B,)
        dp : "forward" | "viterbi"

        Returns forward: (B,) log-likelihoods;
        viterbi: (log-likelihoods, alignments list[list[int]]).
        """
        emission_pred = jnp.asarray(emission_pred)
        B, T, _ = emission_pred.shape
        phns = jnp.asarray(phns, jnp.int32)
        U = phns.shape[1]
        abs_T = jnp.round(jnp.asarray(lens) * T).astype(jnp.int32)
        abs_U = jnp.round(jnp.asarray(phn_lens) * U).astype(jnp.int32)
        emis = self._emission(emission_pred, phns)  # (B, T, U)
        u_valid = jnp.arange(U)[None, :] < abs_U[:, None]
        emis = jnp.where(u_valid[:, None, :], emis, self.neg_inf)

        # Left-to-right: state u from u (self-loop) or u-1 (advance)
        def fwd_step(alpha, e_t):
            stay = alpha
            adv = jnp.pad(
                alpha[:, :-1], ((0, 0), (1, 0)),
                constant_values=self.neg_inf,
            )
            alpha = jnp.logaddexp(stay, adv) + e_t
            return alpha, alpha

        def vit_step(alpha, e_t):
            stay = alpha
            adv = jnp.pad(
                alpha[:, :-1], ((0, 0), (1, 0)),
                constant_values=self.neg_inf,
            )
            take_adv = adv > stay
            alpha = jnp.where(take_adv, adv, stay) + e_t
            return alpha, (alpha, take_adv)

        alpha0 = jnp.full((B, U), self.neg_inf)
        alpha0 = alpha0.at[:, 0].set(emis[:, 0, 0])
        emis_t = jnp.swapaxes(emis, 0, 1)  # (T, B, U)
        if dp == "forward":
            _, alphas = jax.lax.scan(fwd_step, alpha0, emis_t[1:])
            alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
            final_t = jnp.clip(abs_T - 1, 0, T - 1)
            final_u = jnp.clip(abs_U - 1, 0, U - 1)
            return alphas[final_t, jnp.arange(B), final_u]
        # Viterbi with backtrace
        _, (alphas, moves) = jax.lax.scan(vit_step, alpha0, emis_t[1:])
        alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
        moves = jnp.concatenate(
            [jnp.zeros((1, B, U), bool), moves], axis=0
        )
        final_t = np.asarray(jnp.clip(abs_T - 1, 0, T - 1))
        final_u = np.asarray(jnp.clip(abs_U - 1, 0, U - 1))
        ll = np.asarray(
            alphas[final_t, jnp.arange(B), final_u]
        )
        moves_np = np.asarray(moves)
        phns_np = np.asarray(phns)
        alignments = []
        for b in range(B):
            u = int(final_u[b])
            path = []
            for t in range(int(final_t[b]), -1, -1):
                path.append(int(phns_np[b, u]))
                if moves_np[t, b, u] and u > 0:
                    u -= 1
            alignments.append(path[::-1])
        return jnp.asarray(ll), alignments

    def __call__(self, emission_pred, lens, phns, phn_lens, dp="forward"):
        return self.forward(emission_pred, lens, phns, phn_lens, dp)

    # -- alignment storage (flat-start training support) ----------------

    def store_alignments(self, ids, alignments):
        """Keep viterbi alignments for later batches (reference :1014)."""
        for utt_id, ali in zip(ids, alignments):
            self.align_dict[utt_id] = np.asarray(ali, dtype=np.int64)

    def get_prev_alignments(self, ids, emission_pred, lens, phns, phn_lens):
        """Return stored alignments (or flat-start uniform) as (B, T)."""
        emission_pred = np.asarray(emission_pred)
        B, T, _ = emission_pred.shape
        phns = np.asarray(phns)
        U = phns.shape[1]
        abs_T = np.round(np.asarray(lens) * T).astype(int)
        abs_U = np.round(np.asarray(phn_lens) * U).astype(int)
        out = np.zeros((B, T), dtype=np.int64)
        for b, utt_id in enumerate(ids):
            if utt_id in self.align_dict:
                ali = self.align_dict[utt_id][: abs_T[b]]
                out[b, : len(ali)] = ali
            else:
                # flat start: uniform split of phones over frames
                n_frames = max(abs_T[b], 1)
                n_phns = max(abs_U[b], 1)
                per = max(n_frames // n_phns, 1)
                for u in range(n_phns):
                    s = u * per
                    e = n_frames if u == n_phns - 1 else (u + 1) * per
                    out[b, s:e] = phns[b, u]
        return jnp.asarray(out)

    def calc_accuracy(self, alignments, ends, phns):
        """Alignment accuracy vs ground-truth segment ends (reference
        :1216): fraction of ground-truth boundaries matched within one
        frame."""
        correct = 0
        total = 0
        for ali, end_list, phn_list in zip(alignments, ends, phns):
            boundaries = []
            for i in range(1, len(ali)):
                if ali[i] != ali[i - 1]:
                    boundaries.append(i)
            for e in end_list[:-1]:
                total += 1
                if any(abs(b - e) <= 1 for b in boundaries):
                    correct += 1
        return correct / max(total, 1)
