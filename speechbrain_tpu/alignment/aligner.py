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
        self,
        states_per_phoneme=1,
        output_folder="",
        neg_inf=-1e20,
        lexicon_path=None,
    ):
        self.states_per_phoneme = states_per_phoneme
        self.neg_inf = neg_inf
        self.align_dict = {}
        self.lexicon = None
        if lexicon_path is not None:
            self._load_lexicon(lexicon_path)

    def _load_lexicon(self, lexicon_path):
        """Parse a ``word phn1 phn2 ...`` lexicon file with repeated
        lines for alternative pronunciations (reference aligner
        ``__init__`` lexicon branch, aligner.py:98-136)."""
        lexicon = {}
        phones = set()
        with open(lexicon_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2:
                    continue
                word, pron = parts[0], " ".join(parts[1:])
                phones.update(parts[1:])
                if word in lexicon:
                    lexicon[word][len(lexicon[word])] = pron
                else:
                    lexicon[word] = {0: pron}
        self.lexicon = lexicon
        phones = sorted(phones)
        # sil reserved at index 0 (not usually in the lexicon itself).
        self.lex_lab2ind = {p: i + 1 for i, p in enumerate(phones)}
        self.lex_ind2lab = {i + 1: p for i, p in enumerate(phones)}
        self.lex_lab2ind["sil"] = 0
        self.lex_ind2lab[0] = "sil"

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
        # reference emission prep (aligner.py:538-595): frames past the
        # utterance are ZERO (not -inf), padded states are -inf
        t_valid = jnp.arange(T)[None, :] < abs_T[:, None]
        emis = jnp.where(t_valid[:, :, None], emis, 0.0)
        u_valid = jnp.arange(U)[None, :] < abs_U[:, None]
        emis = jnp.where(u_valid[:, None, :], emis, self.neg_inf)

        # Left-to-right: state u from u (self-loop) or u-1 (advance).
        # Reference transition probs (aligner.py:473-535): each state's
        # {self-loop, advance} row is log-softmaxed -> log(0.5) each,
        # except the FINAL state whose only option is the self-loop
        # (log 1 = 0).
        log_half = float(np.log(0.5))
        is_final = (
            jnp.arange(U)[None, :] == jnp.clip(abs_U - 1, 0, U - 1)[:, None]
        )
        stay_cost = jnp.where(is_final, 0.0, log_half)  # (B, U)
        adv_cost = log_half  # from u-1, never the final state

        def fwd_step(alpha, inp):
            e_t, t = inp
            stay = alpha + stay_cost
            adv = jnp.pad(
                alpha[:, :-1], ((0, 0), (1, 0)),
                constant_values=self.neg_inf,
            ) + adv_cost
            new = jnp.logaddexp(stay, adv) + e_t
            # reference freezes transitions once lens_abs < t
            # (aligner.py:646-652: identity transition, zero emission)
            frozen = abs_T < t
            alpha = jnp.where(frozen[:, None], alpha, new)
            return alpha, alpha

        def vit_step(alpha, e_t):
            stay = alpha + stay_cost
            adv = jnp.pad(
                alpha[:, :-1], ((0, 0), (1, 0)),
                constant_values=self.neg_inf,
            ) + adv_cost
            take_adv = adv > stay
            alpha = jnp.where(take_adv, adv, stay) + e_t
            return alpha, (alpha, take_adv)

        alpha0 = jnp.full((B, U), self.neg_inf)
        alpha0 = alpha0.at[:, 0].set(emis[:, 0, 0])
        emis_t = jnp.swapaxes(emis, 0, 1)  # (T, B, U)
        if dp == "forward":
            alpha_T, _ = jax.lax.scan(
                fwd_step, alpha0, (emis_t[1:], jnp.arange(1, T))
            )
            # reference likelihood: logsumexp over ALL states at the
            # final (max) frame (aligner.py:663-666)
            return jax.scipy.special.logsumexp(alpha_T, axis=1)
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

    # -- lexicon graphs (multi-pronunciation alignment) -----------------

    def _use_lexicon(self, words, interword_sils, sample_pron):
        """Build one utterance's HMM graph from the lexicon: optional
        silences, one branch per pronunciation (reference aligner.py:138).

        Returns (phoneme_state_ids, log transition matrix, start states,
        final states) — all numpy/python.
        """
        import random as _random

        spp = self.states_per_phoneme
        sil = self.silence_index
        n_states = 0
        words_prime = []  # [word_idx, [state seqs per pron], is_sil]
        phoneme_indices = []
        word_index = 0

        def add_sil():
            nonlocal n_states, word_index
            words_prime.append(
                [word_index, [[n_states + i for i in range(spp)]], True]
            )
            phoneme_indices.extend(sil * spp + i for i in range(spp))
            n_states += spp
            word_index += 1

        for word in words:
            if word_index == 0 or interword_sils:
                add_sil()
            entry = [word_index, [], False]
            prons = list(self.lexicon[word].values())
            if sample_pron and len(prons) > 1:
                prons = [_random.choice(prons)]
            for pron_idx, pron in enumerate(prons):
                entry[1].append([])
                for p in pron.split():
                    phoneme_indices.extend(
                        self.lex_lab2ind[p] * spp + i for i in range(spp)
                    )
                    entry[1][pron_idx].extend(
                        n_states + i for i in range(spp)
                    )
                    n_states += spp
            words_prime.append(entry)
            word_index += 1
        add_sil()  # optional final silence

        trans = np.eye(n_states)  # self-loops
        final_states = []
        for entry in words_prime:
            word_idx, prons, is_sil = entry
            next_word_exists = word_idx < len(words_prime) - 2
            last_states = [p[-1] for p in prons]
            for pron in prons:
                for a, b in zip(pron[:-1], pron[1:]):
                    trans[a, b] = 1.0
            if next_word_exists:
                nxt = word_idx + (1 if (is_sil or not interword_sils) else 2)
                for ls in last_states:
                    for pron in words_prime[nxt][1]:
                        trans[ls, pron[0]] = 1.0
            else:
                final_states += last_states
            if not is_sil:
                sil_start = words_prime[word_idx + 1][1][0][0]
                for ls in last_states:
                    trans[ls, sil_start] = 1.0
        with np.errstate(divide="ignore"):
            log_trans = np.where(trans == 1.0, 0.0, -np.inf)
        log_trans = log_trans - jax.nn.logsumexp(
            jnp.asarray(log_trans), axis=1, keepdims=True
        )
        log_trans = np.nan_to_num(
            np.asarray(log_trans), nan=self.neg_inf, neginf=self.neg_inf
        )
        start_states = [words_prime[0][1][0][0]] + [
            p[0] for p in words_prime[1][1]
        ]
        return (
            np.asarray(phoneme_indices, np.int64),
            log_trans,
            start_states,
            final_states,
        )

    def use_lexicon(self, words, interword_sils=True, sample_pron=False):
        """Batched lexicon graphs (reference aligner.py:294).

        Arguments
        ---------
        words : list[list[str]] transcripts per utterance.
        interword_sils : bool — optional silences between words (else
            only at utterance edges).
        sample_pron : bool — sample one pronunciation instead of
            keeping all branches.

        Returns (poss_phns (B, U), poss_phn_lens rel (B,), trans_prob
        (B, U, U), pi_prob (B, U), final_states list[list[int]]).
        """
        self.silence_index = self.lex_lab2ind["sil"]
        rows = [
            self._use_lexicon(ws, interword_sils, sample_pron)
            for ws in words
        ]
        U_max = max(len(r[0]) for r in rows)
        B = len(rows)
        poss_phns = np.zeros((B, U_max), np.int64)
        trans_prob = np.full((B, U_max, U_max), self.neg_inf)
        pi_prob = np.full((B, U_max), self.neg_inf)
        lens = np.zeros(B)
        final_states = []
        for b, (phns_b, trans_b, starts_b, finals_b) in enumerate(rows):
            U = len(phns_b)
            poss_phns[b, :U] = phns_b
            trans_prob[b, :U, :U] = trans_b
            # padding states: absorbing self-loops keep the DP benign
            for u in range(U, U_max):
                trans_prob[b, u, u] = 0.0
            pi = np.full(U_max, self.neg_inf)
            pi[starts_b] = 1.0
            pi_prob[b] = pi - jax.nn.logsumexp(jnp.asarray(pi))
            lens[b] = U / U_max
            final_states.append(finals_b)
        return (
            jnp.asarray(poss_phns),
            jnp.asarray(lens),
            jnp.asarray(trans_prob),
            jnp.asarray(pi_prob),
            final_states,
        )

    def forward_graph(
        self,
        emission_pred,
        lens,
        poss_phns,
        poss_phn_lens,
        trans_prob,
        pi_prob,
        final_states,
        dp="forward",
    ):
        """Alignment DP over an arbitrary transition graph (the lexicon
        path of reference ``forward(prob_matrices=...)``, aligner.py:819).

        forward: (B,) log-likelihood summed over final states.
        viterbi: ((B,) best-path scores, alignments list[list[int]]).
        """
        emission_pred = jnp.asarray(emission_pred)
        B, T, _ = emission_pred.shape
        poss_phns = jnp.asarray(poss_phns, jnp.int32)
        U = poss_phns.shape[1]
        abs_T = jnp.round(jnp.asarray(lens) * T).astype(jnp.int32)
        abs_U = jnp.round(jnp.asarray(poss_phn_lens) * U).astype(jnp.int32)
        emis = self._emission(emission_pred, poss_phns)  # (B, T, U)
        u_valid = jnp.arange(U)[None, :] < abs_U[:, None]
        emis = jnp.where(u_valid[:, None, :], emis, self.neg_inf)
        A = jnp.swapaxes(jnp.asarray(trans_prob), 1, 2)  # in->out
        emis_t = jnp.swapaxes(emis, 0, 1)  # (T, B, U)
        alpha0 = jnp.asarray(pi_prob) + emis[:, 0]
        final_mask = jnp.full((B, U), False)
        for b, fs in enumerate(final_states):
            final_mask = final_mask.at[b, jnp.asarray(fs)].set(True)
        ts = jnp.arange(1, T)

        if dp == "forward":
            def fwd_step(alpha, inputs):
                e_t, t = inputs
                new = batch_log_matvecmul(A, alpha) + e_t
                # Freeze rows whose utterance already ended.
                alpha = jnp.where((t < abs_T)[:, None], new, alpha)
                return alpha, None

            alpha_T, _ = jax.lax.scan(fwd_step, alpha0, (emis_t[1:], ts))
            score = jnp.where(final_mask, alpha_T, self.neg_inf)
            return jax.nn.logsumexp(score, axis=-1)

        def vit_step(alpha, inputs):
            e_t, t = inputs
            best, arg = batch_log_maxvecmul(A, alpha)
            active = (t < abs_T)[:, None]
            alpha = jnp.where(active, best + e_t, alpha)
            # Self-point frozen rows so backtrace stays put.
            arg = jnp.where(active, arg, jnp.arange(U)[None, :])
            return alpha, arg

        alpha_T, args = jax.lax.scan(vit_step, alpha0, (emis_t[1:], ts))
        score_masked = jnp.where(final_mask, alpha_T, self.neg_inf)
        scores = jnp.max(score_masked, axis=-1)
        # Host backtrace (decode-time path, like the reference).
        args_np = np.asarray(args)  # (T-1, B, U)
        final_t = np.asarray(jnp.clip(abs_T - 1, 0, T - 1))
        phns_np = np.asarray(poss_phns)
        u_best = np.asarray(jnp.argmax(score_masked, axis=-1))
        alignments = []
        for b in range(B):
            u = int(u_best[b])
            path = [int(phns_np[b, u])]
            for t in range(int(final_t[b]) - 1, -1, -1):
                u = int(args_np[t, b, u])
                path.append(int(phns_np[b, u]))
            alignments.append(path[::-1])
        return scores, alignments

    # -- alignment storage (flat-start training support) ----------------

    def viterbi_targets(self, emission_pred, lens, phns, phn_lens):
        """Per-frame Viterbi state targets as a TRACEABLE (B, T) int
        array — usable inside jitted train steps (the list-returning
        ``forward(dp="viterbi")`` backtrace is host-side).  Padded
        frames repeat each row's final state; mask them with ``lens``
        in the loss."""
        return _viterbi_targets_impl(
            emission_pred, lens, phns, phn_lens, self.neg_inf
        )

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


def _viterbi_targets_impl(emission_pred, lens, phns, phn_lens, neg_inf):
    """Traceable Viterbi per-frame targets (see
    HMMAligner.viterbi_targets)."""
    emission_pred = jnp.asarray(emission_pred)
    B, T, _ = emission_pred.shape
    phns = jnp.asarray(phns, jnp.int32)
    U = phns.shape[1]
    abs_T = jnp.round(jnp.asarray(lens) * T).astype(jnp.int32)
    abs_U = jnp.round(jnp.asarray(phn_lens) * U).astype(jnp.int32)
    emis = jnp.take_along_axis(
        emission_pred, phns[:, None, :], axis=-1
    )  # (B, T, U)
    u_valid = jnp.arange(U)[None, :] < abs_U[:, None]
    emis = jnp.where(u_valid[:, None, :], emis, neg_inf)

    def vit_step(alpha, e_t):
        stay = alpha
        adv = jnp.pad(
            alpha[:, :-1], ((0, 0), (1, 0)), constant_values=neg_inf
        )
        take_adv = adv > stay
        alpha = jnp.where(take_adv, adv, stay) + e_t
        return alpha, take_adv

    alpha0 = jnp.full((B, U), neg_inf)
    alpha0 = alpha0.at[:, 0].set(emis[:, 0, 0])
    emis_t = jnp.swapaxes(emis, 0, 1)
    _, moves = jax.lax.scan(vit_step, alpha0, emis_t[1:])
    moves = jnp.concatenate([jnp.zeros((1, B, U), bool), moves], axis=0)
    final_u = jnp.clip(abs_U - 1, 0, U - 1)
    rows = jnp.arange(B)

    def back_step(u, inputs):
        moves_t, t = inputs
        # Freeze the pointer on padded frames past each row's end.
        active = t <= (abs_T - 1)
        emit = phns[rows, u]
        step_back = moves_t[rows, u] & active & (u > 0)
        new_u = jnp.where(step_back, u - 1, u)
        # Rows past their end re-anchor at their own final state.
        new_u = jnp.where(active, new_u, final_u)
        return new_u, emit

    _, targets_rev = jax.lax.scan(
        back_step,
        final_u,
        (jnp.flip(moves, axis=0), jnp.arange(T - 1, -1, -1)),
    )
    return jnp.flip(jnp.swapaxes(targets_rev, 0, 1), axis=1)  # (B, T)


def map_inds_to_intersect(lists1, lists2, ind2labs):
    """Map index sequences from two different phoneme sets into one
    shared index space so equality comparison is meaningful (reference
    ``alignment/aligner.py:1324``; label sets are sorted here for
    deterministic index assignment).

    Example
    -------
    >>> out1, out2 = map_inds_to_intersect(
    ...     [[0, 1]], [[0, 1]], ({0: "a", 1: "b"}, {0: "a", 1: "c"}))
    >>> out1, out2
    ([[0, 1]], [[0, 2]])
    """
    ind2lab1, ind2lab2 = ind2labs
    set1, set2 = set(ind2lab1.values()), set(ind2lab2.values())
    intersect = sorted(set1.intersection(set2))
    set1_only = sorted(set1.difference(set2))
    set2_only = sorted(set2.difference(set1))
    new_lab2ind = {lab: i for i, lab in enumerate(intersect)}
    new_lab2ind.update(
        {lab: len(intersect) + i for i, lab in enumerate(set1_only)}
    )
    new_lab2ind.update(
        {
            lab: len(intersect) + len(set1_only) + i
            for i, lab in enumerate(set2_only)
        }
    )
    lists1_new = [
        [new_lab2ind[ind2lab1[ind]] for ind in utt] for utt in lists1
    ]
    lists2_new = [
        [new_lab2ind[ind2lab2[ind]] for ind in utt] for utt in lists2
    ]
    return lists1_new, lists2_new
