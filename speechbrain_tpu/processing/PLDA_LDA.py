"""PLDA/LDA speaker verification backend (host-side numpy).

Statistics containers, LDA, EM-trained PLDA and fast scoring.  This is
CPU-side verification plumbing (as in the reference, which is also
numpy: ``processing/PLDA_LDA.py:32`` StatObject_SB, ``:402`` Ndx, ``:542``
Scores, ``:780`` LDA, ``:818`` PLDA, ``:660`` fast_PLDA_scoring).
"""

import copy
import pickle

import numpy as np

__all__ = [
    "StatObject_SB",
    "Ndx",
    "Scores",
    "LDA",
    "PLDA",
    "fast_PLDA_scoring",
]


class StatObject_SB:
    """Container for zero/first-order statistics of segments.

    Attributes: modelset/segset (str arrays), start/stop, stat0 (N, 1)
    and stat1 (N, dim) arrays.
    """

    def __init__(
        self,
        modelset=None,
        segset=None,
        start=None,
        stop=None,
        stat0=None,
        stat1=None,
    ):
        self.modelset = (
            np.asarray(modelset, dtype="<U100") if modelset is not None else np.empty(0, "<U100")
        )
        self.segset = (
            np.asarray(segset, dtype="<U100") if segset is not None else np.empty(0, "<U100")
        )
        n = len(self.segset)
        self.start = start if start is not None else np.empty(n, dtype="|O")
        self.stop = stop if stop is not None else np.empty(n, dtype="|O")
        self.stat0 = stat0 if stat0 is not None else np.array([], dtype=np.float64)
        self.stat1 = stat1 if stat1 is not None else np.array([], dtype=np.float64)

    def save_stat_object(self, filename):
        """Pickle this stat object to disk."""
        with open(filename, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(filename):
        """Load state from the given path."""
        with open(filename, "rb") as f:
            return pickle.load(f)

    def get_mean_stat1(self):
        """Mean of first-order stats over segments."""
        return np.mean(self.stat1, axis=0)

    def get_total_covariance_stat1(self):
        """Total covariance of first-order stats."""
        C = self.stat1 - self.get_mean_stat1()
        return np.dot(C.T, C) / self.stat1.shape[0]

    def get_model_stat0(self, mod_id):
        """Zero-order stats of one model id."""
        return self.stat0[self.modelset == mod_id, :]

    def get_model_stat1(self, mod_id):
        """First-order stats of one model id."""
        return self.stat1[self.modelset == mod_id, :]

    def sum_stat_per_model(self):
        """Sum stat0/stat1 over segments of each model (speaker)."""
        unique = np.unique(self.modelset)
        dim = self.stat1.shape[1]
        sts = StatObject_SB()
        sts.modelset = unique
        sts.segset = unique
        sts.stat0 = np.zeros((len(unique), 1))
        sts.stat1 = np.zeros((len(unique), dim))
        session_per_model = np.zeros(len(unique))
        for idx, model in enumerate(unique):
            sts.stat0[idx] = self.get_model_stat0(model).sum(axis=0)
            sts.stat1[idx] = self.get_model_stat1(model).sum(axis=0)
            session_per_model[idx] += self.get_model_stat1(model).shape[0]
        sts.start = np.empty(len(unique), "|O")
        sts.stop = np.empty(len(unique), "|O")
        return sts, session_per_model

    def center_stat1(self, mu):
        """Subtract mu from first-order stats."""
        self.stat1 = self.stat1 - mu

    def norm_stat1(self):
        """L2-normalize first-order stats per segment."""
        norms = np.linalg.norm(self.stat1, axis=1, keepdims=True)
        self.stat1 = self.stat1 / np.maximum(norms, 1e-12)

    def rotate_stat1(self, R):
        """Rotate first-order stats by the given matrix."""
        self.stat1 = np.dot(self.stat1, R)

    def whiten_stat1(self, mu, sigma):
        """Whiten first-order stats by sigma (Cholesky or eigen)."""
        eigvals, eigvecs = np.linalg.eigh(sigma)
        ind = eigvals.real.argsort()[::-1]
        eigvals = eigvals.real[ind]
        eigvecs = eigvecs.real[:, ind]
        sqr_inv_eval = 1.0 / np.sqrt(np.maximum(eigvals, 1e-12))
        W = eigvecs * sqr_inv_eval
        self.center_stat1(mu)
        self.stat1 = np.dot(self.stat1, W)


class Ndx:
    """Trial index: which (model, test-segment) pairs to score."""

    def __init__(self, models=None, testsegs=None):
        self.modelset = np.unique(np.asarray(models, dtype="<U100"))
        self.segset = np.unique(np.asarray(testsegs, dtype="<U100"))
        self.trialmask = np.zeros(
            (len(self.modelset), len(self.segset)), dtype=bool
        )
        models = np.asarray(models, dtype="<U100")
        testsegs = np.asarray(testsegs, dtype="<U100")
        for m, s in zip(models, testsegs):
            mi = np.where(self.modelset == m)[0][0]
            si = np.where(self.segset == s)[0][0]
            self.trialmask[mi, si] = True


class Scores:
    """Score matrix aligned with an Ndx."""

    def __init__(self):
        self.modelset = np.empty(0, "<U100")
        self.segset = np.empty(0, "<U100")
        self.scoremask = np.array([], dtype=bool)
        self.scoremat = np.array([])


class LDA:
    """Linear discriminant analysis projection over stat objects."""

    def __init__(self):
        self.transform_mat = None

    def do_lda(self, stat_server, reduced_dim=2):
        """Fit the LDA projection from the stat object."""
        unique = np.unique(stat_server.modelset)
        dim = stat_server.stat1.shape[1]
        mu = stat_server.get_mean_stat1()
        Sw = np.zeros((dim, dim))
        Sb = np.zeros((dim, dim))
        for model in unique:
            xs = stat_server.get_model_stat1(model)
            m = xs.mean(axis=0)
            Sw += np.cov(xs.T, bias=True) * xs.shape[0]
            diff = (m - mu)[:, None]
            Sb += xs.shape[0] * diff @ diff.T
        Sw /= len(stat_server.segset)
        Sb /= len(stat_server.segset)
        vals, vecs = np.linalg.eig(np.linalg.solve(Sw + 1e-9 * np.eye(dim), Sb))
        order = np.argsort(-vals.real)
        self.transform_mat = vecs.real[:, order[:reduced_dim]]
        out = copy.deepcopy(stat_server)
        out.rotate_stat1(self.transform_mat)
        return out


class PLDA:
    """Simplified PLDA with EM-trained speaker subspace.

    Model: x = mu + F h + eps, eps ~ N(0, Sigma).
    Parity target: reference ``PLDA_LDA.py:818``.
    """

    def __init__(self, mean=None, F=None, Sigma=None, rank_f=100, nb_iter=10, scaling_factor=1.0):
        self.mean = mean
        self.F = F
        self.Sigma = Sigma
        self.rank_f = rank_f
        self.nb_iter = nb_iter
        self.scaling_factor = scaling_factor

    def plda(self, stat_server, output_file_name=None):
        """EM training on a stat server of speaker-labelled vectors."""
        vect_size = stat_server.stat1.shape[1]
        self.mean = stat_server.get_mean_stat1()
        rank_f = min(self.rank_f, vect_size)

        model_shifted_stat, session_per_model = (
            stat_server.sum_stat_per_model()
        )
        class_nb = model_shifted_stat.modelset.shape[0]

        model_shifted_stat.stat0 *= self.scaling_factor
        model_shifted_stat.stat1 *= self.scaling_factor
        session_per_model *= self.scaling_factor

        sigma_obs = stat_server.get_total_covariance_stat1()
        evals, evecs = np.linalg.eigh(sigma_obs)
        idx = np.argsort(evals)[::-1]
        evecs = evecs.real[:, idx[:rank_f]]
        self.F = evecs[:, :rank_f]
        self.Sigma = sigma_obs.copy()

        for it in range(self.nb_iter):
            # center sums: stat1_i - n_i * mean
            local_stat1 = (
                model_shifted_stat.stat1
                - session_per_model[:, None] * self.mean[None, :]
            )
            # E-step
            inv_sigma = np.linalg.inv(self.Sigma)
            FtS = self.F.T @ inv_sigma  # (r, d)
            e_h = np.zeros((class_nb, rank_f))
            e_hh_sum = np.zeros((rank_f, rank_f))
            R_acc = np.zeros((rank_f, rank_f))
            T_acc = np.zeros((rank_f, vect_size))
            for c in range(class_nb):
                n_c = session_per_model[c]
                prec = np.eye(rank_f) + n_c * (FtS @ self.F)
                cov = np.linalg.inv(prec)
                mu_h = cov @ (FtS @ local_stat1[c])
                e_h[c] = mu_h
                e_hh = cov + np.outer(mu_h, mu_h)
                R_acc += n_c * e_hh
                T_acc += np.outer(mu_h, local_stat1[c])
            # M-step
            self.F = np.linalg.solve(R_acc, T_acc).T
            # Residual covariance
            resid = sigma_obs - self.F @ (
                T_acc / max(session_per_model.sum(), 1.0)
            )
            self.Sigma = 0.5 * (resid + resid.T) + 1e-6 * np.eye(vect_size)
        return self


def fast_PLDA_scoring(
    enroll,
    test,
    ndx,
    mu,
    F,
    Sigma,
    test_uncertainty=None,
    Vtrans=None,
    p_known=0.0,
    scaling_factor=1.0,
    check_missing=True,
):
    """Log-likelihood-ratio PLDA scoring of enroll/test stat pairs.

    Reference ``PLDA_LDA.py:660``.
    """
    enroll_copy = copy.deepcopy(enroll)
    test_copy = copy.deepcopy(test)
    enroll_copy.center_stat1(mu)
    test_copy.center_stat1(mu)

    vect_size = enroll_copy.stat1.shape[1]
    rank_f = F.shape[1]
    # Precompute
    Sigma_tot = Sigma + F @ F.T
    inv_Sigma_tot = np.linalg.inv(Sigma_tot)
    # Between-class contribution for the same-speaker hypothesis:
    # [[Sigma_tot, FF^T], [FF^T, Sigma_tot]] block structure
    FFt = F @ F.T
    top = np.concatenate([Sigma_tot, FFt], axis=1)
    bottom = np.concatenate([FFt, Sigma_tot], axis=1)
    Sigma_same = np.concatenate([top, bottom], axis=0)
    inv_Sigma_same = np.linalg.inv(Sigma_same)

    _, logdet_tot = np.linalg.slogdet(Sigma_tot)
    _, logdet_same = np.linalg.slogdet(Sigma_same)

    scores = Scores()
    scores.modelset = ndx.modelset
    scores.segset = ndx.segset
    scores.scoremask = ndx.trialmask
    M = len(ndx.modelset)
    S = len(ndx.segset)
    scoremat = np.zeros((M, S))
    # Index lookup for stats
    enroll_idx = {m: i for i, m in enumerate(enroll_copy.modelset)}
    test_idx = {s: i for i, s in enumerate(test_copy.segset)}
    for mi, model in enumerate(ndx.modelset):
        e = enroll_copy.stat1[enroll_idx[model]]
        for si, seg in enumerate(ndx.segset):
            if not ndx.trialmask[mi, si]:
                continue
            t = test_copy.stat1[test_idx[seg]]
            pair = np.concatenate([e, t])
            ll_same = -0.5 * (
                pair @ inv_Sigma_same @ pair + logdet_same
            )
            ll_diff = -0.5 * (
                e @ inv_Sigma_tot @ e
                + t @ inv_Sigma_tot @ t
                + 2 * logdet_tot
            )
            scoremat[mi, si] = (ll_same - ll_diff) * scaling_factor
    scores.scoremat = scoremat
    return scores


def diff(list1, list2):
    """Sorted difference between lists (reference
    ``processing/PLDA_LDA.py:389``).

    Example
    -------
    >>> diff(["b", "a", "c"], ["c"])
    ['a', 'b']
    """
    c = [item for item in list1 if item not in list2]
    c.sort()
    return c


def ismember(list1, list2):
    """Elementwise membership of list1 in list2 (reference
    ``processing/PLDA_LDA.py:396``).

    Example
    -------
    >>> ismember(["a", "z"], ["a", "b"])
    [True, False]
    """
    return [item in list2 for item in list1]


def fa_model_loop(
    batch_start, mini_batch_indices, factor_analyser, stat0, stat1,
    e_h, e_hh,
):
    """E-step accumulation loop for PLDA factor analysis (reference
    ``processing/PLDA_LDA.py:597``): for each session, computes the
    posterior mean ``e_h`` and second moment ``e_hh`` of the latent
    factor.  Accumulators are filled in place (numpy, host-side)."""
    F = factor_analyser.F
    Sigma = factor_analyser.Sigma
    rank = F.shape[1]
    if Sigma.ndim == 2:
        A = F.T.dot(F)
        inv_lambda_unique = {}
        for sess in np.unique(stat0[:, 0]):
            inv_lambda_unique[sess] = np.linalg.inv(
                sess * A + np.eye(A.shape[0])
            )
    for idx in mini_batch_indices:
        if Sigma.ndim == 1:
            inv_lambda = np.linalg.inv(
                np.eye(rank)
                + (F.T * stat0[idx + batch_start, :]).dot(F)
            )
        else:
            inv_lambda = inv_lambda_unique[stat0[idx + batch_start, 0]]
        aux = F.T.dot(stat1[idx + batch_start, :])
        e_h[idx] = aux.dot(inv_lambda)
        e_hh[idx] = inv_lambda + np.outer(e_h[idx], e_h[idx])
