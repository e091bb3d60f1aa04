"""Speaker diarization: RTTM I/O, spectral clustering, k-means, AHC.

Host-side (numpy/sklearn), as in the reference
(``processing/diarization.py:54,301`` RTTM, ``:535,620,710`` spectral,
``:1045`` k-means, ``:1126`` AHC).
"""

import csv
import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "read_rttm",
    "write_rttm",
    "merge_ssegs_same_speaker",
    "distribute_overlap",
    "spectral_embedding_sb",
    "Spec_Clust_unorm",
    "spectral_clustering_sb",
    "do_spec_clustering",
    "do_kmeans_clustering",
    "do_AHC",
]


def read_rttm(rttm_file_path):
    """Read an RTTM file into a list of row lists."""
    rttm = []
    with open(rttm_file_path) as f:
        for line in f:
            entry = line.rstrip("\n").split()
            if entry:
                rttm.append(entry)
    return rttm


def write_rttm(segs_list, out_rttm_file):
    """Write diarized segments as RTTM.

    segs_list rows: [rec_id, start(sec), end(sec), spkr_id]
    """
    rttm = []
    for seg in segs_list:
        new_row = [
            "SPEAKER",
            seg[0],
            "0",
            str(round(float(seg[1]), 4)),
            str(round(float(seg[2]) - float(seg[1]), 4)),
            "<NA>",
            "<NA>",
            seg[3],
            "<NA>",
            "<NA>",
        ]
        rttm.append(new_row)
    with open(out_rttm_file, "w") as f:
        for row in rttm:
            f.write(" ".join(row) + "\n")


def merge_ssegs_same_speaker(lol, rec_id):
    """Merge adjacent sub-segments with the same speaker label.

    lol rows: [rec_id, sseg_start, sseg_end, spkr_id].

    Example
    -------
    >>> merged = merge_ssegs_same_speaker(
    ...     [["r1", 0.0, 1.0, "s1"], ["r1", 1.0, 2.0, "s1"],
    ...      ["r1", 2.0, 3.0, "s2"]], "r1")
    >>> len(merged)
    2
    """
    new_lol = []
    sseg = list(lol[0])
    for i in range(1, len(lol)):
        next_sseg = lol[i]
        if next_sseg[3] == sseg[3] and abs(
            float(next_sseg[1]) - float(sseg[2])
        ) < 1e-6:
            sseg[2] = next_sseg[2]
        else:
            new_lol.append(sseg)
            sseg = list(next_sseg)
    new_lol.append(sseg)
    return new_lol


def distribute_overlap(lol):
    """Shrink overlapping adjacent segments to meet at the midpoint."""
    new_lol = []
    if not lol:
        return new_lol
    sseg = list(lol[0])
    for i in range(1, len(lol)):
        next_sseg = list(lol[i])
        if float(next_sseg[1]) < float(sseg[2]):
            overlap = float(sseg[2]) - float(next_sseg[1])
            sseg[2] = float(sseg[2]) - overlap / 2.0
            next_sseg[1] = float(next_sseg[1]) + overlap / 2.0
        new_lol.append(sseg)
        sseg = next_sseg
    new_lol.append(sseg)
    return new_lol


def get_oracle_num_spkrs(rec_id, spkr_info):
    """Count speakers of a recording from RTTM SPKR-INFO lines."""
    num_spkrs = 0
    for line in spkr_info:
        if rec_id in line:
            num_spkrs += 1
    return num_spkrs


def spectral_embedding_sb(adjacency, n_components=8, norm_laplacian=True):
    """Laplacian eigenmap embedding of an affinity matrix."""
    A = np.asarray(adjacency, dtype=np.float64)
    d = A.sum(axis=1)
    d = np.maximum(d, 1e-12)
    if norm_laplacian:
        D_inv_sqrt = 1.0 / np.sqrt(d)
        L = np.eye(len(A)) - (A * D_inv_sqrt[:, None]) * D_inv_sqrt[None, :]
    else:
        L = np.diag(d) - A
    vals, vecs = np.linalg.eigh(L)
    embedding = vecs[:, :n_components]
    if norm_laplacian:
        embedding = embedding * (1.0 / np.sqrt(d))[:, None]
    return embedding


class Spec_Clust_unorm:
    """Unnormalized spectral clustering with eigengap-based k estimation.

    Parity target: reference ``diarization.py:710``.
    """

    def __init__(self, min_num_spkrs=2, max_num_spkrs=10):
        self.min_num_spkrs = min_num_spkrs
        self.max_num_spkrs = max_num_spkrs

    def do_spec_clust(self, X, k_oracle, p_val):
        """Full unnormalized spectral clustering pipeline."""
        sim_mat = self.get_sim_mat(X)
        prunned_sim_mat = self.p_pruning(sim_mat, p_val)
        sym_prund_sim_mat = 0.5 * (
            prunned_sim_mat + prunned_sim_mat.T
        )
        laplacian = self.get_laplacian(sym_prund_sim_mat)
        emb, num_of_spk = self.get_spec_embs(laplacian, k_oracle)
        self.cluster_embs(emb, num_of_spk)

    def get_sim_mat(self, X):
        """Cosine similarity matrix of the embeddings."""
        X = np.asarray(X)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = X / np.maximum(norms, 1e-12)
        return Xn @ Xn.T

    def p_pruning(self, A, pval):
        """Keep the top-p affinities per row, zero the rest."""
        A = A.copy()
        n = A.shape[0]
        n_keep = max(int(round(pval * n)), 2)
        for i in range(n):
            order = np.argsort(A[i])  # ascending
            A[i, order[: n - n_keep]] = 0.0
        return A

    def get_laplacian(self, M):
        """Unnormalized graph Laplacian of the pruned sim matrix."""
        M = M.copy()
        np.fill_diagonal(M, 0.0)
        D = np.diag(M.sum(axis=1))
        return D - M

    def get_spec_embs(self, L, k_oracle=4):
        """Spectral embeddings + estimated k from the Laplacian."""
        vals, vecs = np.linalg.eigh(L)
        if k_oracle is not None:
            num_of_spk = k_oracle
        else:
            lambda_gap = np.diff(
                vals[self.min_num_spkrs - 1 : self.max_num_spkrs + 1]
            )
            num_of_spk = (
                int(np.argmax(lambda_gap)) + self.min_num_spkrs
            )
        return vecs[:, :num_of_spk], num_of_spk

    def cluster_embs(self, emb, k):
        """Assign embeddings to k clusters via spectral embeddings."""
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=k, n_init=10, random_state=0)
        self.labels_ = km.fit_predict(emb)


def spectral_clustering_sb(affinity, n_clusters=8, n_components=None):
    """Cluster an affinity matrix via Laplacian eigenmaps + k-means."""
    from sklearn.cluster import KMeans

    n_components = n_components or n_clusters
    emb = spectral_embedding_sb(affinity, n_components)
    km = KMeans(n_clusters=n_clusters, n_init=10, random_state=0)
    return km.fit_predict(emb)


def do_spec_clustering(
    diary_obj, out_rttm_file, rec_id, k, pval, affinity_type="cos", n_neighbors=10
):
    """Spectral clustering on a stat object -> RTTM."""
    clust = Spec_Clust_unorm()
    clust.do_spec_clust(diary_obj.stat1, k, pval)
    labels = clust.labels_
    _labels_to_rttm(diary_obj, labels, rec_id, out_rttm_file)


def do_kmeans_clustering(diary_obj, out_rttm_file, rec_id, k_oracle=4, p_val=0.3):
    """K-means on embeddings -> RTTM."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=k_oracle, n_init=10, random_state=0)
    labels = km.fit_predict(np.asarray(diary_obj.stat1))
    _labels_to_rttm(diary_obj, labels, rec_id, out_rttm_file)


def do_AHC(diary_obj, out_rttm_file, rec_id, k_oracle=4, p_val=0.3):
    """Agglomerative hierarchical clustering -> RTTM."""
    from sklearn.cluster import AgglomerativeClustering

    X = np.asarray(diary_obj.stat1)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    ahc = AgglomerativeClustering(n_clusters=k_oracle, linkage="average")
    labels = ahc.fit_predict(Xn)
    _labels_to_rttm(diary_obj, labels, rec_id, out_rttm_file)


def _labels_to_rttm(diary_obj, labels, rec_id, out_rttm_file):
    lol = []
    for i in range(labels.shape[0]):
        spkr_id = rec_id + "_" + str(labels[i])
        sub_seg = diary_obj.segset[i]
        splitted = sub_seg.rsplit("_", 2)
        sseg_start = float(splitted[1])
        sseg_end = float(splitted[2])
        lol.append([rec_id, sseg_start, sseg_end, spkr_id])
    lol.sort(key=lambda x: float(x[1]))
    lol = merge_ssegs_same_speaker(lol, rec_id)
    lol = distribute_overlap(lol)
    write_rttm(lol, out_rttm_file)


def is_overlapped(end1, start2):
    """True if segment 2 starts before segment 1 ends (reference
    ``processing/diarization.py:139``).

    Example
    -------
    >>> is_overlapped(5.5, 3.4)
    True
    >>> is_overlapped(5.5, 6.4)
    False
    """
    return start2 <= end1


def write_ders_file(ref_rttm, DER, out_der_file):
    """Write per-recording DERs + OVERALL line (reference
    ``processing/diarization.py:76``)."""
    rttm = read_rttm(ref_rttm)
    spkr_info = [r for r in rttm if r.startswith("SPKR-INFO")]
    rec_id_list = []
    count = 0
    with open(out_der_file, "w") as f:
        for row in spkr_info:
            rec_id = row.split(" ")[1]
            if rec_id not in rec_id_list:
                rec_id_list.append(rec_id)
                f.write(f"{rec_id} {round(DER[count], 2)}\n")
                count += 1
        f.write(f"OVERALL  {round(DER[count], 2)}\n")


def prepare_subset_csv(full_diary_csv, rec_id, out_csv_file):
    """Write the rows of ``full_diary_csv`` belonging to one recording
    (reference ``processing/diarization.py:110``)."""
    import csv as _csv

    out_csv = [full_diary_csv[0]] + [
        row for row in full_diary_csv if row[0].startswith(rec_id)
    ]
    with open(out_csv_file, mode="w") as csv_file:
        writer = _csv.writer(
            csv_file, delimiter=",", quotechar='"',
            quoting=_csv.QUOTE_MINIMAL,
        )
        for r in out_csv:
            writer.writerow(r)


class Spec_Cluster:
    """k-nearest-neighbour-affinity spectral clustering over embeddings
    (reference ``processing/diarization.py:675``, sklearn-backed there;
    here the affinity graph and clustering are native numpy).

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.RandomState(0)
    >>> X = np.concatenate([rng.randn(10, 4), 10 + rng.randn(10, 4)])
    >>> sc = Spec_Cluster(n_clusters=2)
    >>> _ = sc.perform_sc(X, n_neighbors=5)
    >>> len(set(sc.labels_[:10])), len(set(sc.labels_[10:]))
    (1, 1)
    """

    def __init__(self, n_clusters=4):
        self.n_clusters = n_clusters
        self.affinity_matrix_ = None
        self.labels_ = None

    def perform_sc(self, X, n_neighbors=10):
        """Build a symmetric kNN connectivity graph and spectrally
        cluster it."""
        X = np.asarray(X)
        n = X.shape[0]
        d2 = ((X[:, None] - X[None, :]) ** 2).sum(-1)
        n_neighbors = min(n_neighbors, n)
        conn = np.zeros((n, n))
        order = np.argsort(d2, axis=1)
        for i in range(n):
            conn[i, order[i, :n_neighbors]] = 1.0
        self.affinity_matrix_ = 0.5 * (conn + conn.T)
        self.labels_ = spectral_clustering_sb(
            self.affinity_matrix_, n_clusters=self.n_clusters
        )
        return self
