"""Diarization error rate computation (native; replaces md-eval.pl).

Parity target: reference ``utils/DER.py:38`` which shells out to the
NIST md-eval.pl script.  This native implementation computes DER =
(false alarm + missed speech + speaker confusion) / total reference
speech time, with optional forgiveness collar, from RTTM segment lists.
"""

import numpy as np

__all__ = ["DER"]


def _to_frames(segments, resolution=0.01):
    """RTTM-style rows -> per-speaker frame sets."""
    out = {}
    max_t = 0.0
    for row in segments:
        # RTTM: SPEAKER rec chan start dur <NA> <NA> spk [<NA> <NA>]
        spk = str(row[7]) if len(row) >= 8 else str(row[-1])
        start, dur = float(row[3]), float(row[4])
        max_t = max(max_t, start + dur)
        frames = out.setdefault(spk, [])
        frames.append((start, start + dur))
    return out, max_t


def DER(
    ref_rttm,
    sys_rttm,
    ignore_overlap=False,
    collar=0.25,
    individual_file_scores=False,
    resolution=0.01,
):
    """Compute diarization error rate.

    Arguments
    ---------
    ref_rttm, sys_rttm : lists of RTTM rows
        ["SPEAKER", rec_id, "0", start, dur, ..., spk_id, ...]
    collar : float
        Forgiveness collar (seconds) around reference boundaries.

    Returns (missed%, falarm%, confusion%, DER%).
    """
    from scipy.optimize import linear_sum_assignment

    ref_spk, ref_max = _to_frames(ref_rttm, resolution)
    sys_spk, sys_max = _to_frames(sys_rttm, resolution)
    T = int(np.ceil(max(ref_max, sys_max) / resolution)) + 1
    n_ref = len(ref_spk)
    n_sys = len(sys_spk)
    ref_mat = np.zeros((n_ref, T), bool)
    sys_mat = np.zeros((n_sys, T), bool)
    collar_mask = np.zeros(T, bool)
    for i, (spk, segs) in enumerate(sorted(ref_spk.items())):
        for s, e in segs:
            ref_mat[i, int(s / resolution) : int(e / resolution)] = True
            if collar > 0:
                cs = max(int((s - collar) / resolution), 0)
                ce = min(int((s + collar) / resolution), T)
                collar_mask[cs:ce] = True
                cs = max(int((e - collar) / resolution), 0)
                ce = min(int((e + collar) / resolution), T)
                collar_mask[cs:ce] = True
    for i, (spk, segs) in enumerate(sorted(sys_spk.items())):
        for s, e in segs:
            sys_mat[i, int(s / resolution) : int(e / resolution)] = True
    keep = ~collar_mask
    if ignore_overlap:
        keep &= ref_mat.sum(0) <= 1
    ref_mat = ref_mat[:, keep]
    sys_mat = sys_mat[:, keep]
    # Optimal speaker mapping by overlap.
    overlap = ref_mat.astype(np.float64) @ sys_mat.T.astype(np.float64)
    rows, cols = linear_sum_assignment(-overlap)
    matched = overlap[rows, cols].sum()
    ref_total = ref_mat.sum()
    sys_total = sys_mat.sum()
    ref_any = ref_mat.any(0)
    sys_any = sys_mat.any(0)
    missed = (ref_any & ~sys_any).sum()
    falarm = (sys_any & ~ref_any).sum()
    both = (ref_any & sys_any).sum()
    confusion = max(ref_total - matched - missed, 0)
    denom = max(ref_total, 1)
    miss_pct = 100.0 * missed / denom
    fa_pct = 100.0 * falarm / denom
    conf_pct = 100.0 * confusion / denom
    der = miss_pct + fa_pct + conf_pct
    return miss_pct, fa_pct, conf_pct, der


def rectify(arr):
    """Correct corner cases and convert scores to percentages
    (reference ``utils/DER.py:24``): NaN (0/0) → 0, inf (x/0) → 1.

    Example
    -------
    >>> rectify(np.array([0.5, np.nan, np.inf])).tolist()
    [50.0, 0.0, 100.0]
    """
    arr = np.asarray(arr, dtype=float)
    arr[np.isnan(arr)] = 0
    arr[np.isinf(arr)] = 1
    return arr * 100.0
