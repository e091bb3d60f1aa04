"""Shoebox image-source room simulation for WHAMR-style RIRs.

Role counterpart of the reference
``recipes/WHAMandWHAMR/meta/wham_room.py`` (a thin subclass of
``pyroomacoustics.ShoeBox``).  This is a NATIVE numpy implementation of
the Allen & Berkley image-source method — no pyroomacoustics
dependency:

- absorption from T60 via the same Sabine inversion the reference uses
  (``24 V ln10 / (c S T60)``), uniform on all walls;
- image grid up to ``max_order = ceil(T60 c / min(room))`` per axis,
  pruned to images within the ``T60`` propagation radius;
- per-image attenuation ``beta^n_reflections / (4 pi d)``, deposited at
  its fractional sample delay by linear interpolation (the reference's
  pyroomacoustics build uses a sinc fractional delay; linear
  interpolation differs only above ~0.4 fs, far beyond speech energy —
  these RIRs drive data augmentation, not acoustics research).

``generate_rirs`` fills ``rir_anechoic`` (direct path only) and
``rir_reverberant`` with the reference's list-of-lists layout
``rir[mic][source]``.
"""

import numpy as np

C_SOUND = 343.0


def _shoebox_rir(room, src, mic, beta, max_order, fs, max_len):
    """One RIR via the vectorized image-source method."""
    room = np.asarray(room, float)
    src = np.asarray(src, float)
    mic = np.asarray(mic, float)
    rir = np.zeros(max_len + 1, np.float64)
    max_dist = max_len / fs * C_SOUND
    orders = np.arange(-max_order, max_order + 1)
    for ux in (0, 1):
        for uy in (0, 1):
            for uz in (0, 1):
                u = np.array([ux, uy, uz])
                # mirrored source position per axis
                base = (1 - 2 * u) * src
                # iterate x-order in chunks, vectorize (y, z) grids
                my, mz = np.meshgrid(orders, orders, indexing="ij")
                my = my.ravel()
                mz = mz.ravel()
                for mx in orders:
                    pos_x = base[0] + 2 * mx * room[0]
                    dx = pos_x - mic[0]
                    pos_y = base[1] + 2 * my * room[1]
                    pos_z = base[2] + 2 * mz * room[2]
                    d = np.sqrt(
                        dx * dx
                        + (pos_y - mic[1]) ** 2
                        + (pos_z - mic[2]) ** 2
                    )
                    n_refl = (
                        abs(mx - ux)
                        + abs(mx)
                        + np.abs(my - uy)
                        + np.abs(my)
                        + np.abs(mz - uz)
                        + np.abs(mz)
                    )
                    # max_order bounds the TOTAL reflection count
                    # (pyroomacoustics semantics): order 0 is the
                    # direct path only.
                    keep = (d <= max_dist) & (n_refl <= max_order)
                    if not keep.any():
                        continue
                    d = np.maximum(d[keep], 1e-2)
                    n_refl = n_refl[keep]
                    amp = (beta ** n_refl) / (4.0 * np.pi * d)
                    delay = d / C_SOUND * fs
                    lo = np.floor(delay).astype(int)
                    frac = delay - lo
                    ok = lo < max_len
                    np.add.at(rir, lo[ok], amp[ok] * (1 - frac[ok]))
                    np.add.at(rir, lo[ok] + 1, amp[ok] * frac[ok])
    return rir[:max_len].astype(np.float32)


class WhamRoom:
    """Two sources, a mic pair, and a T60 — the WHAMR room geometry."""

    def __init__(self, p, mics, s1, s2, T60, fs=16000):
        self.p = np.asarray(p, float)
        self.mics = [np.asarray(m, float) for m in mics]
        self.sources = [np.asarray(s1, float), np.asarray(s2, float)]
        self.T60 = float(T60)
        self.fs = fs
        self.max_rir_len = int(np.ceil(self.T60 * fs))
        volume = float(np.prod(self.p))
        surface = 2 * (
            p[0] * p[1] + p[0] * p[2] + p[1] * p[2]
        )
        absorption = (
            24.0 * volume * np.log(10.0) / (C_SOUND * surface * self.T60)
        )
        self.beta = float(np.sqrt(max(0.0, 1.0 - absorption)))
        self.max_order = int(
            np.ceil(self.T60 * C_SOUND / float(np.min(self.p)))
        )
        self.rir_anechoic = None
        self.rir_reverberant = None

    def _compute(self, max_order):
        out = []
        for mic in self.mics:
            row = []
            for src in self.sources:
                row.append(
                    _shoebox_rir(
                        self.p, src, mic, self.beta, max_order,
                        self.fs, self.max_rir_len,
                    )
                )
            out.append(row)
        return out

    def generate_rirs(self):
        """Fill rir_anechoic (order 0) and rir_reverberant."""
        self.rir_anechoic = self._compute(0)
        self.rir_reverberant = self._compute(self.max_order)
