"""Differentiable feature extraction: STFT, filterbanks, DCT, deltas.

TPU-first design notes (vs reference ``processing/features.py``):

- The filterbank projection is a single (freq x mels) matmul — MXU work,
  fused by XLA with the surrounding elementwise chain.
- All transforms are pure functions of their inputs + static config, so
  the whole frontend inlines into the jitted train step: no host<->device
  hops between STFT and the model.
- ``InputNormalization`` keeps its running statistics as an explicit
  state pytree threaded through the step (reference keeps mutable module
  state, ``processing/features.py:941``), which also makes cross-replica
  psum of statistics possible under data parallelism.

Classes are callables with static hyperparameters: safe to close over in
jit (they hash by config), mirroring the reference's module surface.

Example
-------
>>> import numpy as np
>>> stft = STFT(sample_rate=16000, win_length=25, hop_length=10, n_fft=400)
>>> wav = np.zeros((2, 16000), dtype=np.float32)
>>> stft(wav).shape
(2, 101, 201, 2)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "STFT",
    "ISTFT",
    "spectral_magnitude",
    "Filterbank",
    "DCT",
    "Deltas",
    "ContextWindow",
    "InputNormalization",
    "GlobalNormState",
]


def _ms_to_samples(sample_rate, duration_ms):
    return int(round(sample_rate * duration_ms / 1000.0))


class STFT:
    """Short-time Fourier transform returning (batch, frames, freq, 2).

    The last dim holds [real, imag] (reference torch.stft convention,
    ``processing/features.py:50``).

    Arguments
    ---------
    sample_rate : int
    win_length, hop_length : float
        In MILLISECONDS (reference convention).
    n_fft : int
    window_type : "hamming" | "hann" | "blackman" | "rect"
    normalized_stft : bool
        Divide by sqrt(n_fft).
    center : bool
        Reflect-pad by n_fft//2 so frame t is centered on t*hop.
    onesided : bool
    """

    def __init__(
        self,
        sample_rate,
        win_length=25,
        hop_length=10,
        n_fft=400,
        window_type="hamming",
        normalized_stft=False,
        center=True,
        pad_mode="constant",
        onesided=True,
        backend="auto",
        mxu_dtype=None,
    ):
        self.sample_rate = sample_rate
        self.win_length = _ms_to_samples(sample_rate, win_length)
        self.hop_length = _ms_to_samples(sample_rate, hop_length)
        self.n_fft = n_fft
        self.normalized_stft = normalized_stft
        self.center = center
        self.pad_mode = pad_mode
        self.onesided = onesided
        # Optional reduced-precision MXU path for the fused-conv DFT:
        # "bfloat16" runs the conv multiplies in bf16 with f32
        # accumulation (preferred_element_type) — ~4x MXU rate for a
        # ~2^-9 relative input rounding, invisible after log-mel
        # compression + input normalization.  None keeps the input
        # dtype end-to-end (bit-stable CPU tests / parity baselines).
        self.mxu_dtype = jnp.dtype(mxu_dtype) if mxu_dtype else None
        # "matmul" computes the DFT as a (n_fft, 2*(n_fft/2+1)) matmul:
        # for speech-sized n_fft this runs on the MXU and beats the FFT
        # op several-fold; "fft" keeps jnp.fft; "auto" picks matmul for
        # n_fft <= 1024 when onesided.
        if backend == "auto":
            backend = "matmul" if (n_fft <= 1024 and onesided) else "fft"
        self.backend = backend
        if self.backend == "matmul":
            k = np.arange(n_fft // 2 + 1)
            n = np.arange(n_fft)
            ang = -2.0 * np.pi * np.outer(n, k) / n_fft
            # HOST (numpy) constants, deliberately: module-held jnp
            # arrays become CAPTURED DEVICE BUFFERS of every jitted
            # program that closes over them, and on the dev tunnel one
            # such capture permanently degrades all later host<->device
            # transfers ~40x (900 -> 35 MB/s measured; PERFORMANCE.md
            # round 5).  numpy constants are inlined into the
            # executable at trace time instead.
            self._dft_re = np.cos(ang).astype(np.float32)
            self._dft_im = np.sin(ang).astype(np.float32)
        if self.win_length > n_fft:
            raise ValueError(
                f"win_length ({self.win_length} samples) must be <= n_fft "
                f"({n_fft}); lower win_length or raise n_fft"
            )
        window = _make_window(window_type, self.win_length)
        # Zero-pad window to n_fft, centered (torch.stft semantics).
        if self.win_length < n_fft:
            left = (n_fft - self.win_length) // 2
            pad = np.zeros(n_fft, dtype=np.float32)
            pad[left : left + self.win_length] = window
            window = pad
        # numpy, not jnp: see the _dft_re note above.
        self.window = np.asarray(window, np.float32)

    def __call__(self, x):
        """x: (batch, time) or (batch, time, channels)."""
        x = jnp.asarray(x)
        multi_channel = x.ndim == 3
        if multi_channel:
            batch, time, channels = x.shape
            x = jnp.moveaxis(x, 2, 1).reshape(batch * channels, time)
        if self.center:
            pad = self.n_fft // 2
            mode = "reflect" if self.pad_mode == "reflect" else "constant"
            x = jnp.pad(x, ((0, 0), (pad, pad)), mode=mode)
        if self.backend == "matmul" and self.onesided:
            # Fused framing + window + DFT as ONE big MXU matmul.
            # A strided single-channel convolution expresses the same
            # math, but XLA lowers C_in=1 large-stride convs as VPU
            # sliding fusions (measured 14x off the MXU: 746 us vs
            # ~52 us of matmul math for B=32 x 10 s).  Instead the
            # signal is cut into hop-sized chunks and each frame is
            # the concat of m = ceil(n_fft/hop) consecutive chunks
            # (kernel zero-padded to m*hop): frames (B, T, m*hop) @
            # kernel (m*hop, 2F) — identical products, MXU-shaped.
            F = self.n_fft // 2 + 1
            hop = self.hop_length
            kern = jnp.concatenate(
                [
                    self.window[:, None] * self._dft_re,
                    self.window[:, None] * self._dft_im,
                ],
                axis=1,
            )  # (n_fft, 2F)
            conv_dtype = self.mxu_dtype or x.dtype
            m = -(-self.n_fft // hop)
            Lk = m * hop
            xx = x
            if Lk > self.n_fft:
                # zero tail: multiplies only the kernel's zero pad
                xx = jnp.pad(x, ((0, 0), (0, Lk - self.n_fft)))
            nc = xx.shape[1] // hop
            chunks = xx[:, : nc * hop].reshape(x.shape[0], nc, hop)
            # Clamp for signals shorter than (m-1)*hop: conv VALID
            # semantics produce 0 frames, not negative slice stops.
            n_frames = max(nc - m + 1, 0)
            frames = jnp.concatenate(
                [chunks[:, j : j + n_frames] for j in range(m)],
                axis=-1,
            )  # (B, n_frames, m*hop)
            kern_pad = jnp.pad(
                kern, ((0, Lk - self.n_fft), (0, 0))
            )
            spec2 = jax.lax.dot_general(
                frames.astype(conv_dtype),
                kern_pad.astype(conv_dtype),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)  # (B, frames, 2F)
            real, imag = spec2[..., :F], spec2[..., F:]
            if self.normalized_stft:
                scale = 1.0 / math.sqrt(self.n_fft)
                real, imag = real * scale, imag * scale
            out = jnp.stack([real, imag], axis=-1)
        else:
            frames = _frame_signal(x, self.n_fft, self.hop_length)
            frames = frames * self.window[None, None, :]
            spec = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
            if not self.onesided:
                spec = jnp.fft.fft(frames, n=self.n_fft, axis=-1)
            if self.normalized_stft:
                spec = spec / math.sqrt(self.n_fft)
            out = jnp.stack([spec.real, spec.imag], axis=-1)
        if multi_channel:
            n_frames, n_freq = out.shape[1], out.shape[2]
            out = out.reshape(batch, channels, n_frames, n_freq, 2)
            # reference layout: (batch, frames, freq, 2, channels)
            out = jnp.transpose(out, (0, 2, 3, 4, 1))
        return out

    def get_filter_properties(self):
        """(sr, hop, n_fft) tuple describing this STFT."""
        return {
            "window_size": self.n_fft,
            "stride": self.hop_length,
            "sample_rate": self.sample_rate,
        }


def _make_window(window_type, length):
    n = np.arange(length, dtype=np.float64)
    if window_type == "hamming":
        # periodic window (torch.hamming_window(periodic=True))
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / length)
    elif window_type == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / length)
    elif window_type == "blackman":
        w = (
            0.42
            - 0.5 * np.cos(2 * np.pi * n / length)
            + 0.08 * np.cos(4 * np.pi * n / length)
        )
    elif window_type == "rect":
        w = np.ones(length)
    else:
        raise ValueError(f"Unknown window: {window_type}")
    return w.astype(np.float32)


def _frame_signal(x, frame_length, hop):
    """(batch, time) -> (batch, n_frames, frame_length).

    Uses XLA's strided patch extraction (lowered like a convolution) —
    an explicit index gather here costs ~5x more on TPU.
    """
    time = x.shape[1]
    n_frames = 1 + (time - frame_length) // hop
    patches = jax.lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return patches[:, :n_frames, :]


class ISTFT:
    """Inverse STFT via overlap-add with squared-window normalization.

    Parity target: reference ``processing/features.py:191``.
    """

    def __init__(
        self,
        sample_rate,
        win_length=25,
        hop_length=10,
        n_fft=None,
        window_type="hamming",
        normalized_stft=False,
        center=True,
        epsilon=1e-12,
    ):
        self.sample_rate = sample_rate
        self.win_length = _ms_to_samples(sample_rate, win_length)
        self.hop_length = _ms_to_samples(sample_rate, hop_length)
        self.center = center
        self.epsilon = epsilon
        self.normalized_stft = normalized_stft
        self.window_type = window_type
        self._n_fft = n_fft

    def __call__(self, x, sig_length=None):
        """x: (batch, frames, freq, 2) -> (batch, time)."""
        x = jnp.asarray(x)
        multi_channel = x.ndim == 5
        if multi_channel:
            batch, frames_n, freq, _, channels = x.shape
            x = jnp.moveaxis(x, -1, 1).reshape(
                batch * channels, frames_n, freq, 2
            )
        spec = x[..., 0] + 1j * x[..., 1]
        n_fft = self._n_fft or 2 * (spec.shape[-1] - 1)
        if self.normalized_stft:
            spec = spec * math.sqrt(n_fft)
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
        window = _make_window(self.window_type, self.win_length)
        if self.win_length < n_fft:
            left = (n_fft - self.win_length) // 2
            pad = np.zeros(n_fft, dtype=np.float32)
            pad[left : left + self.win_length] = window
            window = pad
        window = jnp.asarray(window)
        frames = frames * window[None, None, :]
        sig = _overlap_add(frames, self.hop_length)
        norm = _overlap_add(
            jnp.broadcast_to(
                (window ** 2)[None, None, :], frames.shape
            ),
            self.hop_length,
        )
        sig = sig / jnp.maximum(norm, self.epsilon)
        if self.center:
            pad = n_fft // 2
            sig = sig[:, pad:-pad] if pad else sig
        if sig_length is not None:
            sig = sig[:, :sig_length]
        if multi_channel:
            time = sig.shape[1]
            sig = sig.reshape(batch, channels, time)
            sig = jnp.moveaxis(sig, 1, 2)
        return sig


def _overlap_add(frames, hop):
    """(batch, n_frames, frame_len) -> (batch, time) summed at hop offsets."""
    batch, n_frames, frame_len = frames.shape
    time = (n_frames - 1) * hop + frame_len
    idx = (
        jnp.arange(n_frames)[:, None] * hop
        + jnp.arange(frame_len)[None, :]
    ).reshape(-1)
    flat = frames.reshape(batch, -1)
    out = jnp.zeros((batch, time), dtype=frames.dtype)
    return out.at[:, idx].add(flat)


def spectral_magnitude(stft, power=1, log=False, eps=1e-14):
    """Magnitude of a (…, 2) real-imag STFT, raised to ``power``.

    Reference convention (``processing/features.py:327``): the result is
    ``(re^2 + im^2) ** power`` — ``power=1`` is the POWER spectrogram,
    ``power=0.5`` the magnitude spectrogram.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.array([[[[3.0, 4.0]]]])
    >>> float(spectral_magnitude(x, power=0.5)[0, 0, 0])
    5.0
    """
    stft = jnp.asarray(stft)
    spectr = (stft ** 2).sum(-1)
    if power < 1:
        spectr = spectr + eps
    if power != 1:
        spectr = spectr ** power
    if log:
        return jnp.log(spectr + eps)
    return spectr


class Filterbank:
    """Mel-scale filterbank projection of a spectrogram (matmul on MXU).

    Arguments mirror the reference (``processing/features.py:359``):
    triangular/rectangular/gaussian bands, optional log compression with
    ``top_db`` clamping.  The filter matrix is precomputed (freq, n_mels)
    and can serve as the INITIAL value of a learnable parameter (see
    ``lobes.features.Fbank(freeze=False)``).
    """

    def __init__(
        self,
        n_mels=40,
        log_mel=True,
        filter_shape="triangular",
        f_min=0.0,
        f_max=8000.0,
        n_fft=400,
        sample_rate=16000,
        power_spectrogram=2,
        amin=1e-10,
        ref_value=1.0,
        top_db=80.0,
    ):
        self.n_mels = n_mels
        self.log_mel = log_mel
        self.n_fft = n_fft
        self.sample_rate = sample_rate
        self.power_spectrogram = power_spectrogram
        self.amin = amin
        self.ref_value = ref_value
        self.top_db = top_db
        self.n_stft = n_fft // 2 + 1
        self.db_multiplier = math.log10(max(self.amin, self.ref_value))
        if power_spectrogram == 2:
            self.multiplier = 10
        else:
            self.multiplier = 20
        # numpy, not jnp: a module-held device array would be captured
        # by every jitted consumer (see the STFT._dft_re note).
        self.filters = np.asarray(
            mel_filter_matrix(
                n_mels, f_min, f_max, self.n_stft, sample_rate, filter_shape
            )
        )

    def __call__(self, spectrogram):
        """(batch, frames, n_stft[, channels]) -> (batch, frames, n_mels…)."""
        spectrogram = jnp.asarray(spectrogram)
        multi_channel = spectrogram.ndim == 4
        if multi_channel:
            b, t, f, c = spectrogram.shape
            spectrogram = jnp.moveaxis(spectrogram, 3, 1).reshape(b * c, t, f)
        fbanks = jnp.matmul(
            spectrogram, self.filters.astype(spectrogram.dtype)
        )
        if self.log_mel:
            fbanks = self._amplitude_to_db(fbanks)
        if multi_channel:
            t2, m = fbanks.shape[1], fbanks.shape[2]
            fbanks = jnp.moveaxis(fbanks.reshape(b, c, t2, m), 1, 3)
        return fbanks

    def _amplitude_to_db(self, x):
        x_db = self.multiplier * jnp.log10(jnp.maximum(x, self.amin))
        x_db = x_db - self.multiplier * self.db_multiplier
        # Clamp to max - top_db, per utterance (batch element).
        new_x_db_max = (
            x_db.reshape(x_db.shape[0], -1).max(axis=1) - self.top_db
        )
        x_db = jnp.maximum(x_db, new_x_db_max[:, None, None])
        return x_db


def hz_to_mel(hz):
    """Hz to mel scale."""
    return 2595 * np.log10(1 + np.asarray(hz) / 700)


def mel_to_hz(mel):
    """Mel scale to Hz."""
    return 700 * (10 ** (np.asarray(mel) / 2595) - 1)


def mel_filter_matrix(
    n_mels, f_min, f_max, n_stft, sample_rate, filter_shape="triangular"
):
    """(n_stft, n_mels) filter matrix, numpy (precompute once)."""
    mel_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    band = hz_pts[1:] - hz_pts[:-1]
    f_central = hz_pts[1:-1]
    all_freqs = np.linspace(0, sample_rate // 2, n_stft)
    slope = (all_freqs[:, None] - f_central[None, :]) / band[:-1][None, :]
    if filter_shape == "triangular":
        left = slope + 1.0
        right = -slope + 1.0
        fbank = np.maximum(0.0, np.minimum(left, right))
    elif filter_shape == "rectangular":
        # inclusive bounds (reference: all_freqs.ge(low) & .le(high))
        fbank = ((slope >= -1) & (slope <= 1)).astype(np.float64)
    elif filter_shape == "gaussian":
        fbank = np.exp(-0.5 * (slope / 0.5) ** 2)
    else:
        raise ValueError(f"Unknown filter shape: {filter_shape}")
    return fbank.astype(np.float32)


class DCT:
    """Type-II orthonormal DCT over the mel axis (MFCC), as a matmul.

    Parity target: reference ``processing/features.py:715``.
    """

    def __init__(self, input_size, n_out=20, ortho_norm=True):
        if n_out > input_size:
            raise ValueError("n_out cannot exceed input_size")
        n = np.arange(input_size, dtype=np.float64)
        k = np.arange(n_out, dtype=np.float64)
        mat = np.cos(np.pi / input_size * (n[:, None] + 0.5) * k[None, :])
        if ortho_norm:
            mat[:, 0] *= 1.0 / math.sqrt(input_size)
            mat[:, 1:] *= math.sqrt(2.0 / input_size)
        else:
            mat *= 2.0
        # numpy, not jnp (see the STFT._dft_re note).
        self.mat = mat.astype(np.float32)

    def __call__(self, x):
        """(batch, frames, n_mels[, channels]) -> (batch, frames, n_out…)."""
        x = jnp.asarray(x)
        multi = x.ndim == 4
        if multi:
            b, t, f, c = x.shape
            x = jnp.moveaxis(x, 3, 1).reshape(b * c, t, f)
        out = jnp.matmul(x, self.mat.astype(x.dtype))
        if multi:
            out = jnp.moveaxis(
                out.reshape(b, c, t, out.shape[-1]), 1, 3
            )
        return out


class Deltas:
    """Delta (derivative) features via a fixed depthwise conv kernel.

    Parity target: reference ``processing/features.py:789``.
    """

    def __init__(self, input_size=None, window_length=5):
        self.n = (window_length - 1) // 2
        self.denom = self.n * (self.n + 1) * (2 * self.n + 1) / 3
        kernel = np.arange(-self.n, self.n + 1, dtype=np.float32)
        # numpy, not jnp (see the STFT._dft_re note).
        self.kernel = np.asarray(kernel / self.denom, np.float32)

    def __call__(self, x):
        """(batch, frames, feats[, channels]) -> same shape deltas."""
        x = jnp.asarray(x)
        multi = x.ndim == 4
        if multi:
            b, t, f, c = x.shape
            x = jnp.moveaxis(x, 3, 1).reshape(b * c, t, f)
        # pad time with edge values, cross-correlate along time
        # (reference uses torch conv1d = cross-correlation, no kernel
        # flip: out[t] = sum_j x[t+j] * j / denom)
        xp = jnp.pad(x, ((0, 0), (self.n, self.n), (0, 0)), mode="edge")
        k = self.kernel
        out = sum(
            xp[:, i : i + x.shape[1], :] * k[i] for i in range(len(k))
        )
        if multi:
            out = jnp.moveaxis(out.reshape(b, c, t, f), 1, 3)
        return out


class ContextWindow:
    """Frame stacking: gather left/right context into the feature dim.

    Parity target: reference ``processing/features.py:855``.
    """

    def __init__(self, left_frames=0, right_frames=0):
        self.left_frames = left_frames
        self.right_frames = right_frames

    def __call__(self, x):
        """(batch, frames, feats[, ch]) -> (batch, frames, feats*(l+r+1)…)."""
        if self.left_frames == 0 and self.right_frames == 0:
            return jnp.asarray(x)
        x = jnp.asarray(x)
        multi = x.ndim == 4
        if multi:
            b, t, f, c = x.shape
            x = jnp.moveaxis(x, 3, 1).reshape(b * c, t, f)
        left, right = self.left_frames, self.right_frames
        # zero padding + feature-major interleaving: output channel
        # f*(l+r+1) + c holds x[t + c - l, f] (reference builds this
        # with a grouped conv eye-kernel, processing/features.py:889)
        xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        pieces = [
            xp[:, i : i + x.shape[1], :] for i in range(left + right + 1)
        ]
        out = jnp.stack(pieces, axis=-1)  # (B, T, F, C)
        out = out.reshape(out.shape[0], out.shape[1], -1)
        if multi:
            out = jnp.moveaxis(
                out.reshape(b, c, out.shape[1], out.shape[2]), 1, 3
            )
        return out


class GlobalNormState:
    """Running mean/std state for InputNormalization (a pytree).

    Mirrors the reference's ``glob_mean``/``glob_std``/``count``
    recoverables (``processing/features.py:991,1121``).
    """

    @staticmethod
    def init(dim):
        """Fresh accumulator state for the given feature dim."""
        return {
            "count": jnp.zeros((), jnp.float32),
            "mean": jnp.zeros((dim,), jnp.float32),
            "std": jnp.ones((dim,), jnp.float32),
        }


class InputNormalization:
    """Mean/variance normalization with sentence/batch/global modes.

    Functional state threading: ``__call__(x, lengths, state=None,
    epoch=0, training=True)`` returns ``y`` (and ``new_state`` when a
    state is passed).  Semantics mirror the reference exactly
    (``processing/features.py:941``): per-sentence stats over the
    unpadded frames with Bessel-corrected std; ``batch``/``global``
    modes average the per-sentence stats; ``global`` keeps a running
    average with weight ``1/(count+1)`` (or ``avg_factor``) per
    training batch, frozen after ``update_until_epoch``.  Under data
    parallelism the per-batch stats are pmean'd across replicas when
    inside shard_map/pjit (set ``axis_name``).
    """

    def __init__(
        self,
        mean_norm=True,
        std_norm=True,
        norm_type="global",
        update_until_epoch=3,
        avg_factor=None,
        avoid_padding_norm=True,
        epsilon=1e-10,
        axis_name=None,
    ):
        if norm_type not in ("sentence", "batch", "global", "speaker"):
            raise ValueError(f"Unknown norm_type {norm_type}")
        if norm_type == "speaker":
            # Per-speaker moving stats need host-side bookkeeping; the
            # global path is the supported TPU mode (see docs).
            raise NotImplementedError(
                "speaker norm_type: use global or sentence"
            )
        self.mean_norm = mean_norm
        self.std_norm = std_norm
        self.norm_type = norm_type
        self.update_until_epoch = update_until_epoch
        self.avg_factor = avg_factor
        self.avoid_padding_norm = avoid_padding_norm
        self.epsilon = epsilon
        self.axis_name = axis_name

    def _sentence_stats(self, x, lengths):
        """Per-sentence masked mean + Bessel-corrected std.

        Matches the reference's ``_compute_current_stats``
        (``processing/features.py:1120``): stats over the unpadded
        frames (``round(len * T)``), ``torch.std`` (ddof=1), std
        clamped to ``eps``.
        """
        T = x.shape[1]
        n = jnp.round(lengths * T)  # (B,)
        mask = (
            jnp.arange(T)[None, :] < n[:, None]
        ).astype(x.dtype)[..., None]
        denom = jnp.maximum(n, 1.0)[:, None]
        true_mean = (x * mask).sum(axis=1) / denom  # (B, F)
        # std is always computed around the true mean (torch.std), even
        # when mean_norm=False
        centered = (x - true_mean[:, None, :]) * mask
        ss = (centered ** 2).sum(axis=1)
        # max() floor avoids sqrt'(0)=inf NaN grads on constant rows
        std = jnp.sqrt(
            jnp.maximum(ss, 1e-20) / jnp.maximum(n - 1.0, 1.0)[:, None]
        )
        mean = true_mean if self.mean_norm else jnp.zeros_like(true_mean)
        if not self.std_norm:
            std = jnp.ones_like(std)
        std = jnp.maximum(std, self.epsilon)
        # the reference DETACHES the stats (.detach().data,
        # processing/features.py:1131): normalization is not
        # differentiated through mean/std
        return jax.lax.stop_gradient(mean), jax.lax.stop_gradient(std)

    def __call__(self, x, lengths, state=None, epoch=0, training=True):
        x = jnp.asarray(x)
        lengths = jnp.asarray(lengths)
        mean, std = self._sentence_stats(x, lengths)

        if self.norm_type == "sentence":
            y = (x - mean[:, None, :]) / std[:, None, :]
            return (y, state) if state is not None else y

        # batch/global: reference averages the PER-SENTENCE stats
        # (mean of means, mean of stds — processing/features.py:1083).
        cur_mean = mean.mean(axis=0)
        cur_std = std.mean(axis=0)
        if self.axis_name is not None:
            cur_mean = jax.lax.pmean(cur_mean, self.axis_name)
            cur_std = jax.lax.pmean(cur_std, self.axis_name)

        if self.norm_type == "batch":
            y = (x - cur_mean) / cur_std
            return (y, state) if state is not None else y

        # global: running average over batches with weight 1/(count+1),
        # initialized from the first batch, frozen after
        # update_until_epoch; count increments on every training batch
        # (processing/features.py:1086-1117).
        if state is None:
            raise ValueError("global norm requires a state pytree")
        training = jnp.asarray(training, jnp.float32)
        is_first = (state["count"] == 0).astype(jnp.float32)
        in_window = jnp.asarray(epoch < self.update_until_epoch, jnp.float32)
        if self.avg_factor is None:
            w = 1.0 / (state["count"] + 1.0)
        else:
            w = jnp.asarray(self.avg_factor, jnp.float32)
        # blend factor: 1 on the first training batch, w inside the
        # update window, 0 otherwise / at eval
        blend = training * jnp.where(is_first > 0, 1.0, in_window * w)
        new_mean = (1.0 - blend) * state["mean"] + blend * cur_mean
        new_std = (1.0 - blend) * state["std"] + blend * cur_std
        new_count = state["count"] + training
        new_state = {"count": new_count, "mean": new_mean, "std": new_std}
        y = (x - new_mean) / new_std
        return y, new_state
