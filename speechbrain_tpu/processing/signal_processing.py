"""Low-level signal ops: amplitude, convolution, reverb, overlap-add.

All jnp, static shapes, differentiable.  Parity targets: reference
``processing/signal_processing.py:16,70,107,157,280,373,433``.
"""

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_amplitude",
    "normalize",
    "rescale",
    "convolve1d",
    "reverberate",
    "notch_filter",
    "overlap_and_add",
    "dB_to_amplitude",
    "resynthesize",
    "gabor_impulse_response",
    "gabor_impulse_response_legacy_complex",
]


def compute_amplitude(waveforms, lengths=None, amp_type="avg", scale="linear"):
    """Average or peak amplitude per waveform (batch, time[, ch]).

    ``lengths`` are ABSOLUTE sample counts (batch, 1).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> wav = jnp.ones((1, 100))
    >>> float(compute_amplitude(wav)[0, 0])
    1.0
    """
    waveforms = jnp.asarray(waveforms)
    squeeze = waveforms.ndim == 1
    if squeeze:
        waveforms = waveforms[None]
    abs_wav = jnp.abs(waveforms)
    if amp_type == "avg":
        if lengths is None:
            out = abs_wav.mean(axis=1, keepdims=True)
        else:
            T = waveforms.shape[1]
            mask = (
                jnp.arange(T)[None, :] < jnp.asarray(lengths).reshape(-1, 1)
            ).astype(waveforms.dtype)
            if waveforms.ndim == 3:
                mask = mask[..., None]
            out = (abs_wav * mask).sum(axis=1, keepdims=True) / jnp.maximum(
                jnp.asarray(lengths, waveforms.dtype).reshape(
                    (-1, 1) if waveforms.ndim == 2 else (-1, 1, 1)
                ),
                1.0,
            )
    elif amp_type == "peak":
        out = abs_wav.max(axis=1, keepdims=True)
    else:
        raise NotImplementedError(f"amp_type {amp_type}")
    if scale == "linear":
        pass
    elif scale == "dB":
        out = jnp.clip(20 * jnp.log10(jnp.maximum(out, 1e-10)), a_min=-80)
    else:
        raise NotImplementedError(f"scale {scale}")
    return out[0] if squeeze else out


def normalize(waveforms, lengths=None, amp_type="avg", eps=1e-14):
    """Scale to unit average or peak amplitude."""
    waveforms = jnp.asarray(waveforms)
    den = compute_amplitude(waveforms, lengths, amp_type) + eps
    return waveforms / den


def rescale(waveforms, lengths, target_lvl, amp_type="avg", scale="linear"):
    """Normalize then scale to a target level (linear gain or dB)."""
    waveforms = jnp.asarray(waveforms)
    out = normalize(waveforms, lengths, amp_type)
    if scale == "linear":
        out = target_lvl * out
    elif scale == "dB":
        out = dB_to_amplitude(target_lvl) * out
    else:
        raise NotImplementedError("Invalid scale, choose between dB and linear")
    return out


def dB_to_amplitude(SNR):
    """10^(dB/20).

    Example
    -------
    >>> dB_to_amplitude(0)
    1.0
    """
    return 10 ** (SNR / 20)


def convolve1d(waveform, kernel, padding=0, pad_type="constant", stride=1, use_fft=False, rotation_index=0):
    """Batched 1-d convolution (correlation) along time.

    waveform: (batch, time, channels); kernel: (batch or 1, k, channels)
    broadcast per channel.  ``use_fft`` does circular FFT convolution
    with ``rotation_index`` shifting the kernel origin (used by
    reverberate for delay compensation).
    """
    waveform = jnp.asarray(waveform)
    kernel = jnp.asarray(kernel)
    if isinstance(padding, (list, tuple)):
        waveform = jnp.pad(
            waveform, ((0, 0), (padding[0], padding[1]), (0, 0)),
            mode=pad_type if pad_type != "constant" else "constant",
        )
    elif isinstance(padding, int) and padding > 0:
        waveform = jnp.pad(
            waveform, ((0, 0), (padding, padding), (0, 0)),
            mode=pad_type if pad_type != "constant" else "constant",
        )
    if use_fft:
        n = waveform.shape[1]
        k = kernel.shape[1]
        if k > n:
            kernel = kernel[:, : n]
            k = n
        # Reference layout (signal_processing.py:236-242): the kernel's
        # pre-rotation part wraps to the END of the n-length buffer
        # (negative time in the circular convolution); zeros sit in the
        # middle: [kernel[rot:], zeros, kernel[:rot]].
        zeros = jnp.zeros(
            (kernel.shape[0], n - k, kernel.shape[2]), kernel.dtype
        )
        kernel = jnp.concatenate(
            [kernel[:, rotation_index:], zeros, kernel[:, :rotation_index]],
            axis=1,
        )
        f1 = jnp.fft.rfft(waveform, axis=1)
        f2 = jnp.fft.rfft(kernel, axis=1)
        out = jnp.fft.irfft(f1 * f2, n=n, axis=1)
        return out
    # Direct correlation via strided frame gather + einsum.
    b, t, c = waveform.shape
    k = kernel.shape[1]
    n_frames = (t - k) // stride + 1
    starts = jnp.arange(n_frames) * stride
    idx = starts[:, None] + jnp.arange(k)[None, :]
    frames = waveform[:, idx, :]  # (b, n_frames, k, c)
    if kernel.shape[0] == 1:
        out = jnp.einsum("bnkc,zkc->bnc", frames, kernel)
    else:
        out = jnp.einsum("bnkc,bkc->bnc", frames, kernel)
    return out


def reverberate(waveforms, rir_waveform, rescale_amp="avg"):
    """Convolve with a room impulse response, compensating direct-path
    delay and preserving amplitude.

    waveforms: (batch, time) or (batch, time, 1); rir: (time,) or
    (1, time) etc.
    """
    waveforms = jnp.asarray(waveforms)
    rir_waveform = jnp.asarray(rir_waveform)
    orig_ndim = waveforms.ndim
    if waveforms.ndim == 1:
        waveforms = waveforms[None, :, None]
    elif waveforms.ndim == 2:
        waveforms = waveforms[..., None]
    if rir_waveform.ndim == 1:
        rir_waveform = rir_waveform[None, :, None]
    elif rir_waveform.ndim == 2:
        rir_waveform = rir_waveform[..., None]
    orig_amplitude = compute_amplitude(
        waveforms.squeeze(-1), None, rescale_amp
    )
    # Direct-path delay: index of RIR peak; flip the RIR if the peak is
    # negative (reference signal_processing.py:330-332)
    direct_index = jnp.argmax(jnp.abs(rir_waveform), axis=1).reshape(-1)[0]
    peak = jnp.take_along_axis(
        rir_waveform,
        direct_index.reshape(1, 1, 1).astype(jnp.int32),
        axis=1,
    )
    rir_waveform = jnp.where(peak < 0, -rir_waveform, rir_waveform)
    waveforms = convolve1d(
        waveform=waveforms,
        kernel=rir_waveform,
        use_fft=True,
        rotation_index=direct_index,
    )
    new_amp = compute_amplitude(waveforms.squeeze(-1), None, rescale_amp)
    waveforms = waveforms * (
        orig_amplitude / jnp.maximum(new_amp, 1e-14)
    )[..., None]
    if orig_ndim == 1:
        return waveforms[0, :, 0]
    if orig_ndim == 2:
        return waveforms[..., 0]
    return waveforms


def notch_filter(notch_freq, filter_width=101, notch_width=0.05):
    """A notch-filter kernel (1, width, 1) at the given normalized freq.

    Built as lowpass + highpass sinc filters (reference
    ``signal_processing.py:373``).
    """
    pad = filter_width // 2
    inputs = jnp.arange(filter_width) - pad
    notch_freq = notch_freq + notch_width

    def sinc(x):
        # Trace-safe sinc: notch_freq may be a jit tracer (DropFreq
        # samples it per step); guard the x=0 singularity with where.
        safe = jnp.where(x == 0, 1.0, x)
        return jnp.where(x == 0, 1.0, jnp.sin(safe) / safe)

    # torch.blackman_window defaults to the PERIODIC window
    # (= symmetric window of N+1 points, last dropped)
    window = jnp.asarray(np.blackman(filter_width + 1)[:-1])
    hlpf = sinc(3 * (notch_freq - notch_width) * inputs)
    hlpf = hlpf * window
    hlpf = hlpf / hlpf.sum()
    hhpf = sinc(3 * (notch_freq + notch_width) * inputs)
    hhpf = hhpf * window
    hhpf = hhpf / -hhpf.sum()
    hhpf = hhpf.at[pad].add(1.0)
    kernel = (hlpf + hhpf).astype(jnp.float32)
    return kernel.reshape(1, -1, 1)


def overlap_and_add(signal, frame_step):
    """(…, frames, frame_length) -> (…, time) overlap-added.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.ones((1, 3, 4))
    >>> overlap_and_add(x, 2).shape
    (1, 8)
    """
    signal = jnp.asarray(signal)
    lead_dims = signal.shape[:-2]
    frames, frame_length = signal.shape[-2:]
    flat = signal.reshape((-1, frames, frame_length))
    time = (frames - 1) * frame_step + frame_length
    idx = (
        jnp.arange(frames)[:, None] * frame_step
        + jnp.arange(frame_length)[None, :]
    ).reshape(-1)
    out = jnp.zeros((flat.shape[0], time), dtype=signal.dtype)
    out = out.at[:, idx].add(flat.reshape(flat.shape[0], -1))
    return out.reshape(lead_dims + (time,))


def resynthesize(enhanced_mag, noisy_inputs, stft, istft, normalize_wavs=True):
    """Resynthesize waveforms: enhanced magnitude + noisy phase -> iSTFT.

    Parity target: reference ``processing/signal_processing.py:486``.

    Arguments
    ---------
    enhanced_mag : (batch, frames, freq) predicted spectral magnitude.
    noisy_inputs : (batch, time) noisy waveforms (phase source).
    stft, istft : STFT/ISTFT callables from ``processing.features``.
    normalize_wavs : bool — peak-normalize outputs.
    """
    noisy_feats = stft(noisy_inputs)
    noisy_phase = jnp.arctan2(
        noisy_feats[..., 1], noisy_feats[..., 0]
    )  # (B, frames, freq)
    frames = min(enhanced_mag.shape[1], noisy_phase.shape[1])
    mag = enhanced_mag[:, :frames]
    phase = noisy_phase[:, :frames]
    complex_spec = jnp.stack(
        [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1
    )
    pred_wavs = istft(complex_spec, sig_length=noisy_inputs.shape[1])
    if normalize_wavs:
        abs_max = jnp.max(
            jnp.abs(pred_wavs), axis=1, keepdims=True
        )
        pred_wavs = pred_wavs / jnp.maximum(abs_max, 1.0)
    return pred_wavs


def gabor_impulse_response(t, center, fwhm):
    """Complex Gabor impulse responses for LEAF's ``GaborConv1d``
    (reference ``processing/signal_processing.py:534``; Zeghidour et
    al., ICLR 2021): ``(n_filters,) center/fwhm`` and ``(K,) t`` ->
    ``(n_filters, K)`` complex64 filters.
    """
    t = jnp.asarray(t, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    fwhm = jnp.asarray(fwhm, jnp.float32)
    denominator = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * fwhm)
    gaussian = jnp.exp(
        -(t[None, :] ** 2) / (2.0 * fwhm[:, None] ** 2)
    )
    sinusoid = jnp.exp(1j * center[:, None].astype(jnp.complex64) * t[None, :])
    return denominator[:, None].astype(jnp.complex64) * sinusoid * gaussian


def gabor_impulse_response_legacy_complex(t, center, fwhm):
    """Same filters as :func:`gabor_impulse_response` with the real and
    imaginary parts stacked on a trailing axis (``(n_filters, K, 2)``)
    instead of a complex dtype (reference :566 keeps this variant for
    backends without complex support).
    """
    t = jnp.asarray(t, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    fwhm = jnp.asarray(fwhm, jnp.float32)
    denominator = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * fwhm)
    gaussian = jnp.exp(-(t[None, :] ** 2) / (2.0 * fwhm[:, None] ** 2))
    phase = center[:, None] * t[None, :]
    envelope = denominator[:, None] * gaussian
    return jnp.stack(
        [envelope * jnp.cos(phase), envelope * jnp.sin(phase)], axis=-1
    )
