"""Waveform-domain augmentation with XLA-static shapes and explicit PRNG.

Every augmentor is a pure function of (waveforms, lengths, key): random
VALUES vary per call, but shapes are static, so the augmentations inline
into the jitted train step (reference versions mutate tensor lengths,
``processing/speech_augmentation.py``).  Length changes (speed perturb)
keep the padded time dim and return updated relative lengths instead.

Parity targets: reference ``speech_augmentation.py:30`` (AddNoise),
``:295`` (AddReverb), ``:435`` (SpeedPerturb), ``:511`` (Resample),
``:824`` (AddBabble), ``:909`` (DropFreq), ``:1013`` (DropChunk),
``:1176`` (DoClip).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.processing.signal_processing import (
    compute_amplitude,
    convolve1d,
    dB_to_amplitude,
    notch_filter,
    reverberate,
)

__all__ = [
    "AddNoise",
    "AddReverb",
    "AddBabble",
    "SpeedPerturb",
    "Resample",
    "DropFreq",
    "DropChunk",
    "DoClip",
]


class AddNoise:
    """Mix noise at a random SNR per example.

    Noise comes from a host-side provider (callable returning a
    (batch, time) numpy/jnp array + lengths) or defaults to white noise.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> wav = jnp.ones((2, 100))
    >>> noisy = AddNoise(snr_low=20, snr_high=20)(
    ...     wav, jnp.ones(2), jax.random.PRNGKey(0))
    >>> noisy.shape
    (2, 100)
    """

    def __init__(
        self,
        csv_file=None,
        snr_low=0,
        snr_high=0,
        pad_noise=False,
        mix_prob=1.0,
        start_index=None,
        normalize=False,
        noise_provider=None,
    ):
        self.snr_low = snr_low
        self.snr_high = snr_high
        self.pad_noise = pad_noise
        self.mix_prob = mix_prob
        self.normalize = normalize
        self.noise_provider = noise_provider
        if csv_file is not None and noise_provider is None:
            self.noise_provider = CsvNoiseProvider(csv_file)

    def __call__(self, waveforms, lengths, key, noise_batch=None, noise_lens=None):
        waveforms = jnp.asarray(waveforms)
        lengths = jnp.asarray(lengths).reshape(-1, 1)
        k_prob, k_snr, k_noise, k_start = jax.random.split(key, 4)
        B, T = waveforms.shape[0], waveforms.shape[1]
        abs_lens = lengths * T
        noisy = waveforms

        clean_amp = compute_amplitude(waveforms, abs_lens)
        SNR = jax.random.uniform(
            k_snr, (B, 1), minval=self.snr_low, maxval=self.snr_high
        )
        noise_amp_factor = 1 / (dB_to_amplitude(SNR) + 1)
        new_noise_amp = noise_amp_factor * clean_amp
        noisy = noisy * (1 - noise_amp_factor)

        if noise_batch is None and self.noise_provider is not None:
            noise_batch, noise_lens = self.noise_provider(B, T, k_noise)
        if noise_batch is None:
            noise_batch = jax.random.normal(k_noise, waveforms.shape)
            noise_lens = jnp.ones(B)
        noise_batch = jnp.asarray(noise_batch)
        noise_abs = jnp.asarray(noise_lens).reshape(-1, 1) * noise_batch.shape[1]
        noise_amp = compute_amplitude(noise_batch, noise_abs)
        noise_batch = noise_batch * (
            new_noise_amp / jnp.maximum(noise_amp, 1e-14)
        )
        if noise_batch.shape[1] >= T:
            noise_batch = noise_batch[:, :T]
        else:
            reps = -(-T // noise_batch.shape[1])
            noise_batch = jnp.tile(noise_batch, (1, reps))[:, :T]
        noisy = noisy + noise_batch

        if self.normalize:
            abs_max = jnp.abs(noisy).max(axis=1, keepdims=True)
            noisy = noisy / jnp.maximum(abs_max, 1.0)
        # Per-example application probability.
        apply = (
            jax.random.uniform(k_prob, (B, 1)) < self.mix_prob
        ).astype(waveforms.dtype)
        return apply * noisy + (1 - apply) * waveforms


class CsvNoiseProvider:
    """Host-side noise pool loaded once from a CSV manifest."""

    def __init__(self, csv_file, max_noises=200):
        from speechbrain_tpu.dataio.dataio import load_data_csv, read_audio

        rows = load_data_csv(csv_file)
        self.noises = []
        for i, (nid, row) in enumerate(rows.items()):
            if i >= max_noises:
                break
            self.noises.append(np.asarray(read_audio(row["wav"])))

    def __call__(self, batch, time, key):
        idx = jax.random.randint(key, (batch,), 0, len(self.noises))
        idx = np.asarray(idx)
        out = np.zeros((batch, time), dtype=np.float32)
        lens = np.ones(batch, dtype=np.float32)
        for b in range(batch):
            n = self.noises[int(idx[b])]
            ln = min(len(n), time)
            out[b, :ln] = n[:ln]
            lens[b] = ln / time
        return jnp.asarray(out), jnp.asarray(lens)


class AddReverb:
    """Convolve with a randomly chosen room impulse response.

    RIRs come from a host-side provider or are passed explicitly.
    """

    def __init__(self, csv_file=None, reverb_prob=1.0, rir_scale_factor=1.0, rir_provider=None):
        self.reverb_prob = reverb_prob
        self.rir_scale_factor = rir_scale_factor
        self.rir_provider = rir_provider
        if csv_file is not None and rir_provider is None:
            self.rir_provider = CsvNoiseProvider(csv_file)

    def __call__(self, waveforms, lengths, key, rir=None):
        waveforms = jnp.asarray(waveforms)
        k_prob, k_rir = jax.random.split(key)
        B, T = waveforms.shape[0], waveforms.shape[1]
        if rir is None and self.rir_provider is not None:
            rir, _ = self.rir_provider(1, min(T, 16000), k_rir)
            rir = rir[0]
        if rir is None:
            return waveforms
        rir = jnp.asarray(rir)
        reverbed = reverberate(waveforms, rir)
        apply = (
            jax.random.uniform(k_prob, (B, 1)) < self.reverb_prob
        ).astype(waveforms.dtype)
        return apply * reverbed + (1 - apply) * waveforms


class AddBabble:
    """Simulate babble by mixing rolled batch neighbours at a random SNR.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> wav = jax.random.normal(jax.random.PRNGKey(1), (4, 100))
    >>> out = AddBabble(speaker_count=2)(wav, jnp.ones(4), jax.random.PRNGKey(0))
    >>> out.shape
    (4, 100)
    """

    def __init__(self, speaker_count=3, snr_low=0, snr_high=0, mix_prob=1.0):
        self.speaker_count = speaker_count
        self.snr_low = snr_low
        self.snr_high = snr_high
        self.mix_prob = mix_prob

    def __call__(self, waveforms, lengths, key):
        waveforms = jnp.asarray(waveforms)
        lengths = jnp.asarray(lengths).reshape(-1, 1)
        B, T = waveforms.shape[0], waveforms.shape[1]
        k_prob, k_snr = jax.random.split(key)
        abs_lens = lengths * T
        clean_amp = compute_amplitude(waveforms, abs_lens)
        SNR = jax.random.uniform(
            k_snr, (B, 1), minval=self.snr_low, maxval=self.snr_high
        )
        noise_amp_factor = 1 / (dB_to_amplitude(SNR) + 1)
        new_noise_amp = noise_amp_factor * clean_amp
        mixed = waveforms * (1 - noise_amp_factor)
        babble = jnp.roll(waveforms, 1, axis=0)
        for i in range(1, self.speaker_count):
            babble = babble + jnp.roll(waveforms, 1 + i, axis=0)
        babble_amp = compute_amplitude(babble, abs_lens)
        babble = babble * (new_noise_amp / jnp.maximum(babble_amp, 1e-14))
        mixed = mixed + babble
        apply = (
            jax.random.uniform(k_prob, (B, 1)) < self.mix_prob
        ).astype(waveforms.dtype)
        return apply * mixed + (1 - apply) * waveforms


class Resample:
    """Windowed-sinc polyphase resampling (jnp, static shapes).

    Output length is ``time * up // down`` after gcd reduction.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> r = Resample(orig_freq=16000, new_freq=8000)
    >>> r(jnp.ones((1, 1600))).shape
    (1, 800)
    """

    def __init__(self, orig_freq=16000, new_freq=16000, lowpass_filter_width=6):
        g = math.gcd(int(orig_freq), int(new_freq))
        self.up = int(new_freq) // g
        self.down = int(orig_freq) // g
        self.lowpass_filter_width = lowpass_filter_width
        self._build_kernel()

    def _build_kernel(self):
        """Reference-exact Kaldi-style weights (``speech_augmentation.py
        :758-823``): Hann-windowed sinc at ``0.99 * 0.5 * min_freq``
        cutoff, normalized by ``orig_freq``.  Weights repeat with period
        ``up`` output samples; we precompute one period (polyphase)."""
        up, down = self.up, self.down
        if up == down:
            self.kernel = None
            return
        # work in the reduced-rate units the phases repeat over
        orig_freq = float(down)
        new_freq = float(up)
        min_freq = min(orig_freq, new_freq)
        cutoff = 0.99 * 0.5 * min_freq
        window_width = self.lowpass_filter_width / (2.0 * cutoff)
        phases = np.arange(up, dtype=np.float64)
        t_out = phases / new_freq
        min_idx = np.ceil((t_out - window_width) * orig_freq)
        max_idx = np.floor((t_out + window_width) * orig_freq)
        max_w = int((max_idx - min_idx).max()) + 1
        j = np.arange(max_w, dtype=np.float64)
        input_index = min_idx[:, None] + j[None, :]
        delta_t = input_index / orig_freq - t_out[:, None]
        inside = np.abs(delta_t) < window_width
        win = np.where(
            inside,
            0.5
            * (
                1
                + np.cos(
                    2
                    * np.pi
                    * cutoff
                    / self.lowpass_filter_width
                    * delta_t
                )
            ),
            0.0,
        )
        sinc = np.where(
            delta_t == 0,
            2 * cutoff,
            np.sin(2 * np.pi * cutoff * delta_t)
            / (np.pi * np.where(delta_t == 0, 1.0, delta_t)),
        )
        weights = win * sinc / orig_freq
        self.width = max_w
        # numpy, not jnp: module-held device arrays get captured by
        # jitted consumers (see STFT._dft_re, processing/features.py).
        self.kernel = weights.astype(np.float32)  # (up, W)
        self.min_idx = min_idx.astype(np.int64)  # (up,), may be negative

    def __call__(self, waveforms):
        """(batch, time[, ch]) -> (batch, time*up//down[, ch])."""
        waveforms = jnp.asarray(waveforms)
        if self.kernel is None:
            return waveforms
        had_ch = waveforms.ndim == 3
        if had_ch:
            b, t, c = waveforms.shape
            waveforms = jnp.moveaxis(waveforms, 2, 1).reshape(b * c, t)
        B, T = waveforms.shape
        up, down, W = self.up, self.down, self.width
        t_out = int(np.ceil(T * up / down))
        n_blocks = -(-t_out // up)  # output blocks of `up` phases
        pad_left = int(max(0, -self.min_idx.min()))
        pad_right = n_blocks * down + W
        x = jnp.pad(waveforms, ((0, 0), (pad_left, pad_right)))
        # Output sample i*up + p starts at input i*down + min_idx[p].
        block_starts = jnp.arange(n_blocks) * down  # (n_blocks,)
        offs = jnp.asarray(self.min_idx + pad_left, jnp.int32)
        idx = (
            block_starts[:, None, None]
            + offs[None, :, None]
            + jnp.arange(W)[None, None, :]
        )  # (n_blocks, up, W)
        frames = x[:, idx]  # (B, n_blocks, up, W)
        out = jnp.einsum("bnpw,pw->bnp", frames, self.kernel)
        out = out.reshape(B, n_blocks * up)[:, :t_out]
        if had_ch:
            out = jnp.moveaxis(out.reshape(b, c, t_out), 1, 2)
        return out


class SpeedPerturb:
    """Random speed change by resampling, fixed output shape.

    One of ``speeds`` (percentages) is drawn per CALL (matching the
    reference's per-batch draw); the output keeps the input time dim —
    shorter results are zero-padded and relative lengths are rescaled.

    Returns (waveforms, new_lengths).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> sp = SpeedPerturb(16000, speeds=[90, 100, 110])
    >>> wav, lens = sp(jnp.ones((2, 1600)), jnp.ones(2), jax.random.PRNGKey(0))
    >>> wav.shape
    (2, 1600)
    """

    def __init__(self, orig_freq, speeds=[90, 100, 110], perturb_prob=1.0):
        self.orig_freq = orig_freq
        self.speeds = speeds
        self.perturb_prob = perturb_prob
        self.resamplers = [
            Resample(orig_freq, orig_freq * speed // 100) for speed in speeds
        ]

    def __call__(self, waveforms, lengths, key):
        waveforms = jnp.asarray(waveforms)
        lengths = jnp.asarray(lengths)
        B, T = waveforms.shape[0], waveforms.shape[1]
        k_prob, k_speed = jax.random.split(key)
        samp_index = jax.random.randint(k_speed, (), 0, len(self.speeds))

        outs = []
        lens_scales = []
        for resampler, speed in zip(self.resamplers, self.speeds):
            y = resampler(waveforms)
            t_new = y.shape[1]
            if t_new >= T:
                y = y[:, :T]
                scale = 1.0  # sped-down audio fills/overflows the window
            else:
                y = jnp.pad(y, ((0, 0), (0, T - t_new)))
                scale = t_new / T
            outs.append(y)
            # New relative length (clipped to 1).
            lens_scales.append(
                jnp.minimum(lengths * (100.0 / speed), 1.0)
                if speed != 100
                else lengths
            )
        stacked = jnp.stack(outs)  # (n_speeds, B, T)
        stacked_lens = jnp.stack(lens_scales)
        chosen = stacked[samp_index]
        chosen_lens = stacked_lens[samp_index]
        apply = (
            jax.random.uniform(k_prob, ()) < self.perturb_prob
        )
        out = jnp.where(apply, chosen, waveforms)
        out_lens = jnp.where(apply, chosen_lens, lengths)
        return out, out_lens


class DropFreq:
    """Notch-filter random frequencies (spectral dropout in time domain).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> out = DropFreq()(jnp.ones((2, 400)), jax.random.PRNGKey(0))
    >>> out.shape
    (2, 400)
    """

    def __init__(
        self,
        drop_freq_low=1e-14,
        drop_freq_high=1,
        drop_count_low=1,
        drop_count_high=2,
        drop_width=0.05,
        drop_prob=1,
    ):
        self.drop_freq_low = drop_freq_low
        self.drop_freq_high = drop_freq_high
        self.drop_count_low = drop_count_low
        self.drop_count_high = drop_count_high
        self.drop_width = drop_width
        self.drop_prob = drop_prob

    def __call__(self, waveforms, key):
        waveforms = jnp.asarray(waveforms)
        had_2d = waveforms.ndim == 2
        if had_2d:
            x = waveforms[..., None]
        else:
            x = waveforms
        k_prob, k_count, k_freq = jax.random.split(key, 3)
        # Static worst-case count; extras masked to passthrough.
        max_count = self.drop_count_high
        drop_count = jax.random.randint(
            k_count, (), self.drop_count_low, self.drop_count_high + 1
        )
        drop_range = self.drop_freq_high - self.drop_freq_low
        freqs = (
            jax.random.uniform(k_freq, (max_count,)) * drop_range
            + self.drop_freq_low
        )
        filter_length = 101
        pad = filter_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        # Build combined kernel: delta convolved with each active notch.
        kernel = jnp.zeros((1, filter_length, 1)).at[0, pad, 0].set(1.0)
        for i in range(max_count):
            nf = notch_filter(freqs[i], filter_length, self.drop_width)
            active = (i < drop_count).astype(x.dtype)
            effective = active * nf + (1 - active) * jnp.zeros(
                (1, filter_length, 1)
            ).at[0, pad, 0].set(1.0)
            kernel = convolve1d(
                kernel, effective, padding=pad
            )
        dropped = convolve1d(x, kernel, padding=0)[:, : waveforms.shape[1]]
        apply = (jax.random.uniform(k_prob, ()) < self.drop_prob).astype(
            x.dtype
        )
        out = apply * dropped + (1 - apply) * x[:, pad:-pad]
        return out[..., 0] if had_2d else out


class DropChunk:
    """Zero (or noise-fill) random time chunks per example.

    Static shapes: ``drop_count_high`` mask slots are always computed,
    inactive slots are no-ops.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> drop = DropChunk(drop_length_low=10, drop_length_high=20)
    >>> out = drop(jnp.ones((2, 200)), jnp.ones(2), jax.random.PRNGKey(0))
    >>> out.shape
    (2, 200)
    """

    def __init__(
        self,
        drop_length_low=100,
        drop_length_high=1000,
        drop_count_low=1,
        drop_count_high=10,
        drop_start=0,
        drop_end=None,
        drop_prob=1,
        noise_factor=0.0,
    ):
        self.drop_length_low = drop_length_low
        self.drop_length_high = drop_length_high
        self.drop_count_low = drop_count_low
        self.drop_count_high = drop_count_high
        self.drop_start = drop_start
        self.drop_end = drop_end
        self.drop_prob = drop_prob
        self.noise_factor = noise_factor

    def __call__(self, waveforms, lengths, key):
        waveforms = jnp.asarray(waveforms)
        lengths = jnp.asarray(lengths)
        B, T = waveforms.shape[0], waveforms.shape[1]
        abs_lens = (lengths * T).astype(jnp.int32)
        k_prob, k_count, k_len, k_start, k_noise = jax.random.split(key, 5)
        max_count = self.drop_count_high
        counts = jax.random.randint(
            k_count, (B,), self.drop_count_low, self.drop_count_high + 1
        )
        lens = jax.random.randint(
            k_len,
            (B, max_count),
            self.drop_length_low,
            self.drop_length_high + 1,
        )
        start_min = self.drop_start
        end = self.drop_end if self.drop_end is not None else T
        starts = jax.random.randint(
            k_start, (B, max_count), start_min, max(end, start_min + 1)
        )
        positions = jnp.arange(T)[None, None, :]
        active = (jnp.arange(max_count)[None, :] < counts[:, None])[..., None]
        in_chunk = (
            (positions >= starts[..., None])
            & (positions < (starts + lens)[..., None])
            & active
        )
        mask = in_chunk.any(axis=1)  # (B, T)
        if self.noise_factor == 0.0:
            dropped = jnp.where(mask, 0.0, waveforms)
        else:
            clean_amp = compute_amplitude(waveforms, abs_lens[:, None])
            noise_max = 2 * clean_amp * self.noise_factor
            noise = (
                jax.random.uniform(k_noise, waveforms.shape) * 2 - 1
            ) * noise_max
            dropped = jnp.where(mask, noise, waveforms)
        apply = (jax.random.uniform(k_prob, ()) < self.drop_prob).astype(
            waveforms.dtype
        )
        return apply * dropped + (1 - apply) * waveforms


class DoClip:
    """Random-threshold amplitude clipping.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> out = DoClip(clip_low=0.5, clip_high=0.5)(
    ...     jnp.array([[1.0, -1.0, 0.2]]), jax.random.PRNGKey(0))
    >>> [round(float(v), 2) for v in out[0]]
    [0.5, -0.5, 0.2]
    """

    def __init__(self, clip_low=0.5, clip_high=1.0, clip_prob=1.0):
        self.clip_low = clip_low
        self.clip_high = clip_high
        self.clip_prob = clip_prob

    def __call__(self, waveforms, key):
        waveforms = jnp.asarray(waveforms)
        k_prob, k_level = jax.random.split(key)
        B = waveforms.shape[0]
        level = jax.random.uniform(
            k_level, (B, 1), minval=self.clip_low, maxval=self.clip_high
        )
        clipped = jnp.clip(waveforms, -level, level)
        apply = (
            jax.random.uniform(k_prob, ()) < self.clip_prob
        ).astype(waveforms.dtype)
        return apply * clipped + (1 - apply) * waveforms
