"""Augmentation composites: SpecAugment, time-domain augment, env corrupt.

All pure functions of (input, lengths, PRNG key) with static shapes —
the random VALUES change per step, shapes never do, so these fuse into
the jitted train step (SURVEY.md §8.6 notes the reference internals).

Parity targets: reference ``lobes/augment.py:32`` (SpecAugment), ``:204``
(TimeDomainSpecAugment), ``:302`` (EnvCorrupt).
"""

import jax
import jax.numpy as jnp

from speechbrain_tpu.processing.speech_augmentation import (
    AddBabble,
    AddNoise,
    AddReverb,
    DropChunk,
    DropFreq,
    SpeedPerturb,
)

__all__ = ["SpecAugment", "TimeDomainSpecAugment", "EnvCorrupt"]


class SpecAugment:
    """Time warp + frequency masks + time masks on (B, T, F) features.

    Time warping uses a piecewise-linear index remap (the reference's
    bicubic two-segment resize, ``lobes/augment.py:117``, approximated
    with linear interpolation — the standard SpecAugment formulation).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> aug = SpecAugment(time_warp=False, n_freq_mask=2, n_time_mask=2)
    >>> out = aug(jnp.ones((2, 50, 40)), jax.random.PRNGKey(0))
    >>> out.shape
    (2, 50, 40)
    >>> bool((out == 0).any())
    True
    """

    def __init__(
        self,
        time_warp=True,
        time_warp_window=5,
        time_warp_mode="bicubic",
        freq_mask=True,
        n_freq_mask=2,
        time_mask=True,
        n_time_mask=2,
        replace_with_zero=True,
        freq_mask_width=(0, 20),
        time_mask_width=(0, 100),
    ):
        self.time_warp_flag = time_warp
        self.time_warp_window = time_warp_window
        self.freq_mask_flag = freq_mask
        self.n_freq_mask = n_freq_mask
        self.time_mask_flag = time_mask
        self.n_time_mask = n_time_mask
        self.replace_with_zero = replace_with_zero
        self.freq_mask_width = freq_mask_width
        self.time_mask_width = time_mask_width

    def __call__(self, x, key):
        x = jnp.asarray(x)
        k_warp, k_freq, k_time = jax.random.split(key, 3)
        if self.time_warp_flag:
            x = self.time_warp(x, k_warp)
        if self.freq_mask_flag:
            x = self.mask_along_axis(x, k_freq, axis=2)
        if self.time_mask_flag:
            x = self.mask_along_axis(x, k_time, axis=1)
        return x

    def time_warp(self, x, key):
        """SpecAugment time warping."""
        B, T, F = x.shape
        W = self.time_warp_window
        if T <= 2 * W:
            return x
        k_c, k_w = jax.random.split(key)
        c = jax.random.randint(k_c, (), W, T - W)
        w = c + jax.random.randint(k_w, (), -W, W + 1)
        # piecewise-linear remap: [0, c] -> [0, w], [c, T-1] -> [w, T-1]
        pos = jnp.arange(T).astype(jnp.float32)
        left = pos * c / jnp.maximum(w, 1)
        right = c + (pos - w) * (T - 1 - c) / jnp.maximum(T - 1 - w, 1)
        src = jnp.where(pos < w, left, right)
        src = jnp.clip(src, 0, T - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, T - 1)
        frac = (src - lo)[None, :, None]
        return x[:, lo, :] * (1 - frac) + x[:, hi, :] * frac

    def mask_along_axis(self, x, key, axis):
        """Zero random bands along the given axis."""
        B, T, F = x.shape
        D = T if axis == 1 else F
        n_mask = self.n_time_mask if axis == 1 else self.n_freq_mask
        width_range = (
            self.time_mask_width if axis == 1 else self.freq_mask_width
        )
        k_len, k_pos = jax.random.split(key)
        lens = jax.random.randint(
            k_len, (B, n_mask), width_range[0],
            max(width_range[1], width_range[0] + 1),
        )
        pos = jax.random.randint(
            k_pos, (B, n_mask), 0, max(1, D - width_range[1])
        )
        arange = jnp.arange(D)[None, None, :]
        mask = (
            (arange >= pos[..., None]) & (arange < (pos + lens)[..., None])
        ).any(axis=1)
        if self.replace_with_zero:
            fill = 0.0
        else:
            fill = x.mean()
        if axis == 1:
            return jnp.where(mask[:, :, None], fill, x)
        return jnp.where(mask[:, None, :], fill, x)


class TimeDomainSpecAugment:
    """Speed perturb -> drop freq -> drop chunk on raw waveforms.

    Returns (waveforms, updated_lengths).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> aug = TimeDomainSpecAugment(sample_rate=16000)
    >>> wav, lens = aug(jnp.ones((2, 8000)), jnp.ones(2),
    ...                 jax.random.PRNGKey(0))
    >>> wav.shape
    (2, 8000)
    """

    def __init__(
        self,
        perturb_prob=1.0,
        drop_freq_prob=1.0,
        drop_chunk_prob=1.0,
        speeds=[95, 100, 105],
        sample_rate=16000,
        drop_freq_count_low=0,
        drop_freq_count_high=3,
        drop_chunk_count_low=0,
        drop_chunk_count_high=5,
        drop_chunk_length_low=1000,
        drop_chunk_length_high=2000,
        drop_chunk_noise_factor=0,
    ):
        self.speed_perturb = SpeedPerturb(
            perturb_prob=perturb_prob,
            orig_freq=sample_rate,
            speeds=speeds,
        )
        self.drop_freq = DropFreq(
            drop_prob=drop_freq_prob,
            drop_count_low=drop_freq_count_low,
            drop_count_high=drop_freq_count_high,
        )
        self.drop_chunk = DropChunk(
            drop_prob=drop_chunk_prob,
            drop_count_low=drop_chunk_count_low,
            drop_count_high=drop_chunk_count_high,
            drop_length_low=drop_chunk_length_low,
            drop_length_high=drop_chunk_length_high,
            noise_factor=drop_chunk_noise_factor,
        )

    def __call__(self, waveforms, lengths, key):
        k1, k2, k3 = jax.random.split(key, 3)
        waveforms, lengths = self.speed_perturb(waveforms, lengths, k1)
        waveforms = self.drop_freq(waveforms, k2)
        waveforms = self.drop_chunk(waveforms, lengths, k3)
        return waveforms, lengths


class EnvCorrupt:
    """Reverb + babble + noise corruption.

    Noise/RIR pools come from providers (CSV manifests or arrays); the
    OpenRIR auto-download of the reference maps to recipe prep scripts.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> corrupt = EnvCorrupt(babble_speaker_count=2,
    ...                      noise_snr_low=10, noise_snr_high=15)
    >>> wav = jax.random.normal(jax.random.PRNGKey(1), (4, 8000))
    >>> out = corrupt(wav, jnp.ones(4), jax.random.PRNGKey(0))
    >>> out.shape
    (4, 8000)
    """

    def __init__(
        self,
        reverb_prob=1.0,
        babble_prob=1.0,
        noise_prob=1.0,
        noise_csv=None,
        reverb_csv=None,
        noise_num_workers=0,
        babble_speaker_count=0,
        babble_snr_low=0,
        babble_snr_high=0,
        noise_snr_low=0,
        noise_snr_high=0,
        rir_scale_factor=1.0,
        noise_provider=None,
        rir_provider=None,
    ):
        self.add_reverb = None
        self.add_babble = None
        self.add_noise = None
        if reverb_csv is not None or rir_provider is not None:
            self.add_reverb = AddReverb(
                reverb_prob=reverb_prob,
                csv_file=reverb_csv,
                rir_scale_factor=rir_scale_factor,
                rir_provider=rir_provider,
            )
        if babble_speaker_count > 0:
            self.add_babble = AddBabble(
                mix_prob=babble_prob,
                speaker_count=babble_speaker_count,
                snr_low=babble_snr_low,
                snr_high=babble_snr_high,
            )
        if noise_prob > 0:
            self.add_noise = AddNoise(
                mix_prob=noise_prob,
                csv_file=noise_csv,
                snr_low=noise_snr_low,
                snr_high=noise_snr_high,
                noise_provider=noise_provider,
            )

    def __call__(self, waveforms, lengths, key):
        k1, k2, k3 = jax.random.split(key, 3)
        if self.add_reverb is not None:
            waveforms = self.add_reverb(waveforms, lengths, k1)
        if self.add_babble is not None:
            waveforms = self.add_babble(waveforms, lengths, k2)
        if self.add_noise is not None:
            waveforms = self.add_noise(waveforms, lengths, k3)
        return waveforms
