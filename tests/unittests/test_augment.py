import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.lobes.augment import (
    EnvCorrupt,
    SpecAugment,
    TimeDomainSpecAugment,
)


def test_specaugment_masks_and_determinism():
    aug = SpecAugment(time_warp=False, n_freq_mask=2, n_time_mask=2)
    x = jnp.ones((2, 50, 40))
    key = jax.random.PRNGKey(0)
    out1 = aug(x, key)
    out2 = aug(x, key)
    assert np.allclose(np.asarray(out1), np.asarray(out2))  # same key
    assert float((np.asarray(out1) == 0).mean()) > 0.01  # masks applied
    out3 = aug(x, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_specaugment_time_warp_shape():
    aug = SpecAugment(
        time_warp=True, freq_mask=False, time_mask=False
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 60, 40))
    out = aug(x, jax.random.PRNGKey(1))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_time_domain_augment():
    aug = TimeDomainSpecAugment(sample_rate=16000)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 8000))
    out, lens = aug(wav, jnp.ones(2), jax.random.PRNGKey(1))
    assert out.shape == wav.shape
    assert np.all(np.asarray(lens) <= 1.0)
    assert np.isfinite(np.asarray(out)).all()


def test_env_corrupt_changes_signal():
    corrupt = EnvCorrupt(
        babble_speaker_count=2, babble_snr_low=5, babble_snr_high=10,
        noise_snr_low=10, noise_snr_high=15,
    )
    wav = jax.random.normal(jax.random.PRNGKey(2), (4, 4000))
    out = corrupt(wav, jnp.ones(4), jax.random.PRNGKey(0))
    assert out.shape == wav.shape
    assert not np.allclose(np.asarray(out), np.asarray(wav))
    # Signal power should still be in a sane range
    ratio = float(
        (np.asarray(out) ** 2).mean() / (np.asarray(wav) ** 2).mean()
    )
    assert 0.1 < ratio < 10.0


def test_augment_jits():
    aug = SpecAugment(time_warp=False)

    @jax.jit
    def step(x, key):
        return aug(x, key)

    out = step(jnp.ones((2, 30, 20)), jax.random.PRNGKey(0))
    assert out.shape == (2, 30, 20)
