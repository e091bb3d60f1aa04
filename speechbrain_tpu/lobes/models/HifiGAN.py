"""HiFi-GAN vocoder: generator + discriminators + training losses.

Parity target: reference ``lobes/models/HifiGAN.py:299`` (HifiganGenerator),
``:701`` (discriminators), ``:1104,1212`` (generator/discriminator losses).
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d

__all__ = [
    "ResBlock1",
    "ResBlock2",
    "HifiganGenerator",
    "DiscriminatorP",
    "MultiPeriodDiscriminator",
    "DiscriminatorS",
    "MultiScaleDiscriminator",
    "HifiganDiscriminator",
    "GeneratorLoss",
    "DiscriminatorLoss",
    "mel_spectogram_l1",
    "dynamic_range_compression",
    "mel_spectogram",
    "stft",
    "STFTLoss",
    "MultiScaleSTFTLoss",
    "L1SpecLoss",
    "MSEGLoss",
    "MelganFeatureLoss",
    "MSEDLoss",
]


class ResBlock1(nn.Module):
    """MRF residual block: dilated conv pairs with leaky relu."""

    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = jax.nn.leaky_relu(x, 0.1)
            y = Conv1d(
                out_channels=self.channels,
                kernel_size=self.kernel_size,
                dilation=d,
                name=f"conv1_{i}",
            )(y)
            y = jax.nn.leaky_relu(y, 0.1)
            y = Conv1d(
                out_channels=self.channels,
                kernel_size=self.kernel_size,
                name=f"conv2_{i}",
            )(y)
            x = x + y
        return x


class ResBlock2(nn.Module):
    """Residual block type 2: ONE dilated conv per step (reference
    ``lobes/models/HifiGAN.py:236``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = ResBlock2(channels=8, kernel_size=3, dilations=(1, 3))
    >>> x = jnp.ones((1, 16, 8))
    >>> v = blk.init(jax.random.PRNGKey(0), x)
    >>> blk.apply(v, x).shape
    (1, 16, 8)
    """

    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = jax.nn.leaky_relu(x, 0.1)
            y = Conv1d(
                out_channels=self.channels,
                kernel_size=self.kernel_size,
                dilation=d,
                name=f"conv_{i}",
            )(y)
            x = x + y
        return x


class HifiganGenerator(nn.Module):
    """mel (B, T, n_mel) -> waveform (B, T*prod(strides)).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> gen = HifiganGenerator(
    ...     upsample_initial_channel=32,
    ...     upsample_strides=(4, 4), upsample_kernels=(8, 8),
    ...     resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    >>> mel = jnp.ones((1, 20, 80))
    >>> v = gen.init(jax.random.PRNGKey(0), mel)
    >>> gen.apply(v, mel).shape
    (1, 320)
    """

    upsample_initial_channel: int = 512
    upsample_strides: tuple = (8, 8, 2, 2)
    upsample_kernels: tuple = (16, 16, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_type: str = "1"

    @nn.compact
    def __call__(self, mel):
        x = Conv1d(
            out_channels=self.upsample_initial_channel,
            kernel_size=7,
            name="conv_pre",
        )(mel)
        ch = self.upsample_initial_channel
        for i, (k, s) in enumerate(
            zip(self.upsample_kernels, self.upsample_strides)
        ):
            ch = ch // 2
            x = jax.nn.leaky_relu(x, 0.1)
            x = ConvTranspose1d(
                out_channels=ch,
                kernel_size=k,
                stride=s,
                padding=(k - s) // 2,
                name=f"up_{i}",
            )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(
                    self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes,
                )
            ):
                res_cls = (
                    ResBlock1 if self.resblock_type == "1" else ResBlock2
                )
                y = res_cls(
                    channels=ch, kernel_size=rk, dilations=rd,
                    name=f"res_{i}_{j}",
                )(x)
                acc = y if acc is None else acc + y
            x = acc / len(self.resblock_kernel_sizes)
        x = jax.nn.leaky_relu(x, 0.1)
        x = Conv1d(out_channels=1, kernel_size=7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class DiscriminatorP(nn.Module):
    """Period discriminator: fold waveform by period, 2d convs."""

    period: int

    @nn.compact
    def __call__(self, x):
        B, T = x.shape[0], x.shape[1]
        pad = (self.period - T % self.period) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)))
        x = x.reshape(B, -1, self.period, 1)
        feats = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(
                features=ch, kernel_size=(5, 1), strides=(3, 1),
                dtype=x.dtype, name=f"conv_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, 0.1)
            feats.append(x)
        x = nn.Conv(features=1, kernel_size=(3, 1), name="conv_post")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    """HiFiGAN multi-period discriminator ensemble."""
    periods: tuple = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for p in self.periods:
            s, f = DiscriminatorP(period=p, name=f"disc_p{p}")(x)
            scores.append(s)
            feats.append(f)
        return scores, feats


class DiscriminatorS(nn.Module):
    """Scale discriminator: strided 1d convs on (pooled) waveform."""

    pool: int = 1

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        y = x[..., None]
        if self.pool > 1:
            y = nn.avg_pool(
                y, window_shape=(self.pool * 2,),
                strides=(self.pool,), padding="SAME",
            )
        feats = []
        for i, (ch, k, s, g) in enumerate(
            [
                (128, 15, 1, 1),
                (128, 41, 2, 4),
                (256, 41, 2, 16),
                (512, 41, 4, 16),
                (1024, 41, 4, 16),
            ]
        ):
            y = nn.Conv(
                features=ch, kernel_size=(k,), strides=(s,),
                feature_group_count=g, dtype=y.dtype, name=f"conv_{i}",
            )(y)
            y = jax.nn.leaky_relu(y, 0.1)
            feats.append(y)
        y = nn.Conv(features=1, kernel_size=(3,), name="conv_post")(y)
        feats.append(y)
        return y.reshape(B, -1), feats


class MultiScaleDiscriminator(nn.Module):
    """HiFiGAN multi-scale discriminator ensemble."""
    pools: tuple = (1, 2, 4)

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for p in self.pools:
            s, f = DiscriminatorS(pool=p, name=f"disc_s{p}")(x)
            scores.append(s)
            feats.append(f)
        return scores, feats


class HifiganDiscriminator(nn.Module):
    """MPD + MSD wrapper: returns concatenated score and feature lists
    (reference ``lobes/models/HifiGAN.py:701``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> disc = HifiganDiscriminator()
    >>> x = jnp.ones((1, 4096))
    >>> v = disc.init(jax.random.PRNGKey(0), x)
    >>> scores, feats = disc.apply(v, x)
    >>> len(scores), len(feats)
    (8, 8)
    """

    @nn.compact
    def __call__(self, x):
        scores, feats = MultiPeriodDiscriminator(name="mpd")(x)
        scores_s, feats_s = MultiScaleDiscriminator(name="msd")(x)
        return scores + scores_s, feats + feats_s


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    """log-compression of a (mel) spectrogram (reference
    ``lobes/models/HifiGAN.py:44``)."""
    return jnp.log(jnp.maximum(x, clip_val) * C)


def _hz_to_mel_slaney(hz):
    """Slaney mel scale: linear below 1 kHz, log above."""
    hz = np.asarray(hz, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        hz >= min_log_hz,
        min_log_mel + np.log(np.maximum(hz, min_log_hz) / min_log_hz) / logstep,
        hz / f_sp,
    )


def _mel_to_hz_slaney(mel):
    mel = np.asarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mel >= min_log_mel,
        min_log_hz * np.exp(logstep * (mel - min_log_mel)),
        mel * f_sp,
    )


@functools.lru_cache(maxsize=16)
def _mel_matrix(
    sample_rate, n_fft, n_mels, f_min, f_max, norm, mel_scale
):
    """(n_stft, n_mels) mel filter matrix, torchaudio-compatible
    (htk or slaney scale, optional slaney area normalization)."""
    if mel_scale == "htk":
        mel_pts = np.linspace(
            2595.0 * np.log10(1 + f_min / 700.0),
            2595.0 * np.log10(1 + f_max / 700.0),
            n_mels + 2,
        )
        hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    else:
        mel_pts = np.linspace(
            _hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2
        )
        hz_pts = _mel_to_hz_slaney(mel_pts)
    n_stft = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_stft)
    f_diff = hz_pts[1:] - hz_pts[:-1]
    slopes = hz_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb = fb * enorm[None, :]
    return jnp.asarray(fb.astype(np.float32))


def _stft_frames(x, n_fft, hop_length, win_length, window):
    """Centered (reflect-padded) framing + windowed rfft magnitude-
    components: returns complex (B, n_stft, frames)."""
    x = jnp.asarray(x)
    if x.ndim == 3:  # (B, 1, T)
        x = x[:, 0]
    if x.ndim == 1:
        x = x[None]
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    T = x.shape[1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(n_fft)[None, :]
    )
    frames = x[:, idx]  # (B, frames, n_fft)
    if window is not None:
        frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)  # (B, frames, n_stft)
    return jnp.swapaxes(spec, 1, 2)  # (B, n_stft, frames)


def stft(x, n_fft, hop_length, win_length, window_fn="hann_window"):
    """Magnitude spectrogram of short overlapping (rectangular)
    windows, matching the reference's bare ``torch.stft`` call
    (reference ``lobes/models/HifiGAN.py:740``: no window argument →
    rectangular window of ``n_fft``)."""
    spec = _stft_frames(x, n_fft, hop_length, win_length, None)
    return jnp.sqrt(
        jnp.maximum(spec.real**2 + spec.imag**2, 1e-8)
    )


def mel_spectogram(
    sample_rate,
    hop_length,
    win_length,
    n_fft,
    n_mels,
    f_min,
    f_max,
    power,
    normalized,
    norm,
    mel_scale,
    compression,
    audio,
):
    """Mel spectrogram of a raw waveform, torchaudio-semantics
    (hann window, centered/reflect padding), used to produce vocoder
    training targets (reference ``lobes/models/HifiGAN.py:50``).

    Returns (B, n_mels, frames); [sic] the reference spells it
    "spectogram".
    """
    window = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = _stft_frames(audio, n_fft, hop_length, win_length, window)
    mag = jnp.sqrt(jnp.maximum(spec.real**2 + spec.imag**2, 1e-9))
    if normalized:
        mag = mag / jnp.sqrt(jnp.sum(window**2))
    mag = mag**power
    fb = _mel_matrix(
        sample_rate, n_fft, n_mels, float(f_min), float(f_max),
        norm, mel_scale,
    )
    mel = jnp.einsum("bft,fm->bmt", mag, fb.astype(mag.dtype))
    if compression:
        mel = dynamic_range_compression(mel)
    return mel


class STFTLoss:
    """Single-resolution STFT loss: log-magnitude L1 + spectral
    convergence (ParallelWaveGAN; reference
    ``lobes/models/HifiGAN.py:750``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> loss = STFTLoss(128, 32, 128)
    >>> y = jax.random.normal(jax.random.PRNGKey(0), (2, 1000))
    >>> lm, lsc = loss(y, y)
    >>> float(lm), float(lsc)
    (0.0, 0.0)
    """

    def __init__(self, n_fft, hop_length, win_length):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length

    def __call__(self, y_hat, y):
        y_hat_M = stft(y_hat, self.n_fft, self.hop_length, self.win_length)
        y_M = stft(y, self.n_fft, self.hop_length, self.win_length)
        loss_mag = jnp.abs(jnp.log(y_M) - jnp.log(y_hat_M)).mean()
        loss_sc = jnp.linalg.norm(y_M - y_hat_M) / jnp.linalg.norm(y_M)
        return loss_mag, loss_sc


class MultiScaleSTFTLoss:
    """Multi-resolution STFT loss (reference
    ``lobes/models/HifiGAN.py:791``)."""

    def __init__(
        self,
        n_ffts=(1024, 2048, 512),
        hop_lengths=(120, 240, 50),
        win_lengths=(600, 1200, 240),
    ):
        self.loss_funcs = [
            STFTLoss(n, h, w)
            for n, h, w in zip(n_ffts, hop_lengths, win_lengths)
        ]

    def __call__(self, y_hat, y):
        N = len(self.loss_funcs)
        loss_sc = 0.0
        loss_mag = 0.0
        for f in self.loss_funcs:
            lm, lsc = f(y_hat, y)
            loss_mag += lm
            loss_sc += lsc
        return loss_mag / N, loss_sc / N


class L1SpecLoss:
    """L1 loss over mel spectrograms (HiFiGAN paper; reference
    ``lobes/models/HifiGAN.py:832``)."""

    def __init__(
        self,
        sample_rate=22050,
        hop_length=256,
        win_length=24,
        n_mel_channels=80,
        n_fft=1024,
        n_stft=1024 // 2 + 1,
        mel_fmin=0.0,
        mel_fmax=8000.0,
        mel_normalized=False,
        power=1.0,
        norm="slaney",
        mel_scale="slaney",
        dynamic_range_compression=True,
    ):
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.n_fft = n_fft
        self.mel_fmin = mel_fmin
        self.mel_fmax = mel_fmax
        self.mel_normalized = mel_normalized
        self.power = power
        self.norm = norm
        self.mel_scale = mel_scale
        self.dynamic_range_compression = dynamic_range_compression

    def __call__(self, y_hat, y):
        args = (
            self.sample_rate, self.hop_length, self.win_length,
            self.n_fft, self.n_mel_channels, self.mel_fmin,
            self.mel_fmax, self.power, self.mel_normalized, self.norm,
            self.mel_scale, self.dynamic_range_compression,
        )
        y_hat_M = mel_spectogram(*args, y_hat)
        y_M = mel_spectogram(*args, y)
        return jnp.abs(y_M - y_hat_M).mean()


class MSEGLoss:
    """LSGAN generator adversarial loss: push D(G(s)) → 1 (reference
    ``lobes/models/HifiGAN.py:945``)."""

    def __call__(self, score_fake):
        return ((score_fake - 1.0) ** 2).mean()


class MelganFeatureLoss:
    """Feature-matching L1 across discriminator layers (reference
    ``lobes/models/HifiGAN.py:966``)."""

    def __call__(self, fake_feats, real_feats):
        loss_feats = 0.0
        num_feats = 0
        for fake_list, real_list in zip(fake_feats, real_feats):
            for fake_feat, real_feat in zip(fake_list, real_list):
                loss_feats += jnp.abs(fake_feat - real_feat).mean()
                num_feats += 1
        return loss_feats / max(num_feats, 1)


class MSEDLoss:
    """LSGAN discriminator loss: real → 1, fake → 0 (reference
    ``lobes/models/HifiGAN.py:1003``)."""

    def __call__(self, score_fake, score_real):
        loss_real = ((score_real - 1.0) ** 2).mean()
        loss_fake = (score_fake**2).mean()
        return loss_real + loss_fake, loss_real, loss_fake


def _apply_G_adv_loss(scores_fake, loss_func):
    """Sum a generator adversarial loss over (multi-scale) score lists
    (reference ``lobes/models/HifiGAN.py:1039``)."""
    if isinstance(scores_fake, list):
        return sum(loss_func(s) for s in scores_fake)
    return loss_func(scores_fake)


def _apply_D_loss(scores_fake, scores_real, loss_func):
    """Sum a discriminator loss over (multi-scale) score lists
    (reference ``lobes/models/HifiGAN.py:1063``)."""
    if isinstance(scores_fake, list):
        loss = real_loss = fake_loss = 0.0
        for score_fake, score_real in zip(scores_fake, scores_real):
            total, real, fake = loss_func(score_fake, score_real)
            loss += total
            real_loss += real
            fake_loss += fake
        return loss, real_loss, fake_loss
    return loss_func(scores_fake, scores_real)


def mel_spectogram_l1(y_hat, y, mel_fn):
    """L1 between mel spectrograms of generated and real audio."""
    return jnp.abs(mel_fn(y_hat) - mel_fn(y)).mean()


class GeneratorLoss:
    """LSGAN generator loss + feature matching + mel L1.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> gl = GeneratorLoss()
    >>> scores = [jnp.ones((1, 5))]
    >>> feats_f = [[jnp.zeros((1, 4, 2))]]
    >>> feats_r = [[jnp.ones((1, 4, 2))]]
    >>> out = gl(scores, feats_f, feats_r)
    >>> round(float(out["g_adv"]), 1)
    0.0
    """

    def __init__(self, adv_weight=1.0, fm_weight=2.0, mel_weight=45.0):
        self.adv_weight = adv_weight
        self.fm_weight = fm_weight
        self.mel_weight = mel_weight

    def __call__(self, fake_scores, fake_feats, real_feats, mel_l1=0.0):
        g_adv = sum(
            ((1.0 - s) ** 2).mean() for s in fake_scores
        ) / max(len(fake_scores), 1)
        fm = 0.0
        n = 0
        for ff, fr in zip(fake_feats, real_feats):
            for a, b in zip(ff, fr):
                fm = fm + jnp.abs(a - b).mean()
                n += 1
        fm = fm / max(n, 1)
        total = (
            self.adv_weight * g_adv
            + self.fm_weight * fm
            + self.mel_weight * mel_l1
        )
        return {
            "loss": total,
            "g_adv": g_adv,
            "feature_match": fm,
            "mel_l1": mel_l1,
        }


class DiscriminatorLoss:
    """LSGAN discriminator loss.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> dl = DiscriminatorLoss()
    >>> out = dl([jnp.ones((1, 4))], [jnp.zeros((1, 4))])
    >>> round(float(out["loss"]), 1)
    0.0
    """

    def __call__(self, real_scores, fake_scores):
        loss = 0.0
        for r, f in zip(real_scores, fake_scores):
            loss = loss + ((1.0 - r) ** 2).mean() + (f ** 2).mean()
        loss = loss / max(len(real_scores), 1)
        return {"loss": loss}
