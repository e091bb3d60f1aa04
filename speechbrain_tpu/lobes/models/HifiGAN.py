"""HiFi-GAN vocoder: generator + discriminators + training losses.

Parity target: reference ``lobes/models/HifiGAN.py:299`` (HifiganGenerator),
``:701`` (discriminators), ``:1104,1212`` (generator/discriminator losses).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d

__all__ = [
    "ResBlock1",
    "HifiganGenerator",
    "DiscriminatorP",
    "MultiPeriodDiscriminator",
    "DiscriminatorS",
    "MultiScaleDiscriminator",
    "GeneratorLoss",
    "DiscriminatorLoss",
    "mel_spectogram_l1",
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
                y = ResBlock1(
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
