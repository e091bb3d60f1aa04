"""MetricGAN-U lobe parity vs reference lobes/models/MetricGAN_U.py.

Transplanted weights + identical inputs through generator and
discriminator (spectral norm folded into the weights on both sides:
torch ``remove_spectral_norm`` bakes the current normalized weight, and
ours is instantiated with ``spec_norm=False``)."""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np

import jax
import jax.numpy as jnp


def t2j(t):
    return jnp.asarray(to_np(t))


def test_metricgan_u_generator_parity(ref, torch):
    from speechbrain.lobes.models.MetricGAN_U import (
        EnhancementGenerator as Ref,
    )
    from speechbrain_tpu.lobes.models.MetricGAN_U import (
        EnhancementGenerator as Ours,
    )

    F, H, LD = 12, 8, 16
    theirs_mod = Ref(
        input_size=F, hidden_size=H, num_layers=1, lin_dim=LD, dropout=0
    )
    theirs_mod.eval()
    rng = np.random.default_rng(31)
    x = rng.standard_normal((3, 9, F)).astype(np.float32)
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(x), lengths=torch.ones(3))

    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    params = {
        "LSTM_0": {
            "l0_wx": {
                "kernel": sd["blstm.rnn.weight_ih_l0"].T,
                "bias": sd["blstm.rnn.bias_ih_l0"]
                + sd["blstm.rnn.bias_hh_l0"],
            },
            "l0_u": sd["blstm.rnn.weight_hh_l0"].T,
            "l0_bwd_wx": {
                "kernel": sd["blstm.rnn.weight_ih_l0_reverse"].T,
                "bias": sd["blstm.rnn.bias_ih_l0_reverse"]
                + sd["blstm.rnn.bias_hh_l0_reverse"],
            },
            "l0_bwd_u": sd["blstm.rnn.weight_hh_l0_reverse"].T,
        },
        "Dense_0": {
            "kernel": sd["linear1.weight"].T,
            "bias": sd["linear1.bias"],
        },
        "Dense_1": {
            "kernel": sd["linear2.weight"].T,
            "bias": sd["linear2.bias"],
        },
    }
    ours = Ours(hidden_size=H, num_layers=1, lin_dim=LD)
    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert set(init["params"]) == set(params)
    out = ours.apply({"params": params}, jnp.asarray(x), train=False)
    assert_close(out, theirs, rtol=1e-4, atol=1e-5, what="MGAN-U generator")


def test_metricgan_u_discriminator_parity(ref, torch):
    from speechbrain.lobes.models.MetricGAN_U import (
        MetricDiscriminator as Ref,
    )
    from speechbrain_tpu.lobes.models.MetricGAN_U import (
        MetricDiscriminator as Ours,
    )
    from torch.nn.utils import remove_spectral_norm

    C = 6
    theirs_mod = Ref(base_channels=C, lin_dim1=10, lin_dim2=4)
    theirs_mod.eval()
    # fold the spectral normalization into the weights
    for name in ("conv1", "conv2", "conv3", "conv4",
                 "Linear1", "Linear2", "Linear3"):
        remove_spectral_norm(getattr(theirs_mod, name))

    rng = np.random.default_rng(32)
    x = rng.standard_normal((2, 24, 24)).astype(np.float32)
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(x)[:, None, :, :])  # (B,1,T,F)

    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    buf = {n: t2j(p) for n, p in theirs_mod.named_buffers()}

    def conv(i):
        return {
            "kernel": jnp.transpose(sd[f"conv{i}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"conv{i}.bias"],
        }

    def lin(i, name):
        return {
            "kernel": sd[f"Linear{i}.weight"].T,
            "bias": sd[f"Linear{i}.bias"],
        }

    params = {
        "BatchNorm_0": {"scale": sd["BN.weight"], "bias": sd["BN.bias"]},
        "conv_0": conv(1),
        "conv_1": conv(2),
        "conv_2": conv(3),
        "conv_3": conv(4),
        "linear_1": lin(1, "linear_1"),
        "linear_2": lin(2, "linear_2"),
        "linear_out": lin(3, "linear_out"),
    }
    stats = {
        "BatchNorm_0": {
            "mean": buf["BN.running_mean"],
            "var": buf["BN.running_var"],
        }
    }
    ours = Ours(base_channels=C, lin_dim1=10, lin_dim2=4, spec_norm=False)
    init = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x)[..., None], train=False
    )
    assert set(init["params"]) == set(params), (
        sorted(init["params"]), sorted(params),
    )
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x)[..., None],
        train=False,
    )
    assert_close(
        out, theirs, rtol=1e-4, atol=1e-5, what="MGAN-U discriminator"
    )
