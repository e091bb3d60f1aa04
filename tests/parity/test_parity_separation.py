"""Transplant parity for separation models vs the reference
(conv_tasnet encoder/masker/decoder; dual_path blocks are covered in
test_parity_models.py for the norms and below for Dual_Computation_Block).
"""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np

import jax
import jax.numpy as jnp


def t2j(t):
    return jnp.asarray(to_np(t))


def _conv_kernel(w):
    """torch conv weight (out, in/groups, k) -> flax (k, in/groups, out)."""
    return jnp.transpose(t2j(w), (2, 1, 0))


def test_conv_tasnet_encoder_decoder_parity(ref, torch):
    from speechbrain.lobes.models.conv_tasnet import (
        Decoder as RefDecoder,
        Encoder as RefEncoder,
    )
    from speechbrain_tpu.lobes.models.conv_tasnet import Decoder, Encoder

    L, N, C = 8, 6, 2
    ref_enc = RefEncoder(L=L, N=N)
    ref_dec = RefDecoder(L=L, N=N)
    rng = np.random.default_rng(3)
    mix = rng.standard_normal((2, 64)).astype(np.float32)
    with torch.no_grad():
        w_ref = ref_enc(torch.tensor(mix))
        mask = torch.tensor(
            rng.uniform(size=(2, w_ref.shape[1], C, N)).astype(np.float32)
        )
        out_ref = ref_dec(w_ref, mask)

    enc = Encoder(L=L, N=N)
    enc_params = {
        "conv1d_U": {"Conv_0": {"kernel": _conv_kernel(ref_enc.conv1d_U.conv.weight)}}
    }
    w_ours = enc.apply({"params": enc_params}, jnp.asarray(mix))
    assert_close(w_ours, w_ref, rtol=1e-4, atol=1e-5, what="ConvTasNet Encoder")

    dec = Decoder(L=L, N=N)
    dec_params = {
        "basis_signals": {
            "Dense_0": {"kernel": t2j(ref_dec.basis_signals.w.weight).T}
        }
    }
    out_ours = dec.apply(
        {"params": dec_params}, w_ours, jnp.asarray(to_np(mask))
    )
    assert_close(out_ours, out_ref, rtol=1e-4, atol=1e-5, what="ConvTasNet Decoder")


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
def test_conv_tasnet_masknet_parity(ref, torch, norm_type):
    from speechbrain.lobes.models.conv_tasnet import MaskNet as RefMaskNet
    from speechbrain_tpu.lobes.models.conv_tasnet import MaskNet

    N, B, H, P, X, R, C = 6, 4, 5, 3, 2, 2, 2
    theirs_mod = RefMaskNet(
        N=N, B=B, H=H, P=P, X=X, R=R, C=C, norm_type=norm_type
    )
    theirs_mod.eval()
    rng = np.random.default_rng(11)
    # reference MaskNet input is channel-first [M, N, K]
    w = rng.standard_normal((2, N, 19)).astype(np.float32)
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(w))  # (C, M, N, K)

    sd = {n: p for n, p in theirs_mod.named_parameters()}

    def norm_params(prefix):
        return {
            "gamma": t2j(sd[f"{prefix}.gamma"]).reshape(-1),
            "beta": t2j(sd[f"{prefix}.beta"]).reshape(-1),
        }

    params = {
        "layer_norm": norm_params("layer_norm"),
        "bottleneck_conv1x1": {
            "Conv_0": {"kernel": _conv_kernel(sd["bottleneck_conv1x1.conv.weight"])}
        },
        "mask_conv1x1": {
            "Conv_0": {"kernel": _conv_kernel(sd["mask_conv1x1.conv.weight"])}
        },
        "temporal_conv_net": {},
    }
    for r in range(R):
        for x in range(X):
            rp = f"temporal_conv_net.temporalblock_{r}_{x}.layers"
            params["temporal_conv_net"][f"temporalblock_{r}_{x}"] = {
                "conv": {
                    "Conv_0": {"kernel": _conv_kernel(sd[f"{rp}.conv.conv.weight"])}
                },
                "act": {"negative_slope": t2j(sd[f"{rp}.act.weight"])[0]},
                "norm": norm_params(f"{rp}.norm"),
                "DSconv": {
                    "conv_0": {
                        "Conv_0": {
                            "kernel": _conv_kernel(sd[f"{rp}.DSconv.conv_0.conv.weight"])
                        }
                    },
                    "act": {
                        "negative_slope": t2j(sd[f"{rp}.DSconv.act.weight"])[0]
                    },
                    # reference appends the DSconv norm under the
                    # duplicate layer_name "act" -> stored as "act_0"
                    "norm": norm_params(f"{rp}.DSconv.act_0"),
                    "conv_1": {
                        "Conv_0": {
                            "kernel": _conv_kernel(sd[f"{rp}.DSconv.conv_1.conv.weight"])
                        }
                    },
                },
            }

    ours_mod = MaskNet(N=N, B=B, H=H, P=P, X=X, R=R, C=C, norm_type=norm_type)
    # ours is channels-last: (M, K, N) in, (C, M, K, N) out
    ours = ours_mod.apply(
        {"params": params}, jnp.asarray(np.swapaxes(w, 1, 2))
    )
    assert_close(
        jnp.swapaxes(ours, 2, 3),
        theirs,
        rtol=1e-4,
        atol=1e-5,
        what=f"ConvTasNet MaskNet ({norm_type})",
    )
