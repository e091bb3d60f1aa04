"""Layer-level numeric parity vs reference nnet/ with transplanted
weights: identical parameters + identical inputs → identical outputs.

Transplant conventions (torch -> flax):
- Linear/Dense: kernel = weight.T
- Conv1d: kernel (K, Cin/groups, Cout) = weight (Cout, Cin/groups, K).T
- LSTM: wx.kernel = weight_ih.T, wx.bias = bias_ih + bias_hh,
  u = weight_hh.T  (gate order i,f,g,o both sides)
- GRU: separate recurrent bias (torch applies bias_hh inside the reset
  gate product) — u_bias = bias_hh
"""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np

import jax
import jax.numpy as jnp


def t2j(t):
    return jnp.asarray(to_np(t))


@pytest.fixture(scope="module")
def x8(torch):
    rng = np.random.default_rng(21)
    return rng.standard_normal((3, 12, 8)).astype(np.float32)


def test_linear_parity(ref, torch, x8):
    from speechbrain.nnet.linear import Linear as RefLinear
    from speechbrain_tpu.nnet.linear import Linear

    theirs_mod = RefLinear(n_neurons=5, input_size=8)
    ours = Linear(n_neurons=5)
    p = ours.init(jax.random.PRNGKey(0), x8)
    p = {
        "params": {
            "Dense_0": {
                "kernel": t2j(theirs_mod.w.weight).T,
                "bias": t2j(theirs_mod.w.bias),
            }
        }
    }
    assert_close(
        ours.apply(p, x8),
        theirs_mod(torch.tensor(x8)),
        rtol=1e-5,
        atol=1e-6,
        what="Linear",
    )


@pytest.mark.parametrize("padding,k,stride,dilation", [
    ("same", 3, 1, 1),
    ("same", 4, 1, 1),   # even kernel: asymmetric pad path
    ("same", 5, 2, 1),
    ("same", 3, 1, 2),
    ("causal", 3, 1, 1),
    ("causal", 5, 1, 2),
    ("valid", 3, 1, 1),
])
def test_conv1d_parity(ref, torch, x8, padding, k, stride, dilation):
    from speechbrain.nnet.CNN import Conv1d as RefConv
    from speechbrain_tpu.nnet.CNN import Conv1d

    theirs_mod = RefConv(
        out_channels=6,
        kernel_size=k,
        in_channels=8,
        padding=padding,
        stride=stride,
        dilation=dilation,
    )
    ours = Conv1d(
        out_channels=6,
        kernel_size=k,
        padding=padding,
        stride=stride,
        dilation=dilation,
    )
    p = ours.init(jax.random.PRNGKey(0), x8)
    p = {
        "params": {
            "Conv_0": {
                "kernel": jnp.transpose(t2j(theirs_mod.conv.weight), (2, 1, 0)),
                "bias": t2j(theirs_mod.conv.bias),
            }
        }
    }
    assert_close(
        ours.apply(p, x8),
        theirs_mod(torch.tensor(x8)),
        rtol=1e-4,
        atol=1e-5,
        what=f"Conv1d {padding} k={k} s={stride} d={dilation}",
    )


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_parity(ref, torch, x8, bidirectional):
    from speechbrain.nnet.RNN import LSTM as RefLSTM
    from speechbrain_tpu.nnet.RNN import LSTM

    theirs_mod = RefLSTM(
        hidden_size=6, input_size=8, num_layers=2, bidirectional=bidirectional
    )
    ours = LSTM(hidden_size=6, num_layers=2, bidirectional=bidirectional)
    params = {}
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    for layer in range(2):
        for direction, sfx in (
            [(0, "")] if not bidirectional else [(0, ""), (1, "_reverse")]
        ):
            pre = f"l{layer}_bwd" if direction else f"l{layer}"
            params[f"{pre}_wx"] = {
                "kernel": sd[f"rnn.weight_ih_l{layer}{sfx}"].T,
                "bias": sd[f"rnn.bias_ih_l{layer}{sfx}"]
                + sd[f"rnn.bias_hh_l{layer}{sfx}"],
            }
            params[f"{pre}_u"] = sd[f"rnn.weight_hh_l{layer}{sfx}"].T
    init = ours.init(jax.random.PRNGKey(0), x8)
    # align transplant keys with the module's own structure
    assert set(params) == set(init["params"]), (
        sorted(params),
        sorted(init["params"]),
    )
    theirs, _ = theirs_mod(torch.tensor(x8))
    ours_out, _ = ours.apply({"params": params}, x8)
    assert_close(
        ours_out, theirs, rtol=1e-4, atol=1e-5,
        what=f"LSTM bi={bidirectional}",
    )


def test_gru_parity(ref, torch, x8):
    from speechbrain.nnet.RNN import GRU as RefGRU
    from speechbrain_tpu.nnet.RNN import GRU

    theirs_mod = RefGRU(hidden_size=6, input_size=8, num_layers=1)
    ours = GRU(hidden_size=6, num_layers=1)
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    params = {
        "l0_wx": {
            "kernel": sd["rnn.weight_ih_l0"].T,
            "bias": sd["rnn.bias_ih_l0"],
        },
        "l0_u": sd["rnn.weight_hh_l0"].T,
        "l0_u_bias": sd["rnn.bias_hh_l0"],
    }
    theirs, _ = theirs_mod(torch.tensor(x8))
    ours_out, _ = ours.apply({"params": params}, x8)
    assert_close(ours_out, theirs, rtol=1e-4, atol=1e-5, what="GRU")


def test_ligru_parity(ref, torch, x8):
    from speechbrain.nnet.RNN import LiGRU as RefLiGRU
    from speechbrain_tpu.nnet.RNN import LiGRU

    theirs_mod = RefLiGRU(
        hidden_size=6,
        input_shape=(3, 12, 8),
        num_layers=1,
        bidirectional=False,
    )
    theirs_mod.eval()  # BN in eval mode: deterministic running stats
    ours = LiGRU(hidden_size=6, num_layers=1, bidirectional=False)
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    bn = theirs_mod.rnn[0].norm
    variables = {
        "params": {
            "l0_wx": {"kernel": sd["rnn.0.w.weight"].T},
            "l0_u": sd["rnn.0.u.weight"].T,
            "l0_bn": {
                "scale": sd["rnn.0.norm.weight"],
                "bias": sd["rnn.0.norm.bias"],
            },
        },
        "batch_stats": {
            "l0_bn": {
                "mean": t2j(bn.running_mean),
                "var": t2j(bn.running_var),
            }
        },
    }
    with torch.no_grad():
        theirs, _ = theirs_mod(torch.tensor(x8))
    ours_out, _ = ours.apply(variables, x8, train=False)
    assert_close(ours_out, theirs, rtol=1e-4, atol=1e-5, what="LiGRU")


def test_relpos_mha_parity(ref, torch, x8):
    from speechbrain.nnet.attention import (
        RelPosMHAXL as RefMHA,
        RelPosEncXL as RefPE,
    )
    from speechbrain_tpu.nnet.attention import RelPosMHAXL, RelPosEncXL

    theirs_mod = RefMHA(embed_dim=8, num_heads=2)
    theirs_mod.eval()
    x_t = torch.tensor(x8)
    pe_t = RefPE(emb_dim=8)(x_t)
    with torch.no_grad():
        theirs, _ = theirs_mod(x_t, x_t, x_t, pe_t)

    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    E, H = 8, 2
    d = E // H
    # reference SELF-attention splits the packed projection per head
    # AFTER the head reshape (attention.py:550-553): q feature (h, dim)
    # comes from in_proj row h*3d + dim (interleaved), not row h*d+dim
    w = sd["in_proj_weight"].reshape(H, 3, d, E)  # (head, chunk, dim, in)
    params = {
        "q_proj": {"kernel": w[:, 0].reshape(E, E).T},
        "k_proj": {"kernel": w[:, 1].reshape(E, E).T},
        "v_proj": {"kernel": w[:, 2].reshape(E, E).T},
        "out_proj": {
            "kernel": sd["out_proj.weight"].T,
            "bias": sd["out_proj.bias"],
        },
        "pos_proj": {"kernel": sd["linear_pos.weight"].T},
        # reference stores (head_dim, n_heads) and torch-VIEWS it as
        # (n_heads, head_dim): a raw reinterpret, so reshape, not .T
        "pos_bias_u": sd["pos_bias_u"].reshape(H, d),
        "pos_bias_v": sd["pos_bias_v"].reshape(H, d),
    }
    ours = RelPosMHAXL(embed_dim=8, num_heads=2)
    pe = RelPosEncXL(emb_dim=8)(jnp.asarray(x8))
    assert_close(pe, pe_t, rtol=1e-5, atol=1e-6, what="RelPosEncXL")
    ours_out, _ = ours.apply(
        {"params": params}, x8, x8, x8, pe, train=False
    )
    assert_close(ours_out, theirs, rtol=1e-4, atol=1e-5, what="RelPosMHAXL")


def test_positionalwise_ffn_parity(ref, torch, x8):
    from speechbrain.nnet.attention import (
        PositionalwiseFeedForward as RefFFN,
    )
    from speechbrain_tpu.nnet.attention import PositionalwiseFeedForward

    theirs_mod = RefFFN(d_ffn=16, input_size=8)
    theirs_mod.eval()
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(x8))
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    names = sorted(sd)
    ours = PositionalwiseFeedForward(d_ffn=16)
    init = ours.init(jax.random.PRNGKey(0), x8)
    keys = sorted(init["params"])
    params = {
        keys[0]: {
            "kernel": sd["ffn.0.weight"].T, "bias": sd["ffn.0.bias"],
        },
        keys[1]: {
            "kernel": sd["ffn.3.weight"].T, "bias": sd["ffn.3.bias"],
        },
    }
    ours_out = ours.apply({"params": params}, x8, train=False)
    assert_close(
        ours_out, theirs, rtol=1e-4, atol=1e-5,
        what=f"FFN (ref names {names})",
    )


def test_statistics_pooling_parity(ref, torch, x8):
    from speechbrain.nnet.pooling import StatisticsPooling as RefSP
    from speechbrain_tpu.nnet.pooling import StatisticsPooling

    theirs = RefSP()(torch.tensor(x8))
    ours = StatisticsPooling()(x8)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-4, what="StatsPool")


def test_batchnorm_layernorm_parity(ref, torch, x8):
    from speechbrain.nnet.normalization import (
        BatchNorm1d as RefBN,
        LayerNorm as RefLN,
    )
    from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm

    ref_bn = RefBN(input_size=8)
    # run a few training batches so running stats are non-trivial
    rng = np.random.default_rng(31)
    for _ in range(3):
        ref_bn(torch.tensor(
            rng.standard_normal((4, 10, 8)).astype(np.float32) * 2 + 1
        ))
    ref_bn.eval()
    with torch.no_grad():
        theirs = ref_bn(torch.tensor(x8))
    ours = BatchNorm1d()
    init = ours.init(jax.random.PRNGKey(0), x8)
    (bn_name,) = init["params"].keys()
    variables = {
        "params": {
            bn_name: {
                "scale": t2j(ref_bn.norm.weight),
                "bias": t2j(ref_bn.norm.bias),
            }
        },
        "batch_stats": {
            bn_name: {
                "mean": t2j(ref_bn.norm.running_mean),
                "var": t2j(ref_bn.norm.running_var),
            }
        },
    }
    ours_out = ours.apply(variables, x8, train=False)
    assert_close(ours_out, theirs, rtol=1e-4, atol=1e-5, what="BatchNorm1d")

    ref_ln = RefLN(input_size=8)
    with torch.no_grad():
        theirs = ref_ln(torch.tensor(x8))
    ln = LayerNorm()
    p = ln.init(jax.random.PRNGKey(0), x8)
    ours_out = ln.apply(p, x8)
    assert_close(ours_out, theirs, rtol=1e-4, atol=1e-5, what="LayerNorm")


def test_embedding_parity(ref, torch):
    from speechbrain.nnet.embedding import Embedding as RefEmb
    from speechbrain_tpu.nnet.embedding import Embedding

    theirs_mod = RefEmb(num_embeddings=10, embedding_dim=6)
    idx = np.asarray([[1, 2, 3], [4, 0, 9]], dtype=np.int64)
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(idx))
    ours = Embedding(num_embeddings=10, embedding_dim=6)
    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(idx))
    flat = jax.tree_util.tree_leaves_with_path(init["params"])
    assert len(flat) == 1
    path = flat[0][0]
    table = t2j(theirs_mod.Embedding.weight)
    params = init["params"]
    # write the torch table into whatever single leaf the module has
    import flax

    params = flax.traverse_util.unflatten_dict(
        {tuple(k.key for k in path): table}
    )
    ours_out = ours.apply({"params": params}, jnp.asarray(idx))
    assert_close(ours_out, theirs, rtol=1e-6, atol=1e-7, what="Embedding")


def test_swish_softmax_parity(ref, torch, x8):
    from speechbrain.nnet.activations import Swish as RefSwish
    from speechbrain_tpu.nnet.activations import Swish

    theirs = RefSwish()(torch.tensor(x8))
    ours = Swish()(x8) if callable(Swish) else None
    assert_close(ours, theirs, rtol=1e-5, atol=1e-6, what="Swish")


def test_ligru_bidirectional_shared_weights_parity(ref, torch, x8):
    """Reference bidirectional LiGRU SHARES weights between directions
    (flip-on-batch, RNN.py:1218-1243); ours must too."""
    from speechbrain.nnet.RNN import LiGRU as RefLiGRU
    from speechbrain_tpu.nnet.RNN import LiGRU

    theirs_mod = RefLiGRU(
        hidden_size=6,
        input_shape=(3, 12, 8),
        num_layers=2,
        bidirectional=True,
    )
    theirs_mod.eval()
    ours = LiGRU(hidden_size=6, num_layers=2, bidirectional=True)
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    params, stats = {}, {}
    for i in range(2):
        bn = theirs_mod.rnn[i].norm
        params[f"l{i}_wx"] = {"kernel": sd[f"rnn.{i}.w.weight"].T}
        params[f"l{i}_u"] = sd[f"rnn.{i}.u.weight"].T
        params[f"l{i}_bn"] = {
            "scale": sd[f"rnn.{i}.norm.weight"],
            "bias": sd[f"rnn.{i}.norm.bias"],
        }
        stats[f"l{i}_bn"] = {
            "mean": t2j(bn.running_mean),
            "var": t2j(bn.running_var),
        }
    with torch.no_grad():
        theirs, _ = theirs_mod(torch.tensor(x8))
    ours_out, _ = ours.apply(
        {"params": params, "batch_stats": stats}, x8, train=False
    )
    assert_close(
        ours_out, theirs, rtol=1e-4, atol=1e-5, what="LiGRU bidir shared"
    )


def test_conv2d_with_constraint_parity(ref, torch):
    """Transplant parity vs reference Conv2dWithConstraint
    (reference nnet/CNN.py:723): max-norm renorm per output channel,
    same-padding, non-square kernel exercising the (freq, time) axis
    quirk inherited from Conv2d."""
    from speechbrain.nnet.CNN import Conv2dWithConstraint as RefConv
    from speechbrain_tpu.nnet.CNN import Conv2dWithConstraint

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 20, 16, 3)).astype(np.float32)

    theirs_mod = RefConv(
        in_channels=3, out_channels=5, kernel_size=(7, 3), max_norm=1.0
    )
    # Scale up the torch weight so the max-norm constraint actually binds
    # for some output channels (fresh init norms are typically < 1).
    with torch.no_grad():
        theirs_mod.conv.weight.mul_(3.0)
    ours = Conv2dWithConstraint(
        out_channels=5, kernel_size=(7, 3), max_norm=1.0
    )
    _ = ours.init(jax.random.PRNGKey(0), x)
    # torch weight (Cout, Cin, kH=freq, kW=time) -> flax (kh=time, kw=freq,
    # Cin, Cout): same swap-spatial transplant as the CRDNN Conv2d test.
    p = {
        "params": {
            "kernel": jnp.transpose(t2j(theirs_mod.conv.weight), (3, 2, 1, 0)),
            "bias": t2j(theirs_mod.conv.bias),
        }
    }
    assert_close(
        ours.apply(p, x),
        theirs_mod(torch.tensor(x)),
        rtol=1e-4,
        atol=1e-5,
        what="Conv2dWithConstraint",
    )
