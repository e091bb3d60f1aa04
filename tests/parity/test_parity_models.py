"""Model-level transplant parity: whole reference blocks vs ours with
identical weights and inputs."""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np

import jax
import jax.numpy as jnp


def t2j(t):
    return jnp.asarray(to_np(t))


def test_conformer_encoder_layer_parity(ref, torch):
    from speechbrain.lobes.models.transformer.Conformer import (
        ConformerEncoderLayer as Ref,
    )
    from speechbrain.nnet.attention import RelPosEncXL as RefPE
    from speechbrain_tpu.lobes.models.transformer.Conformer import (
        ConformerEncoderLayer as Ours,
    )
    from speechbrain_tpu.nnet.attention import RelPosEncXL

    D, F, H, K = 16, 32, 2, 7
    theirs_mod = Ref(d_model=D, d_ffn=F, nhead=H, kernel_size=K)
    theirs_mod.eval()
    rng = np.random.default_rng(77)
    x = rng.standard_normal((2, 10, D)).astype(np.float32)
    x_t = torch.tensor(x)
    pe_t = RefPE(emb_dim=D)(x_t)
    with torch.no_grad():
        theirs, _ = theirs_mod(x_t, pos_embs=pe_t)

    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    d_head = D // H
    w = sd["mha_layer.in_proj_weight"].reshape(H, 3, d_head, D)
    def ln(prefix):
        # SB LayerNorm wraps torch's as .norm; raw where absent
        key = f"{prefix}.norm.weight" if f"{prefix}.norm.weight" in sd else f"{prefix}.weight"
        kb = key.replace("weight", "bias")
        return {"scale": sd[key], "bias": sd[kb]}
    params = {
        "LayerNorm_0": ln("ffn_module1.0"),
        "LayerNorm_1": ln("norm1"),
        "LayerNorm_2": ln("ffn_module2.0"),
        "LayerNorm_3": ln("norm2"),
        "mha": {
            "q_proj": {"kernel": w[:, 0].reshape(D, D).T},
            "k_proj": {"kernel": w[:, 1].reshape(D, D).T},
            "v_proj": {"kernel": w[:, 2].reshape(D, D).T},
            "out_proj": {
                "kernel": sd["mha_layer.out_proj.weight"].T,
                "bias": sd["mha_layer.out_proj.bias"],
            },
            "pos_proj": {"kernel": sd["mha_layer.linear_pos.weight"].T},
            "pos_bias_u": sd["mha_layer.pos_bias_u"].reshape(H, d_head),
            "pos_bias_v": sd["mha_layer.pos_bias_v"].reshape(H, d_head),
        },
        "conv": {
            "LayerNorm_0": ln("convolution_module.layer_norm"),
            "Dense_0": {
                "kernel": sd["convolution_module.bottleneck.0.weight"][
                    :, :, 0
                ].T,
                "bias": sd["convolution_module.bottleneck.0.bias"],
            },
            "depthwise_kernel": sd["convolution_module.conv.weight"][
                :, 0, :
            ].T,
            "depthwise_bias": sd["convolution_module.conv.bias"],
            "LayerNorm_1": ln("convolution_module.after_conv.0"),
            "Dense_1": {
                "kernel": sd["convolution_module.after_conv.2.weight"].T,
                "bias": sd["convolution_module.after_conv.2.bias"],
            },
        },
        "ffn1": {
            "Dense_0": {
                "kernel": sd["ffn_module1.1.ffn.0.weight"].T,
                "bias": sd["ffn_module1.1.ffn.0.bias"],
            },
            "Dense_1": {
                "kernel": sd["ffn_module1.1.ffn.3.weight"].T,
                "bias": sd["ffn_module1.1.ffn.3.bias"],
            },
        },
        "ffn2": {
            "Dense_0": {
                "kernel": sd["ffn_module2.1.ffn.0.weight"].T,
                "bias": sd["ffn_module2.1.ffn.0.bias"],
            },
            "Dense_1": {
                "kernel": sd["ffn_module2.1.ffn.3.weight"].T,
                "bias": sd["ffn_module2.1.ffn.3.bias"],
            },
        },
    }

    ours = Ours(d_model=D, d_ffn=F, nhead=H, kernel_size=K)
    pe = RelPosEncXL(emb_dim=D)(jnp.asarray(x))
    ours_out, _ = ours.apply(
        {"params": params}, x, pos_embs=pe, train=False
    )
    assert_close(
        ours_out, theirs, rtol=1e-3, atol=1e-4, what="ConformerEncoderLayer"
    )


def test_xvector_parity(ref, torch):
    from speechbrain.lobes.models.Xvector import Xvector as Ref
    from speechbrain_tpu.lobes.models.Xvector import Xvector as Ours

    rng = np.random.default_rng(78)
    x = rng.standard_normal((3, 20, 24)).astype(np.float32)
    theirs_mod = Ref(in_channels=24)
    theirs_mod.eval()
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(x))

    ours = Ours()
    init = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    ref_named = list(theirs_mod.named_parameters())
    ref_buffers = dict(theirs_mod.named_buffers())

    import flax

    flat = flax.traverse_util.flatten_dict(init["params"])
    stats = flax.traverse_util.flatten_dict(init.get("batch_stats", {}))
    # The TDNN blocks are homogeneous: map in order of appearance.
    conv_ws = [t2j(p) for n, p in ref_named if n.endswith("conv.weight")]
    conv_bs = [t2j(p) for n, p in ref_named if n.endswith("conv.bias")]
    bn_ws = [t2j(p) for n, p in ref_named if n.endswith("norm.weight")]
    bn_bs = [t2j(p) for n, p in ref_named if n.endswith("norm.bias")]
    bn_means = [
        t2j(v) for k, v in ref_buffers.items() if k.endswith("running_mean")
    ]
    bn_vars = [
        t2j(v) for k, v in ref_buffers.items() if k.endswith("running_var")
    ]
    lin_w = [t2j(p) for n, p in ref_named if n.endswith("w.weight")]
    lin_b = [t2j(p) for n, p in ref_named if n.endswith("w.bias")]

    def fill(flatdict, suffix, values, conv=False):
        keys = sorted(
            [k for k in flatdict if k[-1] == suffix],
            key=lambda k: tuple(str(p) for p in k),
        )
        assert len(keys) == len(values), (suffix, keys, len(values))
        for k, v in zip(keys, values):
            if conv:
                v = jnp.transpose(v, (2, 1, 0))
            elif v.ndim == 2:
                v = v.T
            assert flatdict[k].shape == v.shape, (k, flatdict[k].shape, v.shape)
            flatdict[k] = v

    conv_keys = sorted([k for k in flat if any("Conv" in part for part in k) and k[-1] == "kernel"])
    assert len(conv_keys) == len(conv_ws), (conv_keys, len(conv_ws))
    for k, v in zip(conv_keys, conv_ws):
        flat[k] = jnp.transpose(v, (2, 1, 0))
    convb_keys = sorted([k for k in flat if any("Conv" in part for part in k) and k[-1] == "bias"])
    for k, v in zip(convb_keys, conv_bs):
        flat[k] = v
    lnw_keys = sorted([k for k in flat if k[-1] == "scale"])
    assert len(lnw_keys) == len(bn_ws)
    for k, v in zip(lnw_keys, bn_ws):
        flat[k] = v
    lnb_keys = sorted(
        [k for k in flat if k[-1] == "bias"
         and not any("Conv" in part or "Dense" in part for part in k)]
    )
    for k, v in zip(lnb_keys, bn_bs):
        flat[k] = v
    dense_keys = sorted([k for k in flat if any("Dense" in part for part in k) and k[-1] == "kernel"])
    assert len(dense_keys) == len(lin_w)
    for k, v in zip(dense_keys, lin_w):
        flat[k] = v.T
    denseb_keys = sorted([k for k in flat if any("Dense" in part for part in k) and k[-1] == "bias"])
    for k, v in zip(denseb_keys, lin_b):
        flat[k] = v
    mean_keys = sorted([k for k in stats if k[-1] == "mean"])
    for k, v in zip(mean_keys, bn_means):
        stats[k] = v
    var_keys = sorted([k for k in stats if k[-1] == "var"])
    for k, v in zip(var_keys, bn_vars):
        stats[k] = v

    variables = {
        "params": flax.traverse_util.unflatten_dict(flat),
        "batch_stats": flax.traverse_util.unflatten_dict(stats),
    }
    ours_out = ours.apply(variables, jnp.asarray(x), train=False)
    assert_close(ours_out, theirs, rtol=1e-3, atol=1e-4, what="Xvector")


def test_ecapa_tdnn_parity(ref, torch):
    from speechbrain.lobes.models.ECAPA_TDNN import ECAPA_TDNN as Ref
    from speechbrain_tpu.lobes.models.ECAPA_TDNN import ECAPA_TDNN as Ours
    import flax

    cfg = dict(
        lin_neurons=32,
        channels=[16, 16, 16, 16, 48],
        kernel_sizes=[5, 3, 3, 3, 1],
        dilations=[1, 2, 3, 4, 1],
        attention_channels=8,
        res2net_scale=4,
        se_channels=8,
    )
    theirs_mod = Ref(input_size=24, **cfg)
    theirs_mod.eval()
    rng = np.random.default_rng(79)
    x = rng.standard_normal((2, 20, 24)).astype(np.float32)
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(x))

    ours = Ours(
        lin_neurons=32,
        channels=(16, 16, 16, 16, 48),
        kernel_sizes=(5, 3, 3, 3, 1),
        dilations=(1, 2, 3, 4, 1),
        attention_channels=8,
        res2net_scale=4,
        se_channels=8,
    )
    init = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    flat = flax.traverse_util.flatten_dict(init["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(
        init.get("batch_stats", {}), sep="/"
    )
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    buf = {n: t2j(p) for n, p in theirs_mod.named_buffers()}

    def put_conv(ours_prefix, ref_prefix):
        flat[f"{ours_prefix}/kernel"] = jnp.transpose(
            sd[f"{ref_prefix}.weight"], (2, 1, 0)
        )
        flat[f"{ours_prefix}/bias"] = sd[f"{ref_prefix}.bias"]

    def put_bn(ours_prefix, ref_prefix):
        flat[f"{ours_prefix}/scale"] = sd[f"{ref_prefix}.weight"]
        flat[f"{ours_prefix}/bias"] = sd[f"{ref_prefix}.bias"]
        stats[f"{ours_prefix}/mean"] = buf[f"{ref_prefix}.running_mean"]
        stats[f"{ours_prefix}/var"] = buf[f"{ref_prefix}.running_var"]

    def put_tdnn(ours_mod, ref_mod):
        put_conv(f"{ours_mod}/Conv1d_0/Conv_0", f"{ref_mod}.conv.conv")
        put_bn(
            f"{ours_mod}/BatchNorm1d_0/BatchNorm_0", f"{ref_mod}.norm.norm"
        )

    put_tdnn("block_0", "blocks.0")
    for i in (1, 2, 3):
        put_tdnn(f"serez_{i}_in", f"blocks.{i}.tdnn1")
        for j in (0, 1, 2):
            put_tdnn(
                f"serez_{i}_res2/block_{j + 1}",
                f"blocks.{i}.res2net_block.blocks.{j}",
            )
        put_tdnn(f"serez_{i}_out", f"blocks.{i}.tdnn2")
        put_conv(f"serez_{i}_se/Conv1d_0/Conv_0", f"blocks.{i}.se_block.conv1.conv")
        put_conv(f"serez_{i}_se/Conv1d_1/Conv_0", f"blocks.{i}.se_block.conv2.conv")
    put_tdnn("mfa", "mfa")
    put_tdnn("asp/TDNNBlock_0", "asp.tdnn")
    put_conv("asp/Conv1d_0/Conv_0", "asp.conv.conv")
    put_bn("asp_bn/BatchNorm_0", "asp_bn.norm")
    put_conv("fc/Conv_0", "fc.conv")

    variables = {
        "params": flax.traverse_util.unflatten_dict(flat, sep="/"),
        "batch_stats": flax.traverse_util.unflatten_dict(stats, sep="/"),
    }
    ours_out = ours.apply(variables, jnp.asarray(x), train=False)
    assert_close(ours_out, theirs, rtol=1e-3, atol=1e-4, what="ECAPA_TDNN")


def test_crdnn_parity(ref, torch):
    from speechbrain.lobes.models.CRDNN import CRDNN as Ref
    from speechbrain_tpu.lobes.models.CRDNN import CRDNN as Ours
    import flax

    theirs_mod = Ref(
        input_size=24,
        cnn_blocks=1,
        cnn_channels=[8],
        rnn_layers=1,
        rnn_neurons=16,
        dnn_blocks=1,
        dnn_neurons=16,
        time_pooling=True,
    )
    theirs_mod.eval()
    rng = np.random.default_rng(80)
    x = rng.standard_normal((2, 20, 24)).astype(np.float32)
    with torch.no_grad():
        theirs = theirs_mod(torch.tensor(x))

    ours = Ours(
        cnn_blocks=1,
        cnn_channels=(8,),
        rnn_layers=1,
        rnn_neurons=16,
        dnn_blocks=1,
        dnn_neurons=16,
        time_pooling=True,
    )
    init = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    flat = flax.traverse_util.flatten_dict(init["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(init["batch_stats"], sep="/")
    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    buf = {n: t2j(p) for n, p in theirs_mod.named_buffers()}

    for j, ref_j in (("0", "1"), ("1", "2")):
        # torch spatial axes are (freq, time) after its transpose;
        # ours are (time, freq): swap the kernel's spatial dims
        flat[f"cnn_0/Conv2d_{j}/Conv_0/kernel"] = jnp.transpose(
            sd[f"CNN.block_0.conv_{ref_j}.conv.weight"], (3, 2, 1, 0)
        )
        flat[f"cnn_0/Conv2d_{j}/Conv_0/bias"] = sd[
            f"CNN.block_0.conv_{ref_j}.conv.bias"
        ]
        flat[f"cnn_0/LayerNorm_{j}/LayerNorm_0/scale"] = sd[
            f"CNN.block_0.norm_{ref_j}.norm.weight"
        ]
        flat[f"cnn_0/LayerNorm_{j}/LayerNorm_0/bias"] = sd[
            f"CNN.block_0.norm_{ref_j}.norm.bias"
        ]
    flat["rnn/l0_wx/kernel"] = sd["RNN.rnn.0.w.weight"].T
    flat["rnn/l0_u"] = sd["RNN.rnn.0.u.weight"].T
    flat["rnn/l0_bn/scale"] = sd["RNN.rnn.0.norm.weight"]
    flat["rnn/l0_bn/bias"] = sd["RNN.rnn.0.norm.bias"]
    stats["rnn/l0_bn/mean"] = buf["RNN.rnn.0.norm.running_mean"]
    stats["rnn/l0_bn/var"] = buf["RNN.rnn.0.norm.running_var"]
    flat["dnn_0/Dense_0/kernel"] = sd["DNN.block_0.linear.w.weight"].T
    flat["dnn_0/Dense_0/bias"] = sd["DNN.block_0.linear.w.bias"]
    flat["dnn_0/BatchNorm1d_0/BatchNorm_0/scale"] = sd[
        "DNN.block_0.norm.norm.weight"
    ]
    flat["dnn_0/BatchNorm1d_0/BatchNorm_0/bias"] = sd[
        "DNN.block_0.norm.norm.bias"
    ]
    stats["dnn_0/BatchNorm1d_0/BatchNorm_0/mean"] = buf[
        "DNN.block_0.norm.norm.running_mean"
    ]
    stats["dnn_0/BatchNorm1d_0/BatchNorm_0/var"] = buf[
        "DNN.block_0.norm.norm.running_var"
    ]

    variables = {
        "params": flax.traverse_util.unflatten_dict(flat, sep="/"),
        "batch_stats": flax.traverse_util.unflatten_dict(stats, sep="/"),
    }
    ours_out = ours.apply(variables, jnp.asarray(x), train=False)
    assert_close(ours_out, theirs, rtol=1e-3, atol=1e-4, what="CRDNN")


def test_transformer_asr_parity(ref, torch):
    """Full TransformerASR stack (vanilla attention): same weights +
    inputs -> same (encoder_out, decoder_out), covering embeddings,
    fixed-abs-sine positional encoding, masks, encoder+decoder layers."""
    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ref,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ours,
    )
    import flax

    cfg = dict(
        tgt_vocab=20,
        input_size=24,
        d_model=16,
        nhead=2,
        num_encoder_layers=1,
        num_decoder_layers=1,
        d_ffn=32,
        dropout=0.0,
        encoder_module="transformer",
        attention_type="regularMHA",
        positional_encoding="fixed_abs_sine",
    )
    theirs_mod = Ref(**cfg)
    theirs_mod.eval()
    rng = np.random.default_rng(90)
    src = rng.standard_normal((2, 12, 24)).astype(np.float32)
    tgt = rng.integers(1, 20, (2, 5)).astype(np.int64)
    tgt[1, 3:] = 0  # padding
    wav_len = np.asarray([1.0, 0.75], dtype=np.float32)
    with torch.no_grad():
        t_enc, t_dec = theirs_mod(
            torch.tensor(src), torch.tensor(tgt), torch.tensor(wav_len)
        )

    sd = {n: t2j(p) for n, p in theirs_mod.named_parameters()}
    E = 16

    def mha(prefix):
        # torch nn.MultiheadAttention chunks the packed in_proj by ROWS
        w = sd[f"{prefix}.att.in_proj_weight"]
        b = sd[f"{prefix}.att.in_proj_bias"]
        return {
            "q_proj": {"kernel": w[:E].T, "bias": b[:E]},
            "k_proj": {"kernel": w[E : 2 * E].T, "bias": b[E : 2 * E]},
            "v_proj": {"kernel": w[2 * E :].T, "bias": b[2 * E :]},
            "out_proj": {
                "kernel": sd[f"{prefix}.att.out_proj.weight"].T,
                "bias": sd[f"{prefix}.att.out_proj.bias"],
            },
        }

    def ln(prefix):
        return {
            "scale": sd[f"{prefix}.norm.weight"],
            "bias": sd[f"{prefix}.norm.bias"],
        }

    def ffn(prefix):
        return {
            "Dense_0": {
                "kernel": sd[f"{prefix}.ffn.0.weight"].T,
                "bias": sd[f"{prefix}.ffn.0.bias"],
            },
            "Dense_1": {
                "kernel": sd[f"{prefix}.ffn.3.weight"].T,
                "bias": sd[f"{prefix}.ffn.3.bias"],
            },
        }

    ours = Ours(**cfg)
    init = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(src),
        jnp.asarray(tgt),
    )
    flat = flax.traverse_util.flatten_dict(init["params"], sep="/")
    new = dict(flat)

    def put(prefix_ours, tree):
        sub = flax.traverse_util.flatten_dict(tree, sep="/")
        for k, v in sub.items():
            key = f"{prefix_ours}/{k}"
            assert key in new, key
            assert new[key].shape == v.shape, (key, new[key].shape, v.shape)
            new[key] = v

    put("encoder/layer_0/MultiheadAttention_0", mha("encoder.layers.0.self_att"))
    put("encoder/layer_0/PositionalwiseFeedForward_0", ffn("encoder.layers.0.pos_ffn"))
    put("encoder/layer_0/LayerNorm_0", ln("encoder.layers.0.norm1"))
    put("encoder/layer_0/LayerNorm_1", ln("encoder.layers.0.norm2"))
    put("encoder/norm_out", ln("encoder.norm"))
    put("decoder/layer_0/self_attn", mha("decoder.layers.0.self_attn"))
    put("decoder/layer_0/cross_attn", mha("decoder.layers.0.mutihead_attn"))
    put("decoder/layer_0/PositionalwiseFeedForward_0", ffn("decoder.layers.0.pos_ffn"))
    put("decoder/layer_0/LayerNorm_0", ln("decoder.layers.0.norm1"))
    put("decoder/layer_0/LayerNorm_1", ln("decoder.layers.0.norm2"))
    put("decoder/layer_0/LayerNorm_2", ln("decoder.layers.0.norm3"))
    put("decoder/norm_out", ln("decoder.norm"))
    # input projection + target embedding
    src_keys = [k for k in new if k.startswith("custom_src_module")]
    assert len(src_keys) == 2, src_keys
    kkey = [k for k in src_keys if k.endswith("kernel")][0]
    bkey = [k for k in src_keys if k.endswith("bias")][0]
    new[kkey] = sd["custom_src_module.layers.0.w.weight"].T
    new[bkey] = sd["custom_src_module.layers.0.w.bias"]
    emb_keys = [k for k in new if k.startswith("custom_tgt_module")]
    assert len(emb_keys) == 1, emb_keys
    new[emb_keys[0]] = sd["custom_tgt_module.layers.0.emb.Embedding.weight"]

    variables = {"params": flax.traverse_util.unflatten_dict(new, sep="/")}
    o_enc, o_dec = ours.apply(
        variables,
        jnp.asarray(src),
        jnp.asarray(tgt),
        wav_len=jnp.asarray(wav_len),
        train=False,
    )
    assert_close(o_enc, t_enc, rtol=1e-3, atol=1e-4, what="TransformerASR enc")
    assert_close(o_dec, t_dec, rtol=1e-3, atol=1e-4, what="TransformerASR dec")


def test_dual_path_norms_parity(ref, torch):
    """SepFormer norms: gln normalizes over (C, L) jointly; the
    reference's 'CumulativeLayerNorm' is per-frame channel LN."""
    from speechbrain.lobes.models.dual_path import (
        GlobalLayerNorm as RefGLN,
        CumulativeLayerNorm as RefCLN,
    )
    from speechbrain_tpu.lobes.models.dual_path import (
        GlobalLayerNorm,
        CumulativeLayerNorm,
    )

    rng = np.random.default_rng(91)
    # reference layout: (N, C, L); ours channels-last (N, L, C)
    x_cf = rng.standard_normal((2, 8, 30)).astype(np.float32) * 2 + 0.5
    x_cl = np.transpose(x_cf, (0, 2, 1))

    ref_gln = RefGLN(8, 3)
    with torch.no_grad():
        t = ref_gln(torch.tensor(x_cf))
    ours = GlobalLayerNorm()
    p = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))
    o = ours.apply(p, jnp.asarray(x_cl))
    assert_close(
        np.transpose(np.asarray(o), (0, 2, 1)), t,
        rtol=1e-4, atol=1e-5, what="GlobalLayerNorm",
    )

    ref_cln = RefCLN(8)
    with torch.no_grad():
        t = ref_cln(torch.tensor(x_cf))
    ours = CumulativeLayerNorm()
    p = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))
    o = ours.apply(p, jnp.asarray(x_cl))
    assert_close(
        np.transpose(np.asarray(o), (0, 2, 1)), t,
        rtol=1e-4, atol=1e-4, what="CumulativeLayerNorm",
    )


def test_conv_tasnet_norms_parity(ref, torch):
    from speechbrain.lobes.models.conv_tasnet import (
        ChannelwiseLayerNorm as RefCLN,
        GlobalLayerNorm as RefGLN,
    )
    from speechbrain_tpu.lobes.models.conv_tasnet import (
        ChannelwiseLayerNorm,
        GlobalLayerNorm,
    )

    rng = np.random.default_rng(92)
    # reference conv_tasnet layout: (M, K, N) = (batch, time, channels)
    x = rng.standard_normal((2, 30, 8)).astype(np.float32) * 2 - 0.3

    for RefCls, OursCls, name in [
        (RefCLN, ChannelwiseLayerNorm, "tasnet cLN"),
        (RefGLN, GlobalLayerNorm, "tasnet gLN"),
    ]:
        ref_mod = RefCls(8)
        with torch.no_grad():
            t = ref_mod(torch.tensor(x))
        ours = OursCls(8) 
        p = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
        o = ours.apply(p, jnp.asarray(x))
        assert_close(o, t, rtol=1e-4, atol=1e-5, what=name)
