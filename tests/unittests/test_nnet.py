import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.nnet.CNN import (
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    DepthwiseSeparableConv1d,
    SincConv,
)
from speechbrain_tpu.nnet.RNN import (
    GRU,
    LSTM,
    AttentionalRNNDecoder,
    GRUCell,
    LiGRU,
)
from speechbrain_tpu.nnet.attention import (
    MultiheadAttention,
    PositionalwiseFeedForward,
    RelPosEncXL,
    RelPosMHAXL,
)
from speechbrain_tpu.nnet.containers import ConnectBlocks, Sequential
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm
from speechbrain_tpu.nnet.pooling import Pooling1d, StatisticsPooling

KEY = jax.random.PRNGKey(0)


def test_conv1d_same_padding():
    conv = Conv1d(out_channels=8, kernel_size=5)
    x = jnp.ones((2, 40, 16))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 40, 8)


def test_conv1d_causal():
    conv = Conv1d(out_channels=1, kernel_size=3, padding="causal", bias=False)
    x = jnp.zeros((1, 10, 1)).at[0, 5, 0].set(1.0)
    p = conv.init(KEY, x)
    y = conv.apply(p, x)
    # Causal: output before t=5 must be zero.
    assert np.allclose(np.asarray(y)[0, :5, 0], 0.0)


def test_conv1d_stride():
    conv = Conv1d(out_channels=4, kernel_size=3, stride=2)
    x = jnp.ones((2, 40, 8))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 20, 4)


def test_conv2d():
    conv = Conv2d(out_channels=4, kernel_size=(3, 3), stride=(2, 2))
    x = jnp.ones((2, 20, 40))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 10, 20, 4)


def test_conv_transpose():
    up = ConvTranspose1d(out_channels=4, kernel_size=4, stride=2, padding=1)
    x = jnp.ones((1, 10, 8))
    p = up.init(KEY, x)
    assert up.apply(p, x).shape == (1, 20, 4)


def test_sinc_conv():
    conv = SincConv(out_channels=8, kernel_size=65)
    x = jnp.ones((2, 1600))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 1600, 8)


def test_depthwise_separable():
    conv = DepthwiseSeparableConv1d(out_channels=8, kernel_size=3)
    x = jnp.ones((2, 20, 4))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 20, 8)


def test_lstm_shapes():
    net = LSTM(hidden_size=8, num_layers=2, bidirectional=True)
    x = jnp.ones((2, 5, 4))
    p = net.init(KEY, x)
    y, states = net.apply(p, x)
    assert y.shape == (2, 5, 16)


def test_gru_runs():
    net = GRU(hidden_size=8)
    x = jax.random.normal(KEY, (2, 5, 4))
    p = net.init(KEY, x)
    y, _ = net.apply(p, x)
    assert y.shape == (2, 5, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_ligru():
    net = LiGRU(hidden_size=8, num_layers=2, bidirectional=True)
    x = jax.random.normal(KEY, (2, 5, 4))
    variables = net.init(KEY, x, train=False)
    y, _ = net.apply(variables, x, train=False)
    assert y.shape == (2, 5, 16)
    # Train mode mutates batch_stats
    y2, mutated = net.apply(
        variables, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": KEY},
    )
    assert "batch_stats" in mutated


def test_relpos_mha_shapes():
    mha = RelPosMHAXL(embed_dim=16, num_heads=4)
    x = jax.random.normal(KEY, (2, 6, 16))
    pe = RelPosEncXL(emb_dim=16)(x)
    p = mha.init(KEY, x, x, x, pe)
    out, attn = mha.apply(p, x, x, x, pe, train=False)
    assert out.shape == (2, 6, 16)
    assert attn.shape == (2, 4, 6, 6)


def test_relpos_mha_translation_invariance():
    """Relative attention scores must be shift-invariant for repeated
    content."""
    mha = RelPosMHAXL(embed_dim=8, num_heads=2)
    x = jnp.tile(jax.random.normal(KEY, (1, 1, 8)), (1, 6, 1))
    pe = RelPosEncXL(emb_dim=8)(x)
    p = mha.init(KEY, x, x, x, pe)
    _, attn = mha.apply(p, x, x, x, pe, train=False)
    a = np.asarray(attn)[0, 0]
    # With identical content, the score difference between two relative
    # offsets is row-independent -> attention RATIOS shift with the row
    # (softmax row normalization cancels in the ratio).
    assert abs(a[2, 2] / a[2, 1] - a[3, 3] / a[3, 2]) < 1e-4
    assert abs(a[1, 1] / a[1, 0] - a[4, 4] / a[4, 3]) < 1e-4


def test_mha_padding_mask():
    mha = MultiheadAttention(nhead=2, d_model=8)
    x = jax.random.normal(KEY, (2, 5, 8))
    pad_mask = jnp.array(
        [[False, False, False, True, True], [False] * 5]
    )
    p = mha.init(KEY, x, x, x)
    out, attn = mha.apply(
        p, x, x, x, key_padding_mask=pad_mask, train=False
    )
    a = np.asarray(attn)
    assert a[0, :, 3:].max() < 1e-6  # no attention to padding


def test_ffn():
    ffn = PositionalwiseFeedForward(d_ffn=32)
    x = jnp.ones((2, 5, 8))
    p = ffn.init(KEY, x)
    assert ffn.apply(p, x, train=False).shape == (2, 5, 8)


def test_sequential():
    model = Sequential(layers=(Linear(n_neurons=8), Linear(n_neurons=4)))
    x = jnp.ones((2, 10, 16))
    p = model.init(KEY, x)
    assert model.apply(p, x).shape == (2, 10, 4)


def test_connect_blocks_residual():
    model = ConnectBlocks(
        layers=(Linear(n_neurons=8), Linear(n_neurons=8)),
        shortcut_type="residual",
    )
    x = jnp.ones((2, 5, 8))
    p = model.init(KEY, x)
    assert model.apply(p, x).shape == (2, 5, 8)


def test_pooling():
    pool = Pooling1d("max", kernel_size=2)
    x = jnp.arange(8.0).reshape(1, 8, 1)
    y = pool(x)
    assert y.shape == (1, 4, 1)
    assert np.asarray(y)[0, :, 0].tolist() == [1.0, 3.0, 5.0, 7.0]


def test_statistics_pooling_masked():
    sp = StatisticsPooling()
    x = jnp.concatenate(
        [jnp.ones((1, 5, 4)), 100 * jnp.ones((1, 5, 4))], axis=1
    )
    out = sp(x, lengths=jnp.array([0.5]))
    mean = np.asarray(out)[0, 0, :4]
    assert np.allclose(mean, 1.0, atol=1e-5)


def test_batchnorm_stats():
    bn = BatchNorm1d()
    x = jax.random.normal(KEY, (8, 10, 4)) * 3 + 1
    variables = bn.init(KEY, x, train=False)
    y, mutated = bn.apply(
        x=x, train=True, variables=variables, mutable=["batch_stats"]
    )
    assert abs(float(np.asarray(y).mean())) < 0.1


def test_attentional_decoder():
    dec = AttentionalRNNDecoder(
        rnn_type="gru", attn_type="content", hidden_size=16,
        attn_dim=16, num_layers=1,
    )
    enc = jax.random.normal(KEY, (2, 12, 8))
    inp = jax.random.normal(KEY, (2, 4, 6))
    p = dec.init(KEY, inp, enc, jnp.ones(2), train=False)
    out, attn = dec.apply(p, inp, enc, jnp.ones(2), train=False)
    assert out.shape == (2, 4, 16)
    assert attn.shape == (2, 4, 12)
    w = np.asarray(attn)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-4)


def test_qbatchnorm():
    """Quaternion batchnorm: shared sigma across components, train/eval
    stat tracking, quaternion-direction preservation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speechbrain_tpu.nnet.quaternion_networks.q_normalization import (
        QBatchNorm,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(64, 5, 8)), jnp.float32)
    qbn = QBatchNorm(input_size=8)
    vars_ = qbn.init(jax.random.PRNGKey(0), x, train=False)
    y, updates = qbn.apply(
        vars_, x, train=True, mutable=["batch_stats"]
    )
    assert y.shape == x.shape
    # Whole-quaternion standardization: mean ~0 and unit mean squared
    # quaternion norm (the 4 components SHARE one sigma).
    assert abs(float(y.mean())) < 1e-4
    comps = jnp.split(y, 4, axis=-1)
    qnorm = sum(c**2 for c in comps).mean()
    assert abs(float(qnorm) - 1.0) < 0.02
    # Running stats moved toward batch stats.
    assert float(updates["batch_stats"]["mean"].mean()) != 0.0
    # Eval mode with tracked stats is deterministic w.r.t. stored stats.
    merged = {"params": vars_["params"], **updates}
    y_eval = qbn.apply(merged, x, train=False)
    assert np.isfinite(np.asarray(y_eval)).all()


def test_sequence_rnn_state_resume():
    """Stepwise decode with carried hx == one full-sequence run
    (transducer prediction networks rely on this)."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.nnet.RNN import GRU, LSTM

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, 4)), jnp.float32
    )
    for cls in (GRU, LSTM):
        net = cls(hidden_size=8, num_layers=2)
        p = net.init(jax.random.PRNGKey(1), x)
        full, final = net.apply(p, x)
        hx = None
        outs = []
        for t in range(x.shape[1]):
            out, hx = net.apply(p, x[:, t : t + 1], hx=hx)
            outs.append(out)
        step = jnp.concatenate(outs, axis=1)
        assert np.allclose(np.asarray(full), np.asarray(step), atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            final,
            hx,
        )
