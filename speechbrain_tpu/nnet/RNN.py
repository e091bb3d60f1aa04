"""Recurrent layers as lax.scan over precomputed input projections.

TPU pattern: the input-to-hidden matmul for ALL timesteps is done as one
big (B*T, C) x (C, G*H) matmul (MXU-friendly), the scan body only does
the (B, H) x (H, G*H) recurrent matmul — minimal sequential work.
Bidirectional runs the flipped sequence through a second set of weights
and concatenates (reference flips on the batch axis,
``nnet/RNN.py:1218``; equivalent math).

Parity targets: reference ``nnet/RNN.py:54,169,280`` (RNN/LSTM/GRU),
``:391,498,603`` (cells), ``:713`` (AttentionalRNNDecoder), ``:961,1125``
(LiGRU), ``:1328`` (QuasiRNN).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.attention import (
    ContentBasedAttention,
    LocationAwareAttention,
    KeyValueAttention,
)

__all__ = [
    "RNN",
    "LSTM",
    "GRU",
    "LiGRU",
    "RNNCell",
    "GRUCell",
    "LSTMCell",
    "AttentionalRNNDecoder",
    "QuasiRNN",
]


def _time_scan(step_fn, carry_init, xs_time_major, reverse=False):
    carry, ys = jax.lax.scan(
        step_fn, carry_init, xs_time_major, reverse=reverse
    )
    return carry, ys


class _RecurrentBase(nn.Module):
    """Shared multi-layer / bidirectional plumbing."""

    hidden_size: int = 512
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    re_init: bool = True

    def _dropout(self, x, train):
        if self.dropout > 0.0:
            return nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x

    def _run_layers(self, x, train, single_layer_fn, hx=None):
        """Run the layer stack.  ``hx`` is the torch-convention initial
        state: (num_layers * num_directions, B, H) array (or a tuple of
        such arrays for LSTM); the returned final state uses the same
        stacked layout, so sequence RNNs are resumable step-by-step
        (transducer prediction networks, streaming decode)."""
        D = 2 if self.bidirectional else 1
        states = []
        for layer_idx in range(self.num_layers):
            init_f = (
                None if hx is None else self._slice_hx(hx, layer_idx * D)
            )
            fwd, s_f = single_layer_fn(x, layer_idx, False, init_f)
            if self.bidirectional:
                init_b = (
                    None
                    if hx is None
                    else self._slice_hx(hx, layer_idx * D + 1)
                )
                bwd, s_b = single_layer_fn(x, layer_idx, True, init_b)
                x = jnp.concatenate([fwd, bwd], axis=-1)
                states.extend([s_f, s_b])
            else:
                x = fwd
                states.append(s_f)
            if layer_idx != self.num_layers - 1:
                x = self._dropout(x, train)
        return x, self._stack_states(states)

    @staticmethod
    def _slice_hx(hx, i):
        if isinstance(hx, tuple):
            return tuple(part[i] for part in hx)
        return hx[i]

    @staticmethod
    def _stack_states(states):
        if isinstance(states[0], tuple):
            return tuple(
                jnp.stack([s[k] for s in states])
                for k in range(len(states[0]))
            )
        return jnp.stack(states)


class LSTM(_RecurrentBase):
    """Multi-layer (bi)LSTM: (B, T, C) -> (B, T, H*(2 if bidir)).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = LSTM(hidden_size=8, num_layers=2)
    >>> x = jnp.ones((2, 5, 4))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> y, state = net.apply(p, x)
    >>> y.shape
    (2, 5, 8)
    """

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        H = self.hidden_size

        def layer(inp, idx, backward, init=None):
            name = f"l{idx}{'_bwd' if backward else ''}"
            wx = nn.Dense(4 * H, name=f"{name}_wx", dtype=inp.dtype)(inp)
            u_kernel = self.param(
                f"{name}_u", nn.initializers.orthogonal(), (H, 4 * H)
            ).astype(inp.dtype)
            B = inp.shape[0]
            if init is None:
                h0 = jnp.zeros((B, H), inp.dtype)
                c0 = jnp.zeros((B, H), inp.dtype)
            else:
                h0 = init[0].astype(inp.dtype)
                c0 = init[1].astype(inp.dtype)

            def step(carry, wxt):
                h, c = carry
                gates = wxt + h @ u_kernel
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            (hT, cT), ys = _time_scan(
                step, (h0, c0), jnp.swapaxes(wx, 0, 1), reverse=backward
            )
            return jnp.swapaxes(ys, 0, 1), (hT, cT)

        return self._run_layers(x, train, layer, hx=hx)


class GRU(_RecurrentBase):
    """Multi-layer (bi)GRU.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = GRU(hidden_size=8)
    >>> p = net.init(jax.random.PRNGKey(0), jnp.ones((2, 5, 4)))
    >>> y, _ = net.apply(p, jnp.ones((2, 5, 4)))
    >>> y.shape
    (2, 5, 8)
    """

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        H = self.hidden_size

        def layer(inp, idx, backward, init=None):
            name = f"l{idx}{'_bwd' if backward else ''}"
            wx = nn.Dense(3 * H, name=f"{name}_wx", dtype=inp.dtype)(inp)
            u_kernel = self.param(
                f"{name}_u", nn.initializers.orthogonal(), (H, 3 * H)
            ).astype(inp.dtype)
            u_bias = self.param(
                f"{name}_u_bias", nn.initializers.zeros, (3 * H,)
            ).astype(inp.dtype)
            B = inp.shape[0]
            h0 = (
                jnp.zeros((B, H), inp.dtype)
                if init is None
                else init.astype(inp.dtype)
            )

            def step(h, wxt):
                uh = h @ u_kernel + u_bias
                rx, zx, nx = jnp.split(wxt, 3, axis=-1)
                rh, zh, nh = jnp.split(uh, 3, axis=-1)
                r = jax.nn.sigmoid(rx + rh)
                z = jax.nn.sigmoid(zx + zh)
                n = jnp.tanh(nx + r * nh)
                h = (1 - z) * n + z * h
                return h, h

            hT, ys = _time_scan(
                step, h0, jnp.swapaxes(wx, 0, 1), reverse=backward
            )
            return jnp.swapaxes(ys, 0, 1), hT

        return self._run_layers(x, train, layer, hx=hx)


class RNN(_RecurrentBase):
    """Vanilla (bi)RNN with tanh or relu."""

    nonlinearity: str = "tanh"

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        H = self.hidden_size
        act = jnp.tanh if self.nonlinearity == "tanh" else jax.nn.relu

        def layer(inp, idx, backward, init=None):
            name = f"l{idx}{'_bwd' if backward else ''}"
            wx = nn.Dense(H, name=f"{name}_wx", dtype=inp.dtype)(inp)
            u_kernel = self.param(
                f"{name}_u", nn.initializers.orthogonal(), (H, H)
            ).astype(inp.dtype)
            B = inp.shape[0]
            h0 = (
                jnp.zeros((B, H), inp.dtype)
                if init is None
                else init.astype(inp.dtype)
            )

            def step(h, wxt):
                h = act(wxt + h @ u_kernel)
                return h, h

            hT, ys = _time_scan(
                step, h0, jnp.swapaxes(wx, 0, 1), reverse=backward
            )
            return jnp.swapaxes(ys, 0, 1), hT

        return self._run_layers(x, train, layer, hx=hx)


class LiGRU(_RecurrentBase):
    """Light GRU: single gate, BN on the input projection, ReLU, shared
    recurrent-dropout mask across timesteps (reference ``RNN.py:1125``).

    The SpeechBrain signature recurrence:
        w = BN(W x)                      (all timesteps at once)
        at, zt = chunk(w_t + U h)
        h = sigmoid(zt) * h + (1-sigmoid(zt)) * relu(at) * drop_mask

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = LiGRU(hidden_size=8)
    >>> x = jnp.ones((2, 5, 4))
    >>> p = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> y, _ = net.apply(p, x, train=False)
    >>> y.shape
    (2, 5, 8)
    """

    nonlinearity: str = "relu"
    normalization: str = "batchnorm"

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        H = self.hidden_size
        if self.nonlinearity == "relu":
            act = jax.nn.relu
        elif self.nonlinearity == "tanh":
            act = jnp.tanh
        elif self.nonlinearity == "sin":
            act = jnp.sin
        elif self.nonlinearity == "leaky_relu":
            act = jax.nn.leaky_relu
        else:
            act = jax.nn.relu

        def layer(inp, idx, init=None):
            """One LiGRU layer; bidirectional via the reference's
            flip-on-batch trick with SHARED weights (RNN.py:1218-1243):
            [x; flip_t(x)] runs through one cell, halving parameters vs
            separate per-direction weights."""
            name = f"l{idx}"
            B = inp.shape[0]
            if self.bidirectional:
                inp = jnp.concatenate(
                    [inp, jnp.flip(inp, axis=1)], axis=0
                )
            N, T = inp.shape[0], inp.shape[1]
            wx = nn.Dense(2 * H, use_bias=False, name=f"{name}_wx", dtype=inp.dtype)(inp)
            if self.normalization == "batchnorm":
                wx = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.95,
                    name=f"{name}_bn",
                    dtype=inp.dtype,
                )(wx.reshape(N * T, 2 * H)).reshape(N, T, 2 * H)
            elif self.normalization == "layernorm":
                wx = nn.LayerNorm(name=f"{name}_ln", dtype=inp.dtype)(wx)
            u_kernel = self.param(
                f"{name}_u", nn.initializers.orthogonal(), (H, 2 * H)
            ).astype(inp.dtype)
            # Recurrent dropout: one mask per sequence, shared over time.
            if self.dropout > 0.0 and train:
                rng = self.make_rng("dropout")
                drop_mask = jax.random.bernoulli(
                    rng, 1.0 - self.dropout, (N, H)
                ).astype(inp.dtype) / (1.0 - self.dropout)
            else:
                drop_mask = jnp.ones((N, H), inp.dtype)
            h0 = (
                jnp.zeros((N, H), inp.dtype)
                if init is None
                else init.astype(inp.dtype)
            )

            def step(h, wxt):
                gates = wxt + h @ u_kernel
                at, zt = jnp.split(gates, 2, axis=-1)
                zt_s = jax.nn.sigmoid(zt)
                hcand = act(at) * drop_mask
                h = zt_s * h + (1 - zt_s) * hcand
                return h, h

            hT, ys = _time_scan(step, h0, jnp.swapaxes(wx, 0, 1))
            ys = jnp.swapaxes(ys, 0, 1)  # (N, T, H)
            if self.bidirectional:
                h_f, h_b = ys[:B], jnp.flip(ys[B:], axis=1)
                return jnp.concatenate([h_f, h_b], axis=-1), (
                    hT[:B],
                    hT[B:],
                )
            return ys, (hT,)

        D = 2 if self.bidirectional else 1
        states = []
        out = x
        for idx in range(self.num_layers):
            if hx is None:
                init = None
            else:
                init = self._slice_hx(hx, idx * D)
                if self.bidirectional:
                    init = jnp.concatenate(
                        [init, self._slice_hx(hx, idx * D + 1)], axis=0
                    )
            out, hTs = layer(out, idx, init)
            states.extend(hTs)
        # reference LiGRU has no inter-layer dropout: the shared-mask
        # recurrent dropout inside the cell is the only dropout
        return out, self._stack_states(states)


class QuasiRNN(_RecurrentBase):
    """Quasi-RNN: convolutional gates + fo-pooling scan.

    Reference ``nnet/RNN.py:1328``; the heavy compute (gate projection
    over a small window) is parallel, only elementwise pooling recurs.
    """

    zoneout: float = 0.0
    window: int = 2

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        H = self.hidden_size

        def layer(inp, idx, backward, init=None):
            name = f"l{idx}{'_bwd' if backward else ''}"
            src = jnp.flip(inp, axis=1) if backward else inp
            if self.window == 2:
                prev = jnp.pad(src, ((0, 0), (1, 0), (0, 0)))[:, :-1]
                conv_in = jnp.concatenate([prev, src], axis=-1)
            else:
                conv_in = src
            gates = nn.Dense(3 * H, name=f"{name}_gates", dtype=inp.dtype)(conv_in)
            z, f, o = jnp.split(gates, 3, axis=-1)
            z = jnp.tanh(z)
            f = jax.nn.sigmoid(f)
            o = jax.nn.sigmoid(o)

            def step(c, zf):
                zt, ft = zf
                c = ft * c + (1 - ft) * zt
                return c, c

            c0 = (
                jnp.zeros((inp.shape[0], H), inp.dtype)
                if init is None
                else init.astype(inp.dtype)
            )
            cT, cs = jax.lax.scan(
                step,
                c0,
                (jnp.swapaxes(z, 0, 1), jnp.swapaxes(f, 0, 1)),
            )
            cs = jnp.swapaxes(cs, 0, 1)
            h = o * cs
            if backward:
                h = jnp.flip(h, axis=1)
            return h, cT

        return self._run_layers(x, train, layer, hx=hx)


# ---------------------------------------------------------------------------
# Cells (single-step, for autoregressive decoding)
# ---------------------------------------------------------------------------

class GRUCell(nn.Module):
    """Single-step GRU cell stack for decoding."""

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        """x: (B, C); hx: (num_layers, B, H). Returns (out, new_hx)."""
        H = self.hidden_size
        if hx is None:
            hx = jnp.zeros((self.num_layers, x.shape[0], H), x.dtype)
        new_h = []
        inp = x
        for i in range(self.num_layers):
            wx = nn.Dense(3 * H, name=f"l{i}_wx", dtype=x.dtype)(inp)
            uh = nn.Dense(3 * H, name=f"l{i}_u", dtype=x.dtype)(hx[i])
            rx, zx, nx = jnp.split(wx, 3, axis=-1)
            rh, zh, nh = jnp.split(uh, 3, axis=-1)
            r = jax.nn.sigmoid(rx + rh)
            z = jax.nn.sigmoid(zx + zh)
            n = jnp.tanh(nx + r * nh)
            h = (1 - z) * n + z * hx[i]
            new_h.append(h)
            inp = h
            if i != self.num_layers - 1 and self.dropout > 0:
                inp = nn.Dropout(
                    rate=self.dropout, deterministic=not train
                )(inp)
        return inp, jnp.stack(new_h)


class LSTMCell(nn.Module):
    """Single-step LSTM cell stack for decoding."""

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        """x: (B, C); hx: ((L, B, H), (L, B, H)). Returns (out, new_hx)."""
        H = self.hidden_size
        if hx is None:
            zeros = jnp.zeros((self.num_layers, x.shape[0], H), x.dtype)
            hx = (zeros, zeros)
        hs, cs = hx
        new_h, new_c = [], []
        inp = x
        for i in range(self.num_layers):
            wx = nn.Dense(4 * H, name=f"l{i}_wx", dtype=x.dtype)(inp)
            uh = nn.Dense(4 * H, use_bias=False, name=f"l{i}_u", dtype=x.dtype)(hs[i])
            gates = wx + uh
            ii, ff, gg, oo = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(ff) * cs[i] + jax.nn.sigmoid(ii) * jnp.tanh(gg)
            h = jax.nn.sigmoid(oo) * jnp.tanh(c)
            new_h.append(h)
            new_c.append(c)
            inp = h
            if i != self.num_layers - 1 and self.dropout > 0:
                inp = nn.Dropout(
                    rate=self.dropout, deterministic=not train
                )(inp)
        return inp, (jnp.stack(new_h), jnp.stack(new_c))


class RNNCell(nn.Module):
    """Single-step vanilla RNN cell stack."""

    hidden_size: int
    num_layers: int = 1
    nonlinearity: str = "tanh"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        H = self.hidden_size
        act = jnp.tanh if self.nonlinearity == "tanh" else jax.nn.relu
        if hx is None:
            hx = jnp.zeros((self.num_layers, x.shape[0], H), x.dtype)
        new_h = []
        inp = x
        for i in range(self.num_layers):
            h = act(
                nn.Dense(H, name=f"l{i}_wx", dtype=x.dtype)(inp)
                + nn.Dense(H, use_bias=False, name=f"l{i}_u", dtype=x.dtype)(hx[i])
            )
            new_h.append(h)
            inp = h
            if i != self.num_layers - 1 and self.dropout > 0:
                inp = nn.Dropout(rate=self.dropout, deterministic=not train)(inp)
        return inp, jnp.stack(new_h)


class AttentionalRNNDecoder(nn.Module):
    """Attention-equipped RNN decoder (CRDNN seq2seq workhorse).

    Per step: context = attn(enc_states, h); rnn input = [emb_t, context];
    output = proj([h, context]).  Training runs all steps under one
    lax.scan (teacher forcing); decoding calls ``forward_step`` via
    ``apply(..., method=...)``.

    Reference ``nnet/RNN.py:713``.
    """

    rnn_type: str = "gru"
    attn_type: str = "content"
    hidden_size: int = 256
    attn_dim: int = 256
    num_layers: int = 1
    scaling: float = 1.0
    channels: int = 10
    kernel_size: int = 100
    dropout: float = 0.0

    def setup(self):
        """Flax setup: declare submodules/params."""
        if self.rnn_type == "gru":
            self.rnn = GRUCell(
                hidden_size=self.hidden_size,
                num_layers=self.num_layers,
                dropout=self.dropout,
            )
        elif self.rnn_type == "lstm":
            self.rnn = LSTMCell(
                hidden_size=self.hidden_size,
                num_layers=self.num_layers,
                dropout=self.dropout,
            )
        else:
            self.rnn = RNNCell(
                hidden_size=self.hidden_size,
                num_layers=self.num_layers,
                dropout=self.dropout,
            )
        if self.attn_type == "content":
            self.attn = ContentBasedAttention(
                attn_dim=self.attn_dim,
                output_dim=self.hidden_size,
                scaling=self.scaling,
            )
        elif self.attn_type == "location":
            self.attn = LocationAwareAttention(
                attn_dim=self.attn_dim,
                output_dim=self.hidden_size,
                conv_channels=self.channels,
                kernel_size=self.kernel_size,
                scaling=self.scaling,
            )
        elif self.attn_type == "keyvalue":
            self.attn = KeyValueAttention(
                attn_dim=self.attn_dim, output_dim=self.hidden_size
            )
        else:
            raise ValueError(f"Unknown attn_type {self.attn_type}")
        self.proj = nn.Dense(self.hidden_size)

    def attn_init(self, enc_states):
        """Initial attention state for decoding (precomputed encoder
        projection, plus e.g. ``prev_attn`` for location attention)."""
        return self.attn.init_state(enc_states)

    def forward_step(self, inp, hs, c, enc_states, enc_lens, attn_state=None):
        """One decode step.  inp: (B, E), c: (B, H) previous context."""
        cell_inp = jnp.concatenate([inp, c], axis=-1)
        cell_out, hs = self.rnn(cell_inp, hs, train=False)
        c, w, attn_state = self.attn(
            enc_states, enc_lens, cell_out, attn_state
        )
        dec_out = self.proj(jnp.concatenate([cell_out, c], axis=-1))
        return dec_out, hs, c, w, attn_state

    def __call__(self, inp_tensor, enc_states, enc_lens, train=True):
        """Teacher-forced decode: inp (B, U, E) -> (B, U, H), attn (B,U,T)."""
        B, U = inp_tensor.shape[0], inp_tensor.shape[1]
        c0 = jnp.zeros((B, self.hidden_size), inp_tensor.dtype)
        attn_state0 = self.attn.init_state(enc_states)
        if self.rnn_type == "lstm":
            zeros = jnp.zeros((self.num_layers, B, self.hidden_size), inp_tensor.dtype)
            hs0 = (zeros, zeros)
        else:
            hs0 = jnp.zeros((self.num_layers, B, self.hidden_size), inp_tensor.dtype)

        # nn.scan shares the module parameters across steps.
        def body(mdl, carry, x_t):
            hs, c, attn_state = carry
            cell_inp = jnp.concatenate([x_t, c], axis=-1)
            cell_out, hs = mdl.rnn(cell_inp, hs, train=train)
            c, w, attn_state = mdl.attn(enc_states, enc_lens, cell_out, attn_state)
            dec_out = mdl.proj(jnp.concatenate([cell_out, c], axis=-1))
            return (hs, c, attn_state), (dec_out, w)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, (outputs, attn_weights) = scan(
            self, (hs0, c0, attn_state0), inp_tensor
        )
        return outputs, attn_weights


def rnn_init(params):
    """Orthogonally re-initialize recurrent kernels in an RNN params
    pytree (reference ``nnet/RNN.py:1592``: the functional analogue of
    iterating ``named_parameters`` for ``weight_hh``/``.u.`` weights).

    Any leaf whose path contains ``recurrent_kernel`` or ``u_kernel``
    and is a square-ish 2-d matrix is replaced with an orthogonal
    matrix of the same shape; all other leaves pass through.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = RNN(hidden_size=5)
    >>> x = jnp.ones((4, 10, 20))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> v2 = rnn_init(v)
    >>> jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    True
    """
    import numpy as _np
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    out = {}
    rng = _np.random.RandomState(0)
    for path, leaf in flat.items():
        name = "/".join(str(p) for p in path)
        if (
            ("recurrent_kernel" in name or "u_kernel" in name or
             name.endswith("hh"))
            and hasattr(leaf, "ndim") and leaf.ndim == 2
        ):
            a = rng.randn(*leaf.shape)
            q, r = _np.linalg.qr(a if a.shape[0] >= a.shape[1] else a.T)
            q = q * _np.sign(_np.diag(r))[None, :]
            if a.shape[0] < a.shape[1]:
                q = q.T
            out[path] = jnp.asarray(q[: leaf.shape[0], : leaf.shape[1]],
                                    dtype=leaf.dtype)
        else:
            out[path] = leaf
    return unflatten_dict(out)
