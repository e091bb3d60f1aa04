"""Quaternion recurrent layers (QLSTM/QRNN/QLiGRU).

Parity target: reference ``nnet/quaternion_networks/q_RNN.py``.
Recurrences follow the real counterparts with all matmuls replaced by
Hamilton-product linear maps.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.quaternion_networks.q_linear import QLinear

__all__ = ["QLSTM", "QRNN", "QLiGRU"]


class _QRecurrentBase(nn.Module):
    hidden_size: int = 128  # quaternion units
    num_layers: int = 1
    bidirectional: bool = False

    def _run(self, x, layer_fn):
        for idx in range(self.num_layers):
            fwd, _ = layer_fn(x, idx, False)
            if self.bidirectional:
                bwd, _ = layer_fn(x, idx, True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


class QLSTM(_QRecurrentBase):
    """Quaternion LSTM: gates from quaternion input/recurrent maps.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = QLSTM(hidden_size=4)
    >>> x = jnp.ones((2, 5, 16))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(p, x).shape
    (2, 5, 16)
    """

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden_size  # quaternion units -> 4H real dims

        def layer(inp, idx, backward):
            name = f"l{idx}{'_bwd' if backward else ''}"
            wx = QLinear(
                n_neurons=4 * H, bias=True, name=f"{name}_wx"
            )(inp)
            u = QLinear(n_neurons=4 * H, bias=False, name=f"{name}_u")

            def step(carry, wxt):
                h, c = carry
                gates = wxt + u(h)
                ii, ff, gg, oo = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(ff) * c + jax.nn.sigmoid(ii) * jnp.tanh(gg)
                h = jax.nn.sigmoid(oo) * jnp.tanh(c)
                return (h, c), h

            B = inp.shape[0]
            h0 = jnp.zeros((B, 4 * H), inp.dtype)
            c0 = jnp.zeros((B, 4 * H), inp.dtype)
            # Python loop over time (quaternion modules inside lax.scan
            # would re-create params); sequences here are short.
            hs = []
            h, c = h0, c0
            for t in range(inp.shape[1]):
                (h, c), out = step((h, c), wx[:, t])
                hs.append(out)
            ys = jnp.stack(hs, axis=1)
            if backward:
                ys = jnp.flip(ys, axis=1)
            return ys, (h, c)

        def layer_wrap(inp, idx, backward):
            src = jnp.flip(inp, axis=1) if backward else inp
            return layer(src, idx, backward)

        return self._run(x, layer_wrap)


class QRNN(_QRecurrentBase):
    """Vanilla quaternion RNN with tanh."""

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden_size

        def layer(inp, idx, backward):
            name = f"l{idx}{'_bwd' if backward else ''}"
            src = jnp.flip(inp, axis=1) if backward else inp
            wx = QLinear(n_neurons=H, bias=True, name=f"{name}_wx")(src)
            u = QLinear(n_neurons=H, bias=False, name=f"{name}_u")
            B = inp.shape[0]
            h = jnp.zeros((B, 4 * H), inp.dtype)
            hs = []
            for t in range(inp.shape[1]):
                h = jnp.tanh(wx[:, t] + u(h))
                hs.append(h)
            ys = jnp.stack(hs, axis=1)
            if backward:
                ys = jnp.flip(ys, axis=1)
            return ys, h

        return self._run(x, layer)


class QLiGRU(_QRecurrentBase):
    """Quaternion light GRU (relu candidate, single gate)."""

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden_size

        def layer(inp, idx, backward):
            name = f"l{idx}{'_bwd' if backward else ''}"
            src = jnp.flip(inp, axis=1) if backward else inp
            wx = QLinear(n_neurons=2 * H, bias=True, name=f"{name}_wx")(src)
            u = QLinear(n_neurons=2 * H, bias=False, name=f"{name}_u")
            B = inp.shape[0]
            h = jnp.zeros((B, 4 * H), inp.dtype)
            hs = []
            for t in range(inp.shape[1]):
                gates = wx[:, t] + u(h)
                at, zt = jnp.split(gates, 2, axis=-1)
                z = jax.nn.sigmoid(zt)
                h = z * h + (1 - z) * jax.nn.relu(at)
                hs.append(h)
            ys = jnp.stack(hs, axis=1)
            if backward:
                ys = jnp.flip(ys, axis=1)
            return ys, h

        return self._run(x, layer)
