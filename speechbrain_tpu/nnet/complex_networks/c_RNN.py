"""Complex recurrent layers (CLSTM/CRNN/CLiGRU).

Parity target: reference ``nnet/complex_networks/c_RNN.py``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.complex_networks.c_linear import CLinear

__all__ = ["CLSTM", "CRNN", "CLiGRU"]


class _CRecurrentBase(nn.Module):
    hidden_size: int = 128  # complex units
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


class CLSTM(_CRecurrentBase):
    """Complex LSTM.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = CLSTM(hidden_size=4)
    >>> x = jnp.ones((2, 5, 8))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(p, x).shape
    (2, 5, 8)
    """

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden_size  # complex units -> 2H real dims

        def layer(inp, idx, backward):
            name = f"l{idx}{'_bwd' if backward else ''}"
            src = jnp.flip(inp, axis=1) if backward else inp
            wx = CLinear(n_neurons=4 * H, bias=True, name=f"{name}_wx")(src)
            u = CLinear(n_neurons=4 * H, bias=False, name=f"{name}_u")
            B = inp.shape[0]
            h = jnp.zeros((B, 2 * H), inp.dtype)
            c = jnp.zeros((B, 2 * H), inp.dtype)
            hs = []
            for t in range(inp.shape[1]):
                gates = wx[:, t] + u(h)
                ii, ff, gg, oo = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(ff) * c + jax.nn.sigmoid(ii) * jnp.tanh(gg)
                h = jax.nn.sigmoid(oo) * jnp.tanh(c)
                hs.append(h)
            ys = jnp.stack(hs, axis=1)
            if backward:
                ys = jnp.flip(ys, axis=1)
            return ys, (h, c)

        return self._run(x, layer)


class CRNN(_CRecurrentBase):
    """Vanilla complex RNN."""

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden_size

        def layer(inp, idx, backward):
            name = f"l{idx}{'_bwd' if backward else ''}"
            src = jnp.flip(inp, axis=1) if backward else inp
            wx = CLinear(n_neurons=H, bias=True, name=f"{name}_wx")(src)
            u = CLinear(n_neurons=H, bias=False, name=f"{name}_u")
            B = inp.shape[0]
            h = jnp.zeros((B, 2 * H), inp.dtype)
            hs = []
            for t in range(inp.shape[1]):
                h = jnp.tanh(wx[:, t] + u(h))
                hs.append(h)
            ys = jnp.stack(hs, axis=1)
            if backward:
                ys = jnp.flip(ys, axis=1)
            return ys, h

        return self._run(x, layer)


class CLiGRU(_CRecurrentBase):
    """Complex light GRU."""

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden_size

        def layer(inp, idx, backward):
            name = f"l{idx}{'_bwd' if backward else ''}"
            src = jnp.flip(inp, axis=1) if backward else inp
            wx = CLinear(n_neurons=2 * H, bias=True, name=f"{name}_wx")(src)
            u = CLinear(n_neurons=2 * H, bias=False, name=f"{name}_u")
            B = inp.shape[0]
            h = jnp.zeros((B, 2 * H), inp.dtype)
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
