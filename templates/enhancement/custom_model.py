"""A custom spectral-mask model, written from scratch.

Template counterpart of the reference
``templates/enhancement/custom_model.py``: shows how to define your own
model as a Flax module built from ``speechbrain_tpu.nnet`` primitives —
anything with this shape-in/shape-out contract plugs into a Brain
recipe via the YAML ``!new:custom_model.CustomModel`` tag.
"""

import flax.linen as nn
import jax

from speechbrain_tpu.nnet.RNN import LSTM


class CustomModel(nn.Module):
    """Simple RNN masker: spectra in, sigmoid mask of same width out.

    Arguments
    ---------
    input_size : int
        Number of spectral bins (mask width).
    rnn_size : int
        LSTM hidden size.
    projection : int
        Projection layer width between the RNN and the output.
    layers : int
        Number of LSTM layers.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = CustomModel(input_size=161, rnn_size=32, projection=16)
    >>> x = jnp.ones((2, 50, 161))
    >>> params = model.init(jax.random.PRNGKey(0), x)
    >>> model.apply(params, x).shape
    (2, 50, 161)
    """

    input_size: int
    rnn_size: int = 256
    projection: int = 128
    layers: int = 2

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        x, _ = LSTM(
            hidden_size=self.rnn_size,
            num_layers=self.layers,
            bidirectional=False,
        )(x, train=train)
        x = nn.Dense(self.projection, dtype=x.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.Dense(self.input_size, dtype=x.dtype)(x)
        return jax.nn.sigmoid(x)
