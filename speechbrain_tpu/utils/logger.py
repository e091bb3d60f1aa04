"""Logging setup and environment description.

Parity targets: reference ``utils/logger.py:83`` (setup_logging) and
``:153`` (get_environment_description).
"""

import logging
import logging.config
import math
import os
import platform
import sys

ORDERS_ABBREV = {
    -24: "y", -21: "z", -18: "a", -15: "f", -12: "p", -9: "n",
    -6: "µ", -3: "m", 0: "", 3: "k", 6: "M", 9: "G", 12: "T",
    15: "P", 18: "E", 21: "Z", 24: "Y",
}

__all__ = [
    "setup_logging",
    "format_order_of_magnitude",
    "get_environment_description",
]


def setup_logging(config=None, overrides={}, default_level=logging.INFO):
    """Configure logging from a dict config, with recursive overrides."""
    from speechbrain_tpu.utils.data_utils import recursive_update

    if config is None:
        config = {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {
                "simple": {"format": "%(asctime)s - %(levelname)s - %(name)s - %(message)s"}
            },
            "handlers": {
                "console": {
                    "class": "logging.StreamHandler",
                    "level": "INFO",
                    "formatter": "simple",
                    "stream": "ext://sys.stdout",
                }
            },
            # Keep third-party debug chatter (jax dispatch/cache-key
            # logs) out of experiment logs; root stays DEBUG so
            # file handlers can capture our own debug records.
            "loggers": {
                "jax": {"level": "INFO"},
                "jax._src": {"level": "INFO"},
            },
            "root": {"level": "DEBUG", "handlers": ["console"]},
        }
    recursive_update(config, overrides)
    logging.config.dictConfig(config)


def format_order_of_magnitude(number, abbreviate=True):
    """Format e.g. 123456789 -> ('123.5', 'M').

    Example
    -------
    >>> format_order_of_magnitude(123456789)
    ('123.46', 'M')
    """
    style = ORDERS_ABBREV
    precision = "{num:3.2f}"
    order = 3 * math.floor(math.log(math.fabs(number), 1000)) if number != 0 else 0
    order = min(max(order, min(style.keys())), max(style.keys()))
    factor = 10 ** order
    num_str = precision.format(num=number / factor)
    return num_str, style[order]


def get_environment_description():
    """A multi-line description of python/jax/platform for env.log."""
    lines = [f"Python version:\n{sys.version}\n"]
    try:
        import jax

        lines.append(f"jax version: {jax.__version__}")
        lines.append(f"jax backend: {jax.default_backend()}")
        lines.append(f"jax devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax unavailable: {e}")
    try:
        import flax
        import optax

        lines.append(f"flax version: {flax.__version__}")
        lines.append(f"optax version: {optax.__version__}")
    except Exception:  # pragma: no cover
        pass
    lines.append(f"platform: {platform.platform()}")
    lines.append(f"XLA_FLAGS: {os.environ.get('XLA_FLAGS', '')}")
    return "\n".join(lines) + "\n"


class TqdmCompatibleStreamHandler(logging.StreamHandler):
    """StreamHandler that plays nicely with tqdm progress bars
    (reference ``utils/logger.py``): writes through ``tqdm.write`` when
    tqdm is active so log lines don't break the bar."""

    def emit(self, record):
        """Emits a log record through ``tqdm.write`` when available."""
        try:
            from tqdm import tqdm

            msg = self.format(record)
            tqdm.write(msg, file=self.stream)
            self.flush()
        except ImportError:
            super().emit(record)
        except RecursionError:
            raise
        except Exception:
            self.handleError(record)
