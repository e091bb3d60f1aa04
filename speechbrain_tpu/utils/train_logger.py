"""Epoch-level training loggers: file, TensorBoard, W&B.

Parity targets: reference ``utils/train_logger.py:14,46,104,176``.
"""

import logging

logger = logging.getLogger(__name__)

__all__ = [
    "TrainLogger",
    "FileTrainLogger",
    "TensorboardLogger",
    "WandBLogger",
    "ProgressSampleLogger",
    "plot_spectrogram",
]


class TrainLogger:
    """Abstract interface: log one train/valid/test report per call."""

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        raise NotImplementedError


class FileTrainLogger(TrainLogger):
    """One line per epoch in a text file.

    Example line:
    ``epoch: 2, lr: 1.00e-03 - train loss: 2.31 - valid loss: 2.10``
    """

    def __init__(self, save_file, precision=2):
        self.save_file = save_file
        self.precision = precision

    def _item_to_string(self, key, value, dataset=None):
        if isinstance(value, float) and 1.0 < value < 100.0:
            value = f"{value:.{self.precision}f}"
        elif isinstance(value, float):
            value = f"{value:.{self.precision}e}"
        if dataset is not None:
            key = f"{dataset} {key}"
        return f"{key}: {value}"

    def _stats_to_string(self, stats, dataset=None):
        return ", ".join(
            self._item_to_string(k, v, dataset) for k, v in stats.items()
        )

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=True,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        string_summary = self._stats_to_string(stats_meta)
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is not None:
                string_summary += " - " + self._stats_to_string(stats, dataset)
        with open(self.save_file, "a") as fout:
            print(string_summary, file=fout)
        if verbose:
            logger.info(string_summary)


class TensorboardLogger(TrainLogger):
    """Scalars to TensorBoard via flax.metrics or tensorboardX if present."""

    def __init__(self, save_dir):
        self.save_dir = save_dir
        self.writer = None
        self.global_step = {"train": {}, "valid": {}, "test": {}, "meta": 0}
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(self.save_dir)
        except Exception as e:  # pragma: no cover
            logger.warning(f"TensorBoard writer unavailable: {e}")

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        if self.writer is None:
            return
        self.global_step["meta"] += 1
        for name, value in stats_meta.items():
            if isinstance(value, (int, float)):
                self.writer.add_scalar(
                    name, value, self.global_step["meta"]
                )
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is None:
                continue
            for stat, value in stats.items():
                if not isinstance(value, (int, float)):
                    continue
                tag = f"{stat}/{dataset}"
                new_step = self.global_step[dataset].get(stat, 0) + 1
                self.global_step[dataset][stat] = new_step
                self.writer.add_scalar(tag, value, new_step)


class WandBLogger(TrainLogger):
    """Weights & Biases logger (optional dependency, lazily initialized)."""

    def __init__(self, initializer=None, **kwargs):
        try:
            import wandb

            if initializer is None:
                initializer = wandb.init
            self.run = initializer(**kwargs)
        except Exception as e:
            raise e

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        logs = {}
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is not None:
                logs[dataset] = stats
        step = stats_meta.get("epoch", None)
        if step is not None:
            self.run.log({**logs, **stats_meta}, step=step)
        else:
            self.run.log({**logs, **stats_meta})


def _save_raw(data, path):
    """Default "raw" saver: nested dict/arrays as a .npz archive (the
    reference pickles with torch.save; npz is the torch-free analogue)."""
    import numpy as np

    if isinstance(data, dict):
        flat = {}

        def _flatten(prefix, value):
            if isinstance(value, dict):
                for k, v in value.items():
                    _flatten(f"{prefix}{k}/", v)
            else:
                flat[prefix.rstrip("/")] = np.asarray(value)

        _flatten("", data)
        np.savez(path, **flat)
    else:
        np.savez(path, data=np.asarray(data))


def _save_image(data, path):
    """Default "image" saver: 2D array -> grayscale PNG (min/max
    normalized).  Batched (B, H, W) input saves the first item."""
    import numpy as np

    arr = np.asarray(data, dtype=np.float32)
    while arr.ndim > 2:
        arr = arr[0]
    lo, hi = float(arr.min()), float(arr.max())
    arr = (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)
    img = (arr * 255).astype(np.uint8)
    try:
        from PIL import Image

        # Feature bins on the vertical axis, origin at the bottom.
        Image.fromarray(img[::-1]).save(path)
    except ImportError:  # pragma: no cover
        logger.warning("PIL not available - saving %s as .npy", path)
        np.save(path + ".npy", img)


def _save_audio(data, path, samplerate=16000):
    """Audio saver: waveform array -> 16-bit WAV."""
    import numpy as np

    from speechbrain_tpu.dataio.dataio import write_audio

    arr = np.asarray(data, dtype=np.float32)
    while arr.ndim > 1:
        arr = arr[0]
    write_audio(path, arr, samplerate)


class ProgressSampleLogger:
    """Saves per-epoch progress samples (spectrograms, alignments, raw
    tensors, audio) during generative-model training — reference
    ``utils/train_logger.py:231``.

    ``remember(**kwargs)`` accumulates named arrays;
    ``save(epoch)`` writes ``<output_path>/<epoch>/<key>.<ext>`` for
    every remembered item; ``reset()`` clears the collection (call it
    in ``on_stage_start``).

    Formats: ``image`` (default; 2D array -> PNG), ``raw`` (npz),
    ``audio`` (wav).  Per-key formats come from ``formats``; custom
    savers can be registered through ``format_defs``.

    Example
    -------
    >>> import tempfile, numpy as np
    >>> d = tempfile.mkdtemp()
    >>> psl = ProgressSampleLogger(output_path=d, batch_sample_size=2)
    >>> psl.remember(mel=np.zeros((3, 80, 50)))
    >>> psl.save(epoch=1)
    >>> import os; sorted(os.listdir(os.path.join(d, "1")))
    ['mel.png']
    """

    _DEFAULT_FORMAT_DEFS = {
        "raw": {"extension": "npz", "saver": _save_raw, "kwargs": {}},
        "image": {"extension": "png", "saver": _save_image, "kwargs": {}},
        "audio": {"extension": "wav", "saver": _save_audio, "kwargs": {}},
    }
    DEFAULT_FORMAT = "image"

    def __init__(
        self, output_path, formats=None, format_defs=None, batch_sample_size=1
    ):
        self.progress_samples = {}
        self.formats = formats or {}
        self.format_defs = dict(self._DEFAULT_FORMAT_DEFS)
        if format_defs is not None:
            self.format_defs.update(format_defs)
        self.batch_sample_size = batch_sample_size
        self.output_path = output_path

    def reset(self):
        """Clears the collection of progress samples."""
        self.progress_samples = {}

    def remember(self, **kwargs):
        """Adds named samples to the collection (device arrays are
        pulled to host immediately so they don't pin HBM)."""
        import numpy as np

        def _host(value):
            if isinstance(value, dict):
                return {k: _host(v) for k, v in value.items()}
            try:
                return np.asarray(value)
            except Exception:
                return value

        self.progress_samples.update(
            {key: _host(value) for key, value in kwargs.items()}
        )

    def get_batch_sample(self, value):
        """First ``batch_sample_size`` items of a batched value
        (recursing into dicts), for monitoring raw batches."""
        if isinstance(value, dict):
            return {
                key: self.get_batch_sample(item)
                for key, item in value.items()
            }
        if isinstance(value, (list, tuple)) or hasattr(value, "shape"):
            return value[: self.batch_sample_size]
        return value

    def save(self, epoch):
        """Writes every remembered item under ``<output_path>/<epoch>/``."""
        for key, data in self.progress_samples.items():
            self.save_item(key, data, epoch)

    def save_item(self, key, data, epoch):
        """Writes one item with its format's saver."""
        import os

        target_path = os.path.join(self.output_path, str(epoch))
        os.makedirs(target_path, exist_ok=True)
        fmt = self.formats.get(key, self.DEFAULT_FORMAT)
        format_def = self.format_defs.get(fmt)
        if format_def is None:
            raise ValueError(f"Unsupported format {fmt}")
        file_name = os.path.join(
            target_path, f"{key}.{format_def['extension']}"
        )
        saver = format_def.get("saver")
        if saver is not None:
            saver(data, file_name, **format_def["kwargs"])


def plot_spectrogram(spectrogram, ap=None, fig_size=(16, 10), output_fig=False):
    """Matplotlib figure of a spectrogram, or None when matplotlib is
    absent (reference ``utils/train_logger.py:398``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        logger.warning("matplotlib not available - cannot plot")
        return None
    import numpy as np

    spectrogram = np.asarray(spectrogram, dtype=np.float32)
    fig = plt.figure(figsize=fig_size)
    plt.imshow(spectrogram, aspect="auto", origin="lower")
    plt.colorbar()
    plt.tight_layout()
    if not output_fig:
        plt.close(fig)
    return fig


def detach(data):
    """Detach a (possibly nested) structure of arrays from the autodiff
    graph (reference ``utils/train_logger.py``): in JAX, concretize to
    host numpy values.

    Example
    -------
    >>> import numpy as np
    >>> detach({"a": np.float32(1.0)})["a"]
    1.0
    """
    import numpy as np

    if isinstance(data, dict):
        return {k: detach(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(detach(v) for v in data)
    if hasattr(data, "item") and getattr(data, "ndim", 1) == 0:
        return data.item()
    if hasattr(data, "__array__"):
        return np.asarray(data)
    return data
