"""Torch-free prefetching dataloader with checkpointable position.

The host data path is deliberately simple: a thread pool evaluates the
per-example pipeline DAG, batches are collated to (bucketed) fixed
shapes, and a bounded queue prefetches ahead of the device step.  The
device transfer itself happens in the Brain (jit donates the buffers).

Parity targets: reference ``dataio/dataloader.py:70`` (make_dataloader),
``:192`` (SaveableDataLoader), ``:274`` (LoopedLoader).
"""

import collections
import logging
import queue
import threading

from speechbrain_tpu.dataio.batch import PaddedBatch
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.sampler import (
    ReproducibleRandomSampler,
    SequentialSampler,
)
from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)

logger = logging.getLogger(__name__)

__all__ = ["DataLoader", "SaveableDataLoader", "LoopedLoader", "make_dataloader"]


class DataLoader:
    """Iterates a dataset in collated batches.

    Arguments
    ---------
    dataset : map-style dataset (``__getitem__``/``__len__``) or iterable
    batch_size : int
    shuffle : bool
        Use a ReproducibleRandomSampler when no sampler given.
    sampler : example sampler, optional
    batch_sampler : yields lists of indices, optional
    collate_fn : callable, default PaddedBatch
    drop_last : bool
    num_workers : int
        Worker THREADS computing examples (audio decode releases the
        GIL in numpy/file IO).  0 = synchronous.
    prefetch_batches : int
        Bounded queue depth of collated batches prepared ahead.
    """

    def __init__(
        self,
        dataset,
        batch_size=1,
        shuffle=False,
        sampler=None,
        batch_sampler=None,
        collate_fn=None,
        drop_last=False,
        num_workers=0,
        prefetch_batches=2,
        seed=563375142,
        **kwargs,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch_batches = max(1, prefetch_batches)
        if collate_fn is None:
            if isinstance(dataset, DynamicItemDataset) or (
                hasattr(dataset, "__getitem__")
                and hasattr(dataset, "pipeline")
            ):
                collate_fn = PaddedBatch
            else:
                collate_fn = _identity_collate
        self.collate_fn = collate_fn
        if batch_sampler is not None:
            if sampler is not None or shuffle:
                raise ValueError(
                    "batch_sampler is mutually exclusive with sampler/shuffle"
                )
            self.batch_sampler = batch_sampler
            self.sampler = None
        else:
            if sampler is None:
                if shuffle:
                    sampler = ReproducibleRandomSampler(dataset, seed=seed)
                else:
                    sampler = SequentialSampler(dataset)
            self.sampler = sampler
            self.batch_sampler = None

    def _batches_of_indices(self):
        if self.batch_sampler is not None:
            yield from iter(self.batch_sampler)
            return
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, indices):
        examples = [self.dataset[i] for i in indices]
        return self.collate_fn(examples)

    def __iter__(self):
        if self.num_workers <= 0:
            for indices in self._batches_of_indices():
                yield self._make_batch(indices)
            return
        yield from self._prefetching_iter(skip_batches=0)

    def _prefetching_iter(self, skip_batches=0):
        """Ordered multi-worker prefetching.

        ``num_workers`` threads each claim whole batches (index lists)
        from a shared iterator and run decode + pipeline + collate
        concurrently — the native decoders release the GIL, so batch
        building genuinely parallelizes (round 5: a single producer
        thread capped the host pipeline at ~600 utt/s against a
        1550 utt/s 2-thread decode ceiling).  Batches are emitted to
        the consumer IN ORDER (checkpoint positions stay exact); a
        worker runs at most ``prefetch_batches`` ahead of the consumer
        to bound memory.
        """
        n_workers = max(1, int(self.num_workers))
        window = max(int(self.prefetch_batches), n_workers)
        stop = threading.Event()
        lock = threading.Lock()  # guards job_iter
        cond = threading.Condition()  # guards results / counters
        job_iter = enumerate(self._batches_of_indices())
        results = {}
        state = {"next": skip_batches, "active": n_workers}

        def worker():
            try:
                while not stop.is_set():
                    with lock:
                        try:
                            i, indices = next(job_iter)
                        except StopIteration:
                            break
                    if i < skip_batches:
                        continue
                    with cond:
                        while (
                            i - state["next"] >= window
                            and not stop.is_set()
                        ):
                            cond.wait(0.2)
                    if stop.is_set():
                        break
                    batch = self._make_batch(indices)
                    with cond:
                        results[i] = (batch, None)
                        cond.notify_all()
            except Exception as e:  # pragma: no cover
                with cond:
                    results[i] = (None, e)
                    cond.notify_all()
            finally:
                with cond:
                    state["active"] -= 1
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(n_workers)
        ]
        for t in threads:
            t.start()
        try:
            while True:
                with cond:
                    i = state["next"]
                    while i not in results and state["active"] > 0:
                        cond.wait(0.2)
                    if i not in results:
                        break  # all workers done: epoch exhausted
                    batch, err = results.pop(i)
                    state["next"] = i + 1
                    cond.notify_all()
                if err is not None:
                    raise err
                yield batch
        finally:
            stop.set()
            with cond:
                cond.notify_all()


def _identity_collate(examples):
    return examples


@register_checkpoint_hooks
class SaveableDataLoader(DataLoader):
    """DataLoader that checkpoints its mid-epoch iteration position.

    On recovery inside an epoch, the loader skips ahead to the saved
    batch position (indices are re-drawn from the same seeded sampler,
    so the skipped examples are exactly those already trained on).
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._speechbrain_recovery_skip_to = None
        self._speechbrain_iterator_position = None
        # Set by Brain._staged_iter: the position actually CONSUMED by
        # training when a staging thread runs this loader ahead of the
        # fit loop (saving the raw iterator position would over-report
        # progress by up to staging_depth batches on mid-epoch resume).
        self._speechbrain_staged_position = None

    def __iter__(self):
        skip = 0
        if self._speechbrain_recovery_skip_to is not None:
            skip = self._speechbrain_recovery_skip_to
            self._speechbrain_recovery_skip_to = None
            logger.info(f"Dataloader skipping {skip} batches after recovery")
        self._speechbrain_iterator_position = skip
        if self.num_workers <= 0:
            for i, indices in enumerate(self._batches_of_indices()):
                if i < skip:
                    continue
                batch = self._make_batch(indices)
                self._speechbrain_iterator_position = i + 1
                yield batch
        else:
            for batch in self._prefetching_iter(skip_batches=skip):
                self._speechbrain_iterator_position += 1
                yield batch
        self._speechbrain_iterator_position = None

    @mark_as_saver
    def _save(self, path):
        pos = getattr(self, "_speechbrain_staged_position", None)
        if pos is None:
            pos = self._speechbrain_iterator_position
        with open(path, "w") as f:
            f.write(str(pos if pos is not None else -1))

    @mark_as_loader
    def _recover(self, path, end_of_epoch=True):
        with open(path) as f:
            pos = int(f.read())
        if end_of_epoch or pos < 0:
            self._speechbrain_recovery_skip_to = None
        else:
            self._speechbrain_recovery_skip_to = pos


@register_checkpoint_hooks
class LoopedLoader:
    """Nominal epochs over an infinite/streaming loader.

    Example
    -------
    >>> import itertools
    >>> base = itertools.count()  # infinite stream
    >>> loader = LoopedLoader(base, epoch_length=3)
    >>> list(loader)
    [0, 1, 2]
    >>> list(loader)
    [3, 4, 5]
    """

    def __init__(self, loader, epoch_length, batchsize_fn=None):
        self.loader = loader
        self.iterator = None
        self.epoch_length = epoch_length
        self.step = 0
        self.total_steps = 0
        if batchsize_fn is None:
            batchsize_fn = lambda batch: 1  # noqa: E731
        self.batchsize_fn = batchsize_fn
        self.total_samples = 0

    def __iter__(self):
        if self.iterator is None:
            self.iterator = iter(self.loader)
        return self

    def __next__(self):
        if self.step < self.epoch_length:
            self.step += 1
            self.total_steps += 1
            try:
                batch = next(self.iterator)
            except StopIteration:
                self.iterator = iter(self.loader)
                batch = next(self.iterator)
            self.total_samples += self.batchsize_fn(batch)
            return batch
        self.step = 0
        raise StopIteration

    def __len__(self):
        return self.epoch_length

    @mark_as_saver
    def _save(self, path):
        with open(path, "w") as f:
            print(self.step, file=f)
            print(self.total_steps, file=f)
            print(self.total_samples, file=f)

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        with open(path) as f:
            self.step = int(f.readline().strip())
            self.total_steps = int(f.readline().strip())
            self.total_samples = int(f.readline().strip())
        if not end_of_epoch and self.step == 0 and self.total_steps > 0:
            # Mid-epoch load, past epoch boundary: treat as at boundary.
            self.step = self.epoch_length


@register_checkpoint_hooks
class SaveableStreamLoader:
    """Batches from an IterableDataset-style stream with the
    SaveableDataLoader's mid-epoch position semantics.

    The role of the reference's webdataset path in ``make_dataloader``
    (reference ``dataio/dataloader.py:52-66``): a streaming source
    (generator function, iterable of example dicts) is either routed
    through ``iterators.dynamic_bucketed_batch`` (when
    ``dynamic_batching_kwargs`` is given) or chunked into fixed-size
    batches, collated (PaddedBatch by default), and checkpointed by
    batch position so in-epoch recovery skips exactly the batches
    already trained on (streams must be deterministic across restarts
    for exact resume, the same contract the reference documents).

    Arguments
    ---------
    stream : iterable | callable -> iterable
        The example-dict source.  A callable is invoked at each epoch
        start (fresh generator per epoch); a plain iterable is passed
        through ``iter()`` each epoch.
    batch_size : int
        Fixed chunk size when not dynamically batching.
    collate_fn : callable
        Applied to each list of examples (default PaddedBatch).
    dynamic_batching_kwargs : dict, optional
        Kwargs for ``dynamic_bucketed_batch`` (len_key,
        max_batch_numel, buffersize, ...); enables pivot bucketing.

    Example
    -------
    >>> import numpy as np
    >>> def corpus():
    ...     for i in range(5):
    ...         yield {"id": str(i), "x": np.ones(3) * i}
    >>> loader = SaveableStreamLoader(corpus, batch_size=2)
    >>> [len(b["id"]) for b in loader]
    [2, 2, 1]
    """

    def __init__(
        self,
        stream,
        batch_size=1,
        collate_fn=None,
        dynamic_batching_kwargs=None,
    ):
        self.stream = stream
        self.batch_size = batch_size
        self.collate_fn = collate_fn or PaddedBatch
        self.dynamic_batching_kwargs = dynamic_batching_kwargs
        self._speechbrain_recovery_skip_to = None
        self._speechbrain_iterator_position = None

    def _batches(self):
        source = (
            self.stream() if callable(self.stream) else iter(self.stream)
        )
        if self.dynamic_batching_kwargs is not None:
            from speechbrain_tpu.dataio.iterators import (
                dynamic_bucketed_batch,
            )

            yield from dynamic_bucketed_batch(
                source, self.collate_fn, **self.dynamic_batching_kwargs
            )
            return
        buf = []
        for example in source:
            buf.append(example)
            if len(buf) == self.batch_size:
                yield self.collate_fn(buf)
                buf = []
        if buf:
            yield self.collate_fn(buf)

    def __iter__(self):
        skip = 0
        if self._speechbrain_recovery_skip_to is not None:
            skip = self._speechbrain_recovery_skip_to
            self._speechbrain_recovery_skip_to = None
            logger.info(
                f"Stream loader skipping {skip} batches after recovery"
            )
        self._speechbrain_iterator_position = skip
        for i, batch in enumerate(self._batches()):
            if i < skip:
                continue
            self._speechbrain_iterator_position = i + 1
            yield batch
        self._speechbrain_iterator_position = None

    @mark_as_saver
    def _save(self, path):
        pos = getattr(self, "_speechbrain_staged_position", None)
        if pos is None:
            pos = self._speechbrain_iterator_position
        with open(path, "w") as f:
            f.write(str(pos if pos is not None else -1))

    @mark_as_loader
    def _recover(self, path, end_of_epoch=True):
        with open(path) as f:
            pos = int(f.read())
        if end_of_epoch or pos < 0:
            self._speechbrain_recovery_skip_to = None
        else:
            self._speechbrain_recovery_skip_to = pos


def make_dataloader(dataset, looped_nominal_epoch=None, **loader_kwargs):
    """Make a loader suitable for ``dataset`` (the Brain calls this).

    DynamicItemDatasets get PaddedBatch collation automatically; pass
    ``shape_policy`` through ``collate_kwargs`` for bucketed shapes.
    """
    collate_kwargs = loader_kwargs.pop("collate_kwargs", None)
    if collate_kwargs and "collate_fn" not in loader_kwargs:
        loader_kwargs["collate_fn"] = lambda ex: PaddedBatch(
            ex, **collate_kwargs
        )
    # Streaming sources (generator function / iterable without
    # __getitem__) take the reference's webdataset route: stream ->
    # (dynamic bucketing) -> collate, with saveable position.
    if callable(dataset) or (
        hasattr(dataset, "__iter__")
        and not hasattr(dataset, "__getitem__")
    ):
        dataloader = SaveableStreamLoader(
            dataset,
            batch_size=loader_kwargs.get("batch_size", 1),
            collate_fn=loader_kwargs.get("collate_fn"),
            dynamic_batching_kwargs=loader_kwargs.get(
                "dynamic_batching_kwargs"
            ),
        )
        if looped_nominal_epoch is not None:
            dataloader = LoopedLoader(dataloader, looped_nominal_epoch)
        return dataloader
    dataloader = SaveableDataLoader(dataset, **loader_kwargs)
    if looped_nominal_epoch is not None:
        dataloader = LoopedLoader(dataloader, looped_nominal_epoch)
    return dataloader
