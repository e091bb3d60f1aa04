"""Samplers: reproducible shuffling, token-budget dynamic batching,
multi-host sharding.

The TPU-critical piece is :class:`DynamicBatchSampler`: it keeps the
reference's token-budget bucketing (reference ``dataio/sampler.py:307``)
but its buckets are by construction a FINITE menu of (batch_size,
time_boundary) shapes — pad each batch's time axis to its bucket
boundary and jit compiles exactly ``num_buckets+1`` programs.

Parity targets: reference ``dataio/sampler.py:30,112,188,307,707,745``.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "ReproducibleRandomSampler",
    "ReproducibleWeightedRandomSampler",
    "ConcatDatasetBatchSampler",
    "DynamicBatchSampler",
    "DistributedSamplerWrapper",
    "BalancingDataSampler",
    "SequentialSampler",
]


class SequentialSampler:
    """Yield indices 0..N-1 in order."""

    def __init__(self, data_source):
        self.data_source = data_source

    def __iter__(self):
        return iter(range(len(self.data_source)))

    def __len__(self):
        return len(self.data_source)


class ReproducibleRandomSampler:
    """Seeded shuffling that changes deterministically per epoch.

    ``set_epoch`` mirrors the reference/torch convention; the effective
    seed is ``seed + epoch``.

    Example
    -------
    >>> s = ReproducibleRandomSampler(range(5), seed=17)
    >>> a = list(s)
    >>> b = list(s)   # same epoch -> same order
    >>> a == b
    True
    >>> s.set_epoch(1)
    >>> c = list(s)
    >>> a == c
    False
    """

    def __init__(self, data_source, seed=563375142, epoch=0):
        if not isinstance(seed, int):
            raise ValueError(
                f"The seed must be an integer value, got {seed}"
            )
        self.data_source = data_source
        self.seed = int(seed)
        self.epoch = epoch

    def set_epoch(self, epoch):
        """Change the epoch (and thereby the shuffle order)."""
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        return iter(rng.permutation(len(self.data_source)).tolist())

    def __len__(self):
        return len(self.data_source)


class ReproducibleWeightedRandomSampler:
    """Seeded weighted sampling with replacement, epoch-varying.

    Example
    -------
    >>> weights = [0.0, 1.0, 0.0]
    >>> s = ReproducibleWeightedRandomSampler(weights, 4, replacement=True)
    >>> list(s)
    [1, 1, 1, 1]
    """

    def __init__(
        self,
        weights,
        num_samples,
        replacement=True,
        seed=129491412,
        epoch=0,
    ):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.num_samples = int(num_samples)
        self.replacement = replacement
        self.seed = int(seed)
        self.epoch = epoch

    def set_epoch(self, epoch):
        """Set the epoch for deterministic reshuffling."""
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        p = self.weights / self.weights.sum()
        idx = rng.choice(
            len(self.weights),
            size=self.num_samples,
            replace=self.replacement,
            p=p,
        )
        return iter(idx.tolist())

    def __len__(self):
        return self.num_samples


class ConcatDatasetBatchSampler:
    """Lockstep batch sampler over concatenated datasets.

    Each batch takes ``batch_sizes[i]`` samples from dataset i (offsets
    into the concatenated index space), keeping multi-corpus ratios
    fixed (reference ``dataio/sampler.py:188``).
    """

    def __init__(self, samplers, batch_sizes, epoch=0):
        if not isinstance(samplers, (list, tuple)) or not samplers:
            raise ValueError("samplers should be a non-empty list/tuple")
        if len(batch_sizes) != len(samplers):
            raise ValueError("batch_sizes and samplers must align")
        self.batch_sizes = batch_sizes
        self.samplers = samplers
        self.offsets = [0] + list(
            np.cumsum([len(x) for x in samplers])[:-1]
        )
        self.epoch = epoch
        self.set_epoch(self.epoch)

    def _iter_one_dataset(self, c_batch_size, c_sampler, c_offset):
        batch = []
        for idx in c_sampler:
            batch.append(c_offset + idx)
            if len(batch) == c_batch_size:
                yield batch
                batch = []

    def set_epoch(self, epoch):
        """Set the epoch for deterministic reshuffling."""
        if hasattr(self.samplers[0], "epoch"):
            for s in self.samplers:
                s.set_epoch(epoch)

    def __iter__(self):
        iterators = [iter(i) for i in self.samplers]
        tot_batch = []
        for b_num in range(len(self)):
            for samp_idx in range(len(self.samplers)):
                c_batch = []
                while len(c_batch) < self.batch_sizes[samp_idx]:
                    c_batch.append(
                        self.offsets[samp_idx] + next(iterators[samp_idx])
                    )
                tot_batch.extend(c_batch)
            yield tot_batch
            tot_batch = []

    def __len__(self):
        min_len = float("inf")
        for idx, sampler in enumerate(self.samplers):
            c_len = len(sampler) // self.batch_sizes[idx]
            min_len = min(c_len, min_len)
        return int(min_len)


class DynamicBatchSampler:
    """Token-budget batching by length buckets, with fixed shapes for XLA.

    Examples are assigned to buckets by length; each bucket's batch size
    is ``max_batch_length // boundary`` so every batch costs at most
    ``max_batch_length`` padded tokens.  Because bucket boundaries are a
    fixed menu, a downstream ``BatchShapePolicy(time_buckets=
    sampler.bucket_boundaries)`` yields a bounded set of compiled
    programs.

    Arguments
    ---------
    dataset : DynamicItemDataset
        Lengths are read from the manifest rows, NOT by loading audio.
    max_batch_length : int
        Token budget per batch (in length_func units).
    num_buckets : int, optional
        Number of buckets when boundaries are derived automatically.
    length_func : callable
        Maps a manifest row dict to a length (default: x["duration"]).
    shuffle : bool
        Shuffle examples (and batches) per epoch, seeded.
    batch_ordering : "random" | "ascending" | "descending" | "random_runs"
        "random_runs" shuffles like "random" but keeps same-bucket
        batches together in runs of up to ``run_length`` — feeding the
        fused steps-per-loop path (``steps_per_execute``) windows of
        identical compiled shape while remaining epoch-shuffled.
    max_batch_ex : int, optional
        Cap on examples per batch.
    run_length : int
        Run size for "random_runs" (match ``steps_per_execute``).
    bucket_boundaries : list, optional
        Explicit boundaries, overrides num_buckets.
    lengths_list : list, optional
        Explicit lengths (overrides length_func).
    epoch, seed, drop_last : as usual.
    """

    def __init__(
        self,
        dataset,
        max_batch_length,
        num_buckets=None,
        length_func=lambda x: x["duration"],
        shuffle=True,
        batch_ordering="random",
        max_batch_ex=None,
        bucket_boundaries=[],
        lengths_list=None,
        seed=42,
        epoch=0,
        drop_last=False,
        verbose=False,
        run_length=8,
    ):
        self._run_length = max(1, int(run_length))
        self._dataset = dataset
        self._ex_lengths = {}
        ex_ids = self._dataset.data_ids
        self.verbose = verbose

        if lengths_list is not None:
            for indx in range(len(lengths_list)):
                self._ex_lengths[str(indx)] = lengths_list[indx]
        else:
            for indx in range(len(self._dataset)):
                self._ex_lengths[str(indx)] = length_func(
                    self._dataset.data[ex_ids[indx]]
                )

        if bucket_boundaries:
            if not all([x >= 1 for x in bucket_boundaries]):
                raise ValueError(
                    "All elements in bucket boundaries should be >= 1."
                )
            if len(set(bucket_boundaries)) != len(bucket_boundaries):
                raise ValueError(
                    "Bucket_boundaries should not contain duplicates."
                )
            self._bucket_boundaries = np.array(sorted(bucket_boundaries))
        else:
            if num_buckets is None:
                raise ValueError(
                    "Please specify either num_buckets or bucket_boundaries"
                )
            self._bucket_boundaries = np.array(
                self._get_boundaries_through_warping(
                    max_batch_length=max_batch_length,
                    num_quantiles=num_buckets,
                )
            )

        self._max_batch_length = max_batch_length
        self._shuffle_ex = shuffle
        self._batch_ordering = batch_ordering
        self._seed = seed
        self._drop_last = drop_last
        if max_batch_ex is None:
            max_batch_ex = np.inf
        self._max_batch_ex = max_batch_ex
        # Batch size for each bucket (index len(boundaries) is the
        # catch-all bucket of batch size 1).
        self._bucket_lens = [
            max(1, int(max_batch_length / self._bucket_boundaries[i]))
            for i in range(len(self._bucket_boundaries))
        ] + [1]
        self._epoch = epoch
        self._generate_batches()

    @property
    def bucket_boundaries(self):
        """The time-bucket menu for BatchShapePolicy quantization."""
        return [int(np.ceil(b)) for b in self._bucket_boundaries] + [
            int(np.ceil(max(self._ex_lengths.values())))
        ]

    def get_durations(self, batch):
        """Durations (seconds) of the given example ids."""
        return [self._ex_lengths[str(idx)] for idx in batch]

    def _get_boundaries_through_warping(
        self, max_batch_length, num_quantiles
    ):
        """Lognormal-quantile bucket boundaries scaled to max_batch_length.

        Mirrors the reference's latent-space warping
        (``dataio/sampler.py:500-526``).
        """
        from scipy.stats import lognorm

        logger.info("Batch quantisation in latent space")
        # reference spacing: linspace(1/(Q+1), Q/(Q+1), Q)
        num_boundaries = num_quantiles + 1
        latent_boundaries = np.linspace(
            1 / num_boundaries,
            num_quantiles / num_boundaries,
            num_quantiles,
        )
        bucket_boundaries = lognorm.ppf(latent_boundaries, 1)
        bucket_boundaries = (
            bucket_boundaries * max_batch_length / bucket_boundaries[-1]
        )
        return list(sorted(bucket_boundaries))

    def _permute_batches(self):
        if self._batch_ordering == "random":
            rng = np.random.default_rng(self._seed + self._epoch)
            perm = rng.permutation(len(self._batches))
            self._batches = [self._batches[i] for i in perm]
        elif self._batch_ordering == "random_runs":
            # Shuffle, but emit same-shaped batches in runs of up to
            # run_length so fused multi-step windows stay full.
            rng = np.random.default_rng(self._seed + self._epoch)
            by_sig = {}
            for i, b in enumerate(self._batches):
                maxlen = max(self._ex_lengths[str(x)] for x in b)
                sig = (
                    len(b),
                    int(np.searchsorted(self._bucket_boundaries, maxlen)),
                )
                by_sig.setdefault(sig, []).append(i)
            runs = []
            for idxs in by_sig.values():
                rng.shuffle(idxs)
                for j in range(0, len(idxs), self._run_length):
                    runs.append(idxs[j : j + self._run_length])
            rng.shuffle(runs)
            self._batches = [
                self._batches[i] for run in runs for i in run
            ]
        elif self._batch_ordering in ("ascending", "descending"):
            reverse = self._batch_ordering == "descending"
            self._batches = sorted(
                self._batches,
                key=lambda b: max(
                    self._ex_lengths[str(i)] for i in b
                ),
                reverse=reverse,
            )
        else:
            raise NotImplementedError(
                f"Unknown batch_ordering: {self._batch_ordering}"
            )

    def _generate_batches(self):
        if self._shuffle_ex:
            rng = np.random.default_rng(self._seed + self._epoch)
            sampler = rng.permutation(len(self._dataset)).tolist()
        else:
            sampler = range(len(self._dataset))

        self._batches = []
        bucket_batches = [[] for _ in self._bucket_lens]
        for idx in sampler:
            item_len = self._ex_lengths[str(idx)]
            # Left bucket whose boundary >= item_len.
            bucket_id = int(
                np.searchsorted(self._bucket_boundaries, item_len)
            )
            bucket_batches[bucket_id].append(idx)
            if (
                len(bucket_batches[bucket_id])
                >= self._bucket_lens[bucket_id]
                or len(bucket_batches[bucket_id]) >= self._max_batch_ex
            ):
                self._batches.append(bucket_batches[bucket_id])
                bucket_batches[bucket_id] = []
        if not self._drop_last:
            for batch in bucket_batches:
                if batch:
                    self._batches.append(batch)
        self._permute_batches()

    def __iter__(self):
        for batch in self._batches:
            yield batch
        if self._shuffle_ex:
            self._generate_batches()
        if self._batch_ordering in ("random", "random_runs"):
            self._permute_batches()

    def set_epoch(self, epoch):
        """Set the epoch for deterministic reshuffling."""
        self._epoch = epoch
        self._generate_batches()

    def __len__(self):
        return len(self._batches)


class DistributedSamplerWrapper:
    """Shard any (batch or example) sampler across JAX processes.

    Each host takes a strided slice of the underlying order; feeding
    per-host batches of the GLOBAL batch (the host's shard) is handled
    by the dataloader + sharding (see parallel.sharding).
    """

    def __init__(self, sampler, num_replicas=None, rank=None, drop_last=True):
        import jax

        self.sampler = sampler
        self.num_replicas = (
            num_replicas if num_replicas is not None else jax.process_count()
        )
        self.rank = rank if rank is not None else jax.process_index()
        self.drop_last = drop_last

    def __iter__(self):
        items = list(self.sampler)
        if self.drop_last:
            usable = (len(items) // self.num_replicas) * self.num_replicas
            items = items[:usable]
        return iter(items[self.rank :: self.num_replicas])

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.num_replicas
        return (n + self.num_replicas - 1) // self.num_replicas

    def set_epoch(self, epoch):
        """Set the epoch for deterministic reshuffling."""
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)


class BalancingDataSampler(ReproducibleWeightedRandomSampler):
    """Weight examples inversely to their class frequency for a balanced
    stream (reference ``dataio/sampler.py:745``).
    """

    def __init__(
        self,
        dataset,
        key,
        num_samples=None,
        replacement=True,
        seed=563375142,
        epoch=0,
    ):
        self.dataset = dataset
        self.key = key
        if not num_samples:
            num_samples = len(dataset)
        weights = self._get_samples_weights()
        super().__init__(
            weights, num_samples, replacement, seed, epoch
        )

    def _get_samples_weights(self):
        import collections

        with self.dataset.output_keys_as([self.key]):
            labels = [
                self.dataset[i][self.key] for i in range(len(self.dataset))
            ]
        counts = collections.Counter(labels)
        weights = np.array(
            [1.0 / counts[label] for label in labels], dtype=np.float64
        )
        return weights
