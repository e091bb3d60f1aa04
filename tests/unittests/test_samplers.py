import numpy as np

from speechbrain_tpu.dataio.dataloader import SaveableDataLoader, make_dataloader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.sampler import (
    ConcatDatasetBatchSampler,
    DistributedSamplerWrapper,
    DynamicBatchSampler,
    ReproducibleRandomSampler,
)


def _toy_dataset(n=20, max_dur=10.0):
    rng = np.random.default_rng(0)
    data = {
        f"u{i}": {
            "duration": float(rng.uniform(1.0, max_dur)),
            "wav_data": np.zeros(int(rng.uniform(1.0, max_dur) * 10), dtype=np.float32),
        }
        for i in range(n)
    }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data"])
    return ds


def test_reproducible_sampler():
    s = ReproducibleRandomSampler(range(10), seed=1)
    assert list(s) == list(s)
    order0 = list(s)
    s.set_epoch(3)
    assert list(s) != order0
    assert sorted(list(s)) == list(range(10))


def test_dynamic_batch_sampler_budget():
    ds = _toy_dataset(50)
    sampler = DynamicBatchSampler(
        ds, max_batch_length=20, num_buckets=4, shuffle=True, seed=7
    )
    seen = []
    for batch in sampler:
        durations = sampler.get_durations(batch)
        # padded cost: batch_size * max duration <= budget (catch-all
        # bucket excepted: single examples are always allowed)
        if len(batch) > 1:
            assert len(batch) * max(durations) <= 20 * 1.5
        seen.extend(batch)
    assert sorted(seen) == list(range(50))


def test_dynamic_batch_sampler_epoch_reshuffle():
    ds = _toy_dataset(30)
    sampler = DynamicBatchSampler(
        ds, max_batch_length=15, num_buckets=3, shuffle=True, seed=3
    )
    b0 = [list(b) for b in sampler]
    sampler.set_epoch(1)
    b1 = [list(b) for b in sampler]
    assert b0 != b1
    flat0 = sorted(i for b in b0 for i in b)
    flat1 = sorted(i for b in b1 for i in b)
    assert flat0 == flat1


def test_dynamic_batch_sampler_random_runs():
    ds = _toy_dataset(60)
    sampler = DynamicBatchSampler(
        ds,
        max_batch_length=20,
        num_buckets=4,
        shuffle=True,
        seed=11,
        batch_ordering="random_runs",
        run_length=3,
    )

    def sig(batch):
        return (
            len(batch),
            int(
                np.searchsorted(
                    sampler._bucket_boundaries,
                    max(sampler.get_durations(batch)),
                )
            ),
        )

    batches = [list(b) for b in sampler]
    # same multiset of examples as any ordering
    assert sorted(i for b in batches for i in b) == list(range(60))
    # runs: count signature changes; with run_length 3 there must be
    # at most ceil(n_sig_batches/3) runs per signature
    from collections import Counter

    sigs = [sig(b) for b in batches]
    changes = 1 + sum(1 for a, b in zip(sigs, sigs[1:]) if a != b)
    per_sig = Counter(sigs)
    max_runs = sum(-(-c // 3) for c in per_sig.values())
    assert changes <= max_runs
    # deterministic per epoch, different across epochs
    sampler2 = DynamicBatchSampler(
        ds, max_batch_length=20, num_buckets=4, shuffle=True, seed=11,
        batch_ordering="random_runs", run_length=3,
    )
    assert [list(b) for b in sampler2] == batches
    sampler.set_epoch(1)
    assert [list(b) for b in sampler] != batches


def test_bucket_boundaries_finite():
    ds = _toy_dataset(30)
    sampler = DynamicBatchSampler(
        ds, max_batch_length=15, num_buckets=3, shuffle=False
    )
    menu = sampler.bucket_boundaries
    assert len(menu) == 4  # 3 buckets + catch-all
    for batch in sampler:
        durations = sampler.get_durations(batch)
        assert any(max(durations) <= b for b in menu)


def test_distributed_wrapper_partition():
    base = ReproducibleRandomSampler(range(16), seed=5)
    shards = [
        list(DistributedSamplerWrapper(base, num_replicas=4, rank=r))
        for r in range(4)
    ]
    all_indices = sorted(i for s in shards for i in s)
    assert all_indices == list(range(16))
    assert all(len(s) == 4 for s in shards)


def test_concat_sampler():
    s1 = ReproducibleRandomSampler(range(8), seed=1)
    s2 = ReproducibleRandomSampler(range(4), seed=2)
    cs = ConcatDatasetBatchSampler([s1, s2], [2, 1])
    batches = list(cs)
    assert len(batches) == 4
    for b in batches:
        assert len(b) == 3
        assert all(i < 8 for i in b[:2])
        assert all(8 <= i < 12 for i in b[2:])


def test_saveable_dataloader_position(tmp_path):
    from speechbrain_tpu.utils.checkpoints import Checkpointer

    ds = _toy_dataset(12)
    loader = SaveableDataLoader(ds, batch_size=2)
    ckptr = Checkpointer(tmp_path, {"loader": loader})
    it = iter(loader)
    next(it)
    next(it)  # consumed 2 batches
    ckptr.save_checkpoint(end_of_epoch=False)
    # New loader instance recovers and skips ahead
    loader2 = SaveableDataLoader(ds, batch_size=2)
    ckptr2 = Checkpointer(tmp_path, {"loader": loader2})
    ckptr2.recover_if_possible()
    remaining = list(loader2)
    assert len(remaining) == 4  # 6 total - 2 consumed


def test_make_dataloader_with_workers():
    ds = _toy_dataset(10)
    loader = make_dataloader(ds, batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    ids = [i for b in batches for i in b.id]
    assert sorted(ids) == sorted(f"u{i}" for i in range(10))
