"""Samplers and loader: DistributedSampler semantics, weighted sampling,
prefetch loader mechanics."""

import numpy as np

from jepa_tpu.data.loader import DataLoader, ShardedSampler, WeightedShardedSampler


def test_sharded_sampler_partitions_and_reshuffles():
    samplers = [
        ShardedSampler(num_samples=103, rank=r, world_size=4, seed=1) for r in range(4)
    ]
    for s in samplers:
        s.set_epoch(0)
    parts = [list(s) for s in samplers]
    # drop_last: 100 usable, 25 per rank, disjoint
    assert all(len(p) == 25 for p in parts)
    allidx = sum(parts, [])
    assert len(set(allidx)) == 100
    # different epoch -> different permutation; same epoch -> identical
    samplers[0].set_epoch(1)
    assert list(samplers[0]) != parts[0]
    samplers[0].set_epoch(0)
    assert list(samplers[0]) == parts[0]


def test_weighted_sampler_respects_weights():
    # two datasets: weights 0.9 / 0.1 spread over their samples (reference
    # scheme dw/num_samples per sample)
    w = np.array([0.9 / 50] * 50 + [0.1 / 150] * 150)
    s = WeightedShardedSampler(weights=w, num_draws=20000, rank=0, world_size=1, seed=0)
    s.set_epoch(0)
    draws = np.fromiter(iter(s), dtype=np.int64)
    frac_first = np.mean(draws < 50)
    assert 0.85 < frac_first < 0.95  # ~0.9 of draws from dataset 1


def test_loader_prefetch_and_restart():
    class Squares:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i * i

    sampler = ShardedSampler(num_samples=10, rank=0, world_size=1, shuffle=False)
    loader = DataLoader(
        Squares(), sampler, batch_size=3, num_workers=2,
        collate=lambda items: list(items), drop_last=True,
    )
    assert len(loader) == 3
    a = [b for b in loader]
    assert a == [[0, 1, 4], [9, 16, 25], [36, 49, 64]]
    # iterating again restarts cleanly
    b = [b for b in loader]
    assert b == a
