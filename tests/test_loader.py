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


class _SlowDs:
    def __len__(self):
        return 64

    def __getitem__(self, i):
        import time

        time.sleep(0.005)
        return np.full((1, 2, 4, 4, 3), i % 256, np.uint8), i, None, None


def test_abandoned_consumer_does_not_wedge_producer():
    """Breaking out of the epoch loop must release the producer thread:
    bounded q.put re-checks the stop event instead of blocking forever
    (round-2 advisor leak)."""
    import threading
    import time

    from jepa_tpu.data.loader import DataLoader, ShardedSampler

    ds = _SlowDs()
    before = threading.active_count()
    for _ in range(5):
        loader = DataLoader(
            ds, ShardedSampler(num_samples=len(ds)), batch_size=4,
            num_workers=2, prefetch=1,
        )
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch -> GeneratorExit -> stop.set()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1, (
        f"leaked producer threads: {threading.active_count()} vs {before}"
    )


def test_process_pool_loader_matches_thread_loader(tmp_path):
    """use_processes=True decodes in a fork pool and yields identical
    batches (the GIL-releasing path for PIL-bound image decode)."""
    import pytest

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from jepa_tpu.data.image_dataset import make_image_loader

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / "imgs" / split / "cls0"
        d.mkdir(parents=True)
        for i in range(12):
            arr = rng.integers(0, 255, size=(40, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.png")

    batches = {}
    for procs in (False, True):
        _, loader, sampler = make_image_loader(
            root_path=str(tmp_path), image_folder="imgs", batch_size=4,
            training=False, output_size=32, num_workers=2,
            use_processes=procs,
        )
        batches[procs] = list(loader)
    assert len(batches[True]) == len(batches[False]) == 3
    for a, b in zip(batches[True], batches[False]):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_video_loader_run_to_run_deterministic(tmp_path):
    """Training streams must be bit-identical across runs, worker counts,
    and scheduling: dataset randomness (clip windows, retries) is keyed by
    (seed, epoch, index), never drawn from shared mutable rng state.
    Regression: a shared per-dataset rng raced across pool workers, so two
    identical pretrain invocations diverged at step 3 (round 5)."""
    from jepa_tpu.data.loader import make_video_loader

    # synthetic 300-frame videos >> clip window -> random window sampling
    # is ACTIVE (fpc 8 * step 4 = 32 of 150 frames per clip partition)
    csv = tmp_path / "train.csv"
    csv.write_text("".join(f"/synth/v{i}.mp4 {i % 2}\n" for i in range(12)))

    def run(num_workers, epoch):
        ds, loader, sampler = make_video_loader(
            data_paths=[str(csv)], batch_size=4, frames_per_clip=8,
            frame_step=4, num_clips=2, decode_backend="synthetic",
            num_workers=num_workers, seed=5,
        )
        sampler.set_epoch(epoch)
        return list(loader)

    a, b = run(2, 0), run(2, 0)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["clips"], y["clips"])
        np.testing.assert_array_equal(x["labels"], y["labels"])
        for ci_x, ci_y in zip(x["clip_indices"], y["clip_indices"]):
            np.testing.assert_array_equal(ci_x, ci_y)
    # invariant to worker count (torch needs fixed index->worker slices for
    # this; item-keyed rng makes it scheduling-independent by construction)
    for x, y in zip(a, run(1, 0)):
        np.testing.assert_array_equal(x["clips"], y["clips"])
    # a new epoch reshuffles AND resamples clip windows
    d = run(2, 1)
    assert any(
        x["clips"].shape != y["clips"].shape or not np.array_equal(x["clips"], y["clips"])
        for x, y in zip(a, d)
    )


def test_producer_exception_raises_in_consumer():
    """A collate/decode crash must surface in the epoch loop, not leave the
    consumer blocked on an empty queue forever."""
    import pytest

    from jepa_tpu.data.loader import DataLoader, ShardedSampler

    class BadDs:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("decode exploded")

    loader = DataLoader(
        BadDs(), ShardedSampler(num_samples=8), batch_size=4, num_workers=2
    )
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(iter(loader))
