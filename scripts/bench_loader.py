"""Loader throughput benchmark (CPU): is the input pipeline fast enough to
feed the chip?

Two measurements against the measured ViT-L encode rate (BENCH.md:
70.2 clips/s/chip on v5e, i.e. 342 ms per 24-clip eval batch — images cost
1/8 of a 16-frame clip after tubelet replication, so the image probe's
budget is ~560 img/s/chip):

  1. IN1K-shaped synthetic image probe: JPEG decode through the process-
     pool DataLoader (PIL holds the GIL; threads cannot scale this).
  2. Video: the native FFmpeg decoder through the threaded DataLoader on
     the synthetic fixture videos.

This box has ONE core, so the headline is per-core decode rate and the
core count needed to keep up with one chip — the production-sizing number
(the reference ships 12 torch workers per rank for the same reason,
reference video_dataset.py:77-85).

Usage: PYTHONPATH=/root/repo python scripts/bench_loader.py [--images N]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

ENCODE_CLIPS_PER_S = 70.2  # BENCH.md ViT-L frozen encode, v5e
IMGS_PER_CLIP_COST = 8  # a 16f/tubelet-2 clip = 8 image-tubelets of cost


def build_in1k_shaped(root: str, n: int, classes: int = 8) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(classes):
        d = os.path.join(root, "synth/train", f"class{c:03d}")
        os.makedirs(d, exist_ok=True)
    for i in range(n):
        # IN1K-shaped: ~500x375 quality-87 JPEGs (the train-set median)
        arr = rng.integers(0, 255, size=(375, 500, 3), dtype=np.uint8)
        d = os.path.join(root, "synth/train", f"class{i % classes:03d}")
        Image.fromarray(arr).save(os.path.join(d, f"img{i:05d}.jpg"), quality=87)


def bench_images(n: int) -> None:
    from jepa_tpu.data.image_dataset import make_image_loader

    with tempfile.TemporaryDirectory() as root:
        build_in1k_shaped(root, n)
        _, loader, _ = make_image_loader(
            root_path=root, image_folder="synth", batch_size=32, training=True,
            output_size=224, resize_short=256, num_workers=1, seed=0,
        )
        it = iter(loader)
        next(it)  # warm the pool
        t0 = time.perf_counter()
        seen = 32
        for batch in it:
            seen += batch["images"].shape[0]
        dt = time.perf_counter() - t0
        rate = (seen - 32) / dt
        budget = ENCODE_CLIPS_PER_S * IMGS_PER_CLIP_COST
        print(
            f"image probe: {rate:.1f} img/s/core (decode+resize+crop, "
            f"process pool) | chip budget {budget:.0f} img/s -> "
            f"{budget / rate:.1f} cores/chip to saturate"
        )


def bench_video() -> None:
    try:
        from jepa_tpu.native import videodec
        videodec._load()
    except Exception as e:
        print(f"video: native decoder unavailable ({e})")
        return
    from jepa_tpu.data.video_dataset import VideoDataset
    from jepa_tpu.data.loader import DataLoader, ShardedSampler, default_collate
    import csv

    tmpd = tempfile.mkdtemp(prefix="bench_loader_vid")
    paths = []
    for i in range(4):  # K400-shaped: ~300 frames, short side 256
        p = os.path.join(tmpd, f"vid{i}.mp4")
        videodec.write_test_video(p, num_frames=300, width=320, height=256, seed=i)
        paths.append(p)
    csv_path = os.path.join(tmpd, "videos.csv")
    with open(csv_path, "w", newline="") as f:
        wr = csv.writer(f, delimiter=" ")
        for p in paths * 16:
            wr.writerow([os.path.abspath(p), 0])
    ds = VideoDataset(
        data_paths=[csv_path], frames_per_clip=16, frame_step=4, num_clips=1,
    )
    sampler = ShardedSampler(num_samples=len(ds), shuffle=False, drop_last=True)
    loader = DataLoader(ds, sampler, batch_size=8, num_workers=2,
                        collate=default_collate, drop_last=True)
    it = iter(loader)
    first = next(it)
    t0 = time.perf_counter()
    seen = 0
    for batch in it:
        seen += 8
    dt = time.perf_counter() - t0
    rate = seen / dt
    print(
        f"video: {rate:.1f} clips/s/core (native decode, 16f) | chip budget "
        f"{ENCODE_CLIPS_PER_S:.0f} clips/s -> {ENCODE_CLIPS_PER_S / rate:.1f} "
        f"cores/chip (eval); pretrain budget 30 clips/s -> "
        f"{30 / rate:.1f} cores/chip"
    )


def main():
    n = 512
    if "--images" in sys.argv:
        n = int(sys.argv[sys.argv.index("--images") + 1])
    bench_images(n)
    bench_video()


if __name__ == "__main__":
    main()
