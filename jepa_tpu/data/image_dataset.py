"""ImageFolder dataset (PIL) for the frozen image-classification probes.

Reference wraps torchvision.datasets.ImageFolder rooted at
root/image_folder/{train,val} (reference: src/datasets/image_dataset.py:
19-79). Here: a torchvision-free implementation — classes are the sorted
subdirectory names; images load through PIL and are emitted as fixed-size
uint8 arrays so batches stack for device-side augmentation.

Host-side geometry only (resize/center-crop); photometric augmentation and
normalization run jitted on device (jepa_tpu/data/transforms.py).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import List, Optional, Tuple

import numpy as np

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")


def _resize_short_side(img, size: int):
    w, h = img.size
    scale = size / min(w, h)
    return img.resize((max(size, int(round(w * scale))), max(size, int(round(h * scale)))), 2)  # BILINEAR


def _center_crop(arr: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w = arr.shape[:2]
    i = max(0, (h - ch) // 2)
    j = max(0, (w - cw) // 2)
    return arr[i : i + ch, j : j + cw]


@dataclasses.dataclass
class ImageFolder:
    """root/image_folder/{train|val}/<class>/<img>; returns (uint8 HWC, label)."""

    root: str
    image_folder: str = "imagenet_full_size/061417/"
    train: bool = True
    output_size: int = 256
    resize_short: Optional[int] = None  # default: output_size

    def __post_init__(self):
        split = "train" if self.train else "val"
        self.data_path = os.path.join(self.root, self.image_folder, split)
        classes = sorted(
            d for d in os.listdir(self.data_path)
            if os.path.isdir(os.path.join(self.data_path, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(self.data_path, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(_EXTS):
                    self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no images under {self.data_path}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        from PIL import Image

        # corrupt-file retry rng keyed by the requested index: deterministic
        # across runs/workers (one chain, so repeated failures keep drawing)
        retry = np.random.default_rng((7, index))
        while True:
            path, label = self.samples[index]
            try:
                with Image.open(path) as im:
                    im = im.convert("RGB")
                    im = _resize_short_side(
                        im, self.resize_short or self.output_size)
                    arr = np.asarray(im, dtype=np.uint8)
                break
            except Exception as e:
                warnings.warn(f"failed to load image {path}: {e}")
                index = int(retry.integers(0, len(self)))
        arr = _center_crop(arr, self.output_size, self.output_size)
        return arr, label


def image_collate(items):
    imgs = np.stack([it[0] for it in items])
    labels = np.asarray([it[1] for it in items])
    return {"images": imgs, "labels": labels}


def make_image_loader(
    *,
    root_path: str,
    image_folder: str,
    batch_size: int,
    training: bool,
    output_size: int = 256,
    resize_short: Optional[int] = None,
    rank: int = 0,
    world_size: int = 1,
    num_workers: int = 8,
    seed: int = 0,
    drop_last: bool = None,
    use_processes: bool = None,
):
    from jepa_tpu.data.loader import DataLoader, ShardedSampler

    ds = ImageFolder(
        root=root_path, image_folder=image_folder, train=training,
        output_size=output_size, resize_short=resize_short,
    )
    if drop_last is None:
        drop_last = training
    if use_processes is None:
        # PIL JPEG decode holds the GIL: multi-worker image loading needs
        # real processes to scale (reference: torch DataLoader workers)
        use_processes = num_workers > 1
    sampler = ShardedSampler(
        num_samples=len(ds), rank=rank, world_size=world_size,
        shuffle=training, seed=seed, drop_last=drop_last,
    )
    loader = DataLoader(
        ds, sampler, batch_size=batch_size, num_workers=num_workers,
        collate=image_collate, drop_last=drop_last,
        use_processes=use_processes,
    )
    return ds, loader, sampler
