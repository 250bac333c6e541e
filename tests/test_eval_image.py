"""image_classification_frozen eval: end-to-end smoke on PIL fixture images
(image->tubelet replication through a video encoder)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for cls, base in (("class_a", 30), ("class_b", 200)):
            d = root / "imageset" / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = np.clip(
                    rng.normal(base, 25, size=(48, 64, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img{i}.png")
    return str(root)


def test_image_folder_dataset(image_root):
    from jepa_tpu.data.image_dataset import ImageFolder

    ds = ImageFolder(root=image_root, image_folder="imageset", train=True, output_size=40)
    assert len(ds) == 16
    img, label = ds[0]
    assert img.shape == (40, 40, 3) and img.dtype == np.uint8
    assert ds.class_to_idx == {"class_a": 0, "class_b": 1}


def test_image_eval_end_to_end(image_root, tmp_path, tiny_pretrain_ckpt):
    from jepa_tpu.evals.scaffold import main as eval_main

    cfg = {
        "eval_name": "image_classification_frozen",
        "pretrain": {
            "model_name": "vit_tiny",
            "checkpoint_key": "target_encoder",
            "folder": str(tmp_path),
            "checkpoint": tiny_pretrain_ckpt,
            "write_tag": "imgprobe",
            "patch_size": 16,
            "tubelet_size": 2,
            "frames_per_clip": 4,  # image->tubelet replication path
            "uniform_power": True,
        },
        "data": {
            "root_path": image_root,
            "image_folder": "imageset",
            "num_classes": 2,
            "resolution": 32,
            "num_workers": 2,
            "auto_augment": False,  # brightness-separable fixtures
        },
        "optimization": {
            # per-DEVICE: 8 virtual devices -> loader batch 8
            "batch_size": 1,
            "num_epochs": 3,
            "weight_decay": 0.01,
            "lr": 0.01,
            "start_lr": 0.002,
            "final_lr": 0.001,
            "warmup": 0.5,
            "use_bfloat16": False,
        },
    }
    val_accs = eval_main("image_classification_frozen", args_eval=cfg)
    assert len(val_accs) == 3
    sub = tmp_path / "image_classification_frozen"
    assert (sub / "imgprobe_r0.csv").exists()
    # brightness-separable classes: probe should do far better than chance
    assert val_accs[-1] >= 75.0, f"probe failed to learn: {val_accs}"
