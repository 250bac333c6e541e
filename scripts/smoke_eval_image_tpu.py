"""On-chip image-probe eval smoke: image_classification_frozen on the real
TPU — the image->tubelet replication path through a video encoder, PIL
image pipeline, bf16, flash path at resolution 128.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/smoke_eval_image_tpu.py
"""

from __future__ import annotations

import os
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from PIL import Image

    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import init_train_state
    from jepa_tpu.utils import checkpoint as ckpt_lib

    print("device:", jax.devices()[0], flush=True)
    root = tempfile.mkdtemp(prefix="jepa_img_smoke_")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for cls, base in (("class_a", 30), ("class_b", 200)):
            d = os.path.join(root, "imageset", split, cls)
            os.makedirs(d)
            for i in range(n):
                arr = np.clip(rng.normal(base, 25, size=(180, 220, 3)), 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"img{i}.png"))

    enc_cfg = vit_cfg("vit_tiny", img_size=128, patch_size=16, num_frames=4,
                      tubelet_size=2, uniform_power=True,
                      compute_dtype=jnp.float32, attn_impl="xla")
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=48, depth=1,
                                 num_mask_tokens=2)
    state, _ = init_train_state(jax.random.PRNGKey(7), enc_cfg, pred_cfg)
    ckpt_dir = os.path.join(root, "ckpt")
    ckpt_lib.save_checkpoint(ckpt_dir, "enc", jax.device_get(state), epoch=1)

    cfg = {
        "eval_name": "image_classification_frozen",
        "pretrain": {
            "model_name": "vit_tiny",
            "checkpoint_key": "target_encoder",
            "folder": root,
            "checkpoint": os.path.join(ckpt_dir, "enc-latest"),
            "write_tag": "imgprobe",
            "patch_size": 16,
            "tubelet_size": 2,
            "frames_per_clip": 4,  # image->tubelet replication path
            "uniform_power": True,
        },
        "data": {
            "root_path": root,
            "image_folder": "imageset",
            "num_classes": 2,
            "resolution": 128,
            "num_workers": 2,
            "auto_augment": False,
        },
        "optimization": {
            "batch_size": 4,
            "num_epochs": 3,
            "weight_decay": 0.01,
            "lr": 0.01,
            "start_lr": 0.002,
            "final_lr": 0.001,
            "warmup": 0.5,
            "use_bfloat16": True,
        },
    }

    from jepa_tpu.evals.scaffold import main as eval_main

    val_accs = eval_main("image_classification_frozen", args_eval=cfg)
    print("val accuracies per epoch:", val_accs, flush=True)
    assert len(val_accs) == 3
    assert val_accs[-1] >= 75.0, val_accs
    print("TPU IMAGE EVAL SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
