"""On-chip pretrain-app smoke: app.main end to end on the real TPU —
native FFmpeg decode -> host loader -> jitted device augmentation ->
fused train step (bf16) -> orbax checkpoints. bench.py times the step in
isolation; this drives the whole production path.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/smoke_pretrain_tpu.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sys.path.insert(0, REPO)
    from jepa_tpu.native import videodec

    root = tempfile.mkdtemp(prefix="jepa_pretrain_smoke_")
    rows = []
    for i in range(12):
        p = os.path.join(root, f"v{i}.mp4")
        videodec.write_test_video(p, num_frames=64, width=200, height=150, seed=i)
        rows.append(f"{p} 0")
    train_csv = os.path.join(root, "train.csv")
    open(train_csv, "w").write("\n".join(rows) + "\n")

    cfg = {
        "app": "vjepa", "nodes": 1, "tasks_per_node": 1,
        "meta": {"seed": 7, "dtype": "bfloat16", "load_checkpoint": False,
                 "mask_mode": "fixed"},
        "model": {"model_name": "vit_tiny", "pred_depth": 2,
                  "pred_embed_dim": 96, "uniform_power": True,
                  "use_mask_tokens": True, "zero_init_mask_tokens": True},
        "data": {"datasets": [train_csv], "decode_backend": "native",
                 "batch_size": 4, "num_clips": 1, "num_frames": 4,
                 "sampling_rate": 2, "tubelet_size": 2, "crop_size": 128,
                 "patch_size": 16, "num_workers": 2},
        "data_aug": {"random_resize_aspect_ratio": [0.75, 1.35],
                     "random_resize_scale": [0.3, 1.0], "motion_shift": True,
                     "auto_augment": False, "reprob": 0.5},
        "loss": {"loss_exp": 1.0, "reg_coeff": 0.1},
        "mask": [{"num_blocks": 2, "spatial_scale": [0.4, 0.4],
                  "temporal_scale": [1.0, 1.0], "aspect_ratio": [0.75, 1.5],
                  "max_temporal_keep": 1.0, "max_keep": None}],
        "optimization": {"ipe": 4, "ipe_scale": 1.0, "epochs": 2, "warmup": 1,
                         "clip_grad": 10.0, "lr": 0.001, "start_lr": 0.0002,
                         "final_lr": 1.0e-05, "weight_decay": 0.04,
                         "final_weight_decay": 0.4, "ema": [0.99, 1.0]},
        "logging": {"folder": os.path.join(root, "out"), "write_tag": "tpusmoke"},
    }
    fname = os.path.join(root, "pretrain_tpu_smoke.yaml")
    yaml.safe_dump(cfg, open(fname, "w"))

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", "app.main", "--fname", fname],
                       cwd=REPO, env=env, capture_output=True, text=True)
    out = r.stdout + r.stderr
    print(out[-2000:])
    assert r.returncode == 0, r.returncode
    assert "saved checkpoint at epoch 2" in out
    assert "loss:" in out
    print("TPU PRETRAIN APP SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
