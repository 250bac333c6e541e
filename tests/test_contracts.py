"""Contract tests for driver-facing surfaces: every shipped config parses
and resolves, bench.py emits its one-line JSON, graft entries run."""

import json
import glob
import os
import subprocess
import sys

import pytest
import yaml


def test_all_shipped_configs_parse_and_resolve():
    from jepa_tpu.masks.multiblock3d import MaskSpec
    from jepa_tpu.models.factory import vit_cfg

    pretrain = sorted(glob.glob("configs/pretrain/*.yaml"))
    evals = sorted(glob.glob("configs/evals/*.yaml"))
    assert len(pretrain) == 3 and len(evals) == 15

    for p in pretrain:
        cfg = yaml.safe_load(open(p))
        assert cfg["app"] == "vjepa"
        model = cfg["model"]
        enc = vit_cfg(
            model["model_name"],
            img_size=cfg["data"]["crop_size"],
            patch_size=cfg["data"]["patch_size"],
            num_frames=cfg["data"]["num_frames"],
            tubelet_size=cfg["data"]["tubelet_size"],
            uniform_power=model["uniform_power"],
        )
        assert enc.num_patches > 0
        specs = [MaskSpec.from_cfg(m) for m in cfg["mask"]]
        assert len(specs) == 2
        opt = cfg["optimization"]
        for key in ("ipe", "epochs", "warmup", "lr", "start_lr", "final_lr",
                    "weight_decay", "final_weight_decay", "ema"):
            assert key in opt, f"{p} missing optimization.{key}"

    for p in evals:
        cfg = yaml.safe_load(open(p))
        assert cfg["eval_name"] in (
            "video_classification_frozen", "image_classification_frozen",
        )
        assert "pretrain" in cfg and "optimization" in cfg and "data" in cfg
        vit_cfg(cfg["pretrain"]["model_name"])  # model resolves
        assert cfg["pretrain"]["checkpoint_key"] == "target_encoder"


def test_bench_emits_json_contract():
    env = {k: v for k, v in os.environ.items()}
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, timeout=500, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["value"] > 0


def test_graft_entry_contract():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 1568, 1024)
    g.dryrun_multichip(8)
    g.dryrun_multichip(2)
