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


def test_dryrun_multichip_self_provisions_from_one_device():
    """Round-1 gate regression: the driver calls dryrun_multichip(8) in an
    environment with ONE device and no XLA_FLAGS; the entry must re-exec a
    CPU subprocess with 8 virtual devices rather than crash."""
    env = {k: v for k, v in os.environ.items()}
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH="", XLA_FLAGS="")
    out = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, env=env, timeout=500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in out.stdout
    assert "'fsdp': 2" in out.stdout  # the ZeRO-1 axis was exercised


def test_mesh_graceful_degradation():
    """make_mesh must degrade (never crash) on 1/2/7/8-device layouts."""
    import warnings

    import jax
    from jepa_tpu.parallel.mesh import make_mesh, make_mesh_for_batch

    devs = jax.devices()
    for n in (1, 2, 7, 8):
        m = make_mesh(devices=devs[:n])
        assert dict(m.shape) == {"data": n, "fsdp": 1}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = make_mesh(devices=devs[:1], fsdp=2)  # the driver's round-1 crash
        assert dict(m.shape) == {"data": 1, "fsdp": 1}
        m = make_mesh(devices=devs[:7], fsdp=2)
        assert dict(m.shape) == {"data": 7, "fsdp": 1}
        m = make_mesh(devices=devs[:8], fsdp=2)  # divides: no degradation
        assert dict(m.shape) == {"data": 4, "fsdp": 2}
        assert len(w) == 2 and all("fsdp" in str(x.message) for x in w)
    with pytest.raises(ValueError):
        make_mesh(data=3, fsdp=2, devices=devs[:8])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = make_mesh_for_batch(7, devices=devs[:8])  # gcd(8,7)=1 -> idles 7
        assert dict(m.shape) == {"data": 1, "fsdp": 1}
        assert any("idling" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = make_mesh_for_batch(16, devices=devs[:8])  # device-multiple: quiet
        assert dict(m.shape) == {"data": 8, "fsdp": 1}
        assert not w


def test_reference_eval_yaml_drives_full_mesh():
    """VERDICT round-2 item 4: optimization.batch_size in the reference eval
    YAMLs is per-device; on an 8-device host vitl16_k400_16x8x3.yaml (batch 4)
    must shard a local batch of 32 over all 8 devices with zero idling and
    no warning."""
    import warnings

    import yaml

    import jax
    from jepa_tpu.parallel.mesh import eval_batch_geometry

    cfg = yaml.safe_load(open("configs/evals/vitl16_k400_16x8x3.yaml"))
    per_device = int(cfg["optimization"]["batch_size"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh, local_batch = eval_batch_geometry(per_device)
    assert not w, [str(x.message) for x in w]
    assert mesh.devices.size == jax.device_count() == 8
    assert local_batch == per_device * 8 == 32
    assert local_batch % mesh.shape["data"] == 0
