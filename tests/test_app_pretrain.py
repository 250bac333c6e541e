"""End-to-end pretrain app: smoke config through the real entry path,
checkpoint + resume, CSV logging — the integration test tier (SURVEY §4)."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture()
def smoke_cfg(tmp_path):
    with open(os.path.join(os.path.dirname(__file__), "fixtures", "pretrain_smoke.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["logging"]["folder"] = str(tmp_path)
    return cfg


def test_pretrain_end_to_end_and_resume(smoke_cfg, tmp_path):
    from jepa_tpu.apps.vjepa.train import main as train_main

    state = train_main(smoke_cfg)
    assert int(state["step"]) == 6  # 2 epochs x ipe 3

    # artifacts
    csv = tmp_path / "smoke_r0.csv"
    assert csv.exists()
    rows = csv.read_text().strip().splitlines()
    assert rows[0].startswith("epoch,itr,loss")
    assert len(rows) == 1 + 6
    losses = [float(r.split(",")[2]) for r in rows[1:]]
    assert all(np.isfinite(losses))
    assert (tmp_path / "params-pretrain.yaml").exists()
    assert (tmp_path / "smoke-latest").exists()

    # resume: bump epochs to 3, rerun -> starts at epoch 2, ends step 9
    smoke_cfg["optimization"]["epochs"] = 3
    state2 = train_main(smoke_cfg)
    assert int(state2["step"]) == 9
    rows2 = (tmp_path / "smoke_r0.csv").read_text().strip().splitlines()
    # 6 original + 3 resumed rows (+1 re-written header line)
    assert sum(r.startswith("3,") for r in rows2) == 3


def test_pretrain_unroll_blocks_mode_and_stacked_resume(smoke_cfg, tmp_path):
    """meta.unroll_blocks trains with per-layer block state but writes the
    canonical STACKED checkpoint layout, so runs can switch layouts across
    restarts: unrolled epoch 1 -> stacked resume epoch 2 -> unrolled
    resume epoch 3."""
    from jepa_tpu.apps.vjepa.train import main as train_main

    smoke_cfg["meta"]["unroll_blocks"] = True
    smoke_cfg["optimization"]["epochs"] = 1
    smoke_cfg["logging"]["folder"] = str(tmp_path / "unroll")
    state = train_main(smoke_cfg)
    assert int(state["step"]) == 3
    assert isinstance(state["params"]["encoder"]["blocks"], (list, tuple))

    smoke_cfg["meta"]["unroll_blocks"] = False
    smoke_cfg["optimization"]["epochs"] = 2
    state2 = train_main(smoke_cfg)
    assert int(state2["step"]) == 6
    assert not isinstance(state2["params"]["encoder"]["blocks"], (list, tuple))

    smoke_cfg["meta"]["unroll_blocks"] = True
    smoke_cfg["optimization"]["epochs"] = 3
    state3 = train_main(smoke_cfg)
    assert int(state3["step"]) == 9
    assert isinstance(state3["params"]["encoder"]["blocks"], (list, tuple))


def test_pretrain_padded_parity_mode(smoke_cfg, tmp_path):
    from jepa_tpu.apps.vjepa.train import main as train_main

    smoke_cfg["meta"]["mask_mode"] = "padded"
    smoke_cfg["optimization"]["epochs"] = 1
    smoke_cfg["logging"]["folder"] = str(tmp_path / "padded")
    state = train_main(smoke_cfg)
    assert int(state["step"]) == 3
