"""Fused train step: AdamW parity vs torch, learning dynamics, sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, resolve_keep_counts
from jepa_tpu.masks.padding import pad_masks
from jepa_tpu.models.factory import predictor_cfg_for
from jepa_tpu.models.vit import ViTCfg
from jepa_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from jepa_tpu.train.optimizer import adamw_update, decay_mask, ema_update, init_adamw_state
from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
from jepa_tpu.utils.schedulers import build_schedules

ENC = ViTCfg(
    img_size=16, patch_size=8, num_frames=4, tubelet_size=2,
    embed_dim=32, depth=2, num_heads=2, compute_dtype=jnp.float32, attn_impl="xla",
)
GRID = MaskGrid(t=2, h=2, w=2)
SPECS = [MaskSpec(aspect_ratio=(1.0, 1.0), num_blocks=1, spatial_scale=(0.5, 0.5))]


def _schedules(ipe=10, epochs=3):
    return build_schedules(
        ipe=ipe, num_epochs=epochs, warmup_epochs=1,
        start_lr=1e-4, ref_lr=1e-3, final_lr=1e-5,
        wd=0.04, final_wd=0.4, ema=(0.9, 1.0), ipe_scale=1.0,
    )


def _setup(mask_mode="fixed", num_clips=1, batch=2):
    pred_cfg = predictor_cfg_for(ENC, predictor_embed_dim=16, depth=1, num_mask_tokens=len(SPECS))
    state, consts = init_train_state(jax.random.PRNGKey(0), ENC, pred_cfg)
    tc = TrainCfg(
        loss_exp=1.0, reg_coeff=0.1, clip_grad=10.0, clip_after_step=0,
        num_clips=num_clips, batch_size=batch, mask_mode=mask_mode, seed=7,
    )
    lr_s, wd_s, mom_s = _schedules()
    kc = [resolve_keep_counts(s, GRID) for s in SPECS]
    fn = build_train_step(ENC, pred_cfg, consts, tc, lr_s, wd_s, mom_s, SPECS, GRID, kc)
    return state, fn


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 4)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    params = {"lin": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}
    opt = init_adamw_state(params)
    mask = decay_mask(params)
    # torch twin: group0 decayed weight, group1 excluded bias
    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b.copy()))
    topt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": 0.3}, {"params": [tb], "weight_decay": 0.0}],
        lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
    )
    for step in range(1, 6):
        gw = rng.normal(size=w.shape).astype(np.float32)
        gb = rng.normal(size=b.shape).astype(np.float32)
        grads = {"lin": {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}}
        params, opt, _ = adamw_update(
            params, grads, opt, lr=1e-2, wd=0.3, mask=mask, step=step
        )
        tw.grad = torch.from_numpy(gw)
        tb.grad = torch.from_numpy(gb)
        topt.step()
        topt.zero_grad()
    np.testing.assert_allclose(np.asarray(params["lin"]["w"]), tw.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["lin"]["b"]), tb.detach().numpy(), atol=1e-6)


def test_decay_mask_rules():
    params = {
        "patch_embed": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
        "blocks": {
            "ln1": {"scale": jnp.zeros((2, 4)), "bias": jnp.zeros((2, 4))},
            "attn": {"qkv_w": jnp.zeros((2, 4, 12)), "qkv_b": jnp.zeros((2, 12))},
        },
        "mask_tokens": jnp.zeros((2, 4)),
    }
    m = decay_mask(params)
    assert float(m["patch_embed"]["w"]) == 1.0
    assert float(m["patch_embed"]["b"]) == 0.0
    assert float(m["blocks"]["ln1"]["scale"]) == 0.0
    assert float(m["blocks"]["ln1"]["bias"]) == 0.0
    assert float(m["blocks"]["attn"]["qkv_w"]) == 1.0
    assert float(m["blocks"]["attn"]["qkv_b"]) == 0.0
    assert float(m["mask_tokens"]) == 1.0  # reference decays mask tokens


def test_ema_update_direction():
    t = {"a": jnp.ones((3,))}
    q = {"a": jnp.zeros((3,))}
    out = ema_update(t, q, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)


def test_train_step_learns_and_updates_ema():
    state, fn = _setup()
    fn = jax.jit(fn)
    clips = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    target0 = jax.tree.leaves(state["target"])[0].copy()
    losses = []
    for _ in range(3):
        state, metrics = fn(state, {"clips": clips})
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state["step"]) == 3
    # online params changed; EMA target moved but less than online
    p0 = np.asarray(target0)
    p_online = np.asarray(jax.tree.leaves(state["params"]["encoder"])[0])
    p_target = np.asarray(jax.tree.leaves(state["target"])[0])
    assert not np.allclose(p0, p_online)
    assert not np.allclose(p_target, p0)
    online_delta = np.abs(p_online - p0).mean()
    target_delta = np.abs(p_target - p0).mean()
    assert target_delta < online_delta
    assert float(metrics["lr"]) > 0 and 0.9 <= float(metrics["ema_momentum"]) <= 1.0


def test_unrolled_grads_match_scan():
    """unroll_grads=True (per-layer grad trees, Python-loop forward, grads
    restacked with one concatenate per leaf) must be numerically identical
    to the lax.scan path: same math, different HLO. This is the mode that
    kills the scan-transpose grad-stack DUS copies on TPU (BENCH.md r4)."""
    pred_cfg = predictor_cfg_for(ENC, predictor_embed_dim=16, depth=2,
                                 num_mask_tokens=len(SPECS))
    state0, consts = init_train_state(jax.random.PRNGKey(0), ENC, pred_cfg)
    lr_s, wd_s, mom_s = _schedules()
    kc = [resolve_keep_counts(s, GRID) for s in SPECS]
    clips = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 16, 16, 3))
    finals = []
    for ug in (False, True):
        tc = TrainCfg(loss_exp=1.0, reg_coeff=0.1, clip_grad=10.0,
                      clip_after_step=0, num_clips=1, batch_size=2,
                      mask_mode="fixed", seed=7, unroll_grads=ug)
        fn = jax.jit(build_train_step(ENC, pred_cfg, consts, tc, lr_s, wd_s,
                                      mom_s, SPECS, GRID, kc))
        st = jax.tree.map(jnp.copy, state0)
        for _ in range(2):
            st, m = fn(st, {"clips": clips})
        finals.append((st, float(m["loss"])))
    (st_a, loss_a), (st_b, loss_b) = finals
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st_a["params"]), jax.tree.leaves(st_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    for a, b in zip(jax.tree.leaves(st_a["opt"]), jax.tree.leaves(st_b["opt"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_train_step_num_clips():
    state, fn = _setup(num_clips=2)
    fn = jax.jit(fn)
    clips = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16, 16, 3))  # 2 clips x B=2
    state, metrics = fn(state, {"clips": clips})
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_padded_mode():
    state, fn = _setup(mask_mode="padded")
    fn = jax.jit(fn)
    clips = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 16, 16, 3))
    enc_idx = np.array([[0, 1, 4], [2, 3, 6]], dtype=np.int32)
    pred_idx = np.array([[2, 3, 5, 6, 7], [0, 1, 4, 5, 7]], dtype=np.int32)
    me, we = pad_masks(enc_idx, 4)
    mp, wp = pad_masks(pred_idx, 6)
    batch = {
        "clips": clips,
        "masks_enc": [jnp.asarray(me)],
        "masks_pred": [jnp.asarray(mp)],
        "enc_weights": [jnp.asarray(we)],
        "pred_weights": [jnp.asarray(wp)],
    }
    state, metrics = fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_fsdp_opt_sharding_matches():
    """dp x fsdp mesh with ZeRO-sharded optimizer == plain replicated run."""
    from jepa_tpu.parallel.mesh import train_state_shardings

    mesh = make_mesh(fsdp=2)  # 4 x 2 over the 8 virtual devices
    state, fn = _setup(batch=8)
    clips = jax.random.normal(jax.random.PRNGKey(4), (8, 4, 16, 16, 3))
    ref_state, ref_metrics = jax.jit(fn)(state, {"clips": clips})

    shardings = train_state_shardings(mesh, state, min_size_to_shard=1024)
    state_sh = jax.device_put(state, shardings)
    clips_sh = jax.device_put(clips, batch_sharding(mesh))
    out_state, metrics = jax.jit(fn, out_shardings=(shardings, None))(
        state_sh, {"clips": clips_sh}
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(out_state["opt"]["mu"]), jax.tree.leaves(ref_state["opt"]["mu"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # opt moments actually sharded over fsdp for sizable leaves
    assert any(
        "fsdp" in str(l.sharding.spec)
        for l in jax.tree.leaves(out_state["opt"]["mu"])
        if l.size >= 1024
    )


def test_train_step_sharded_matches_single():
    mesh = make_mesh()  # 8 virtual CPU devices, data axis
    assert mesh.shape["data"] == 8
    state, fn = _setup(batch=8)
    clips = jax.random.normal(jax.random.PRNGKey(4), (8, 4, 16, 16, 3))

    ref_state, ref_metrics = jax.jit(fn)(state, {"clips": clips})

    state_sh = jax.device_put(state, replicated(mesh))
    clips_sh = jax.device_put(clips, batch_sharding(mesh))
    fn_sh = jax.jit(fn)
    out_state, metrics = fn_sh(state_sh, {"clips": clips_sh})
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    a = np.asarray(jax.tree.leaves(out_state["params"]["encoder"])[0])
    b = np.asarray(jax.tree.leaves(ref_state["params"]["encoder"])[0])
    np.testing.assert_allclose(a, b, atol=1e-5)
