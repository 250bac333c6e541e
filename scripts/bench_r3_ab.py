"""Round-3 on-chip A/B sweep: measure the fused ViT-L step under each of
the new perf knobs and print a compact table.

Each variant runs in a fresh subprocess (the knobs are read at trace time
and the axon runtime keeps compiled programs per process). Usage:

    PYTHONPATH=/root/repo python scripts/bench_r3_ab.py [--quick]

Variants:
  base           committed defaults (one-shot softmax, exact GELU, unroll 1)
  fast_gelu      JEPA_FAST_GELU=1       (exp2-erfc gelu on trainable MLPs)
  kv392/kv784    JEPA_TM_KV_CHUNK=N     (chunked-kv pipelined flash fwd)
  unroll2        ENC_UNROLL=2 PRED_UNROLL=2 (scan unroll, fewer DUS stacks)
  all            best-guess combination
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

STEP_SNIPPET = r"""
import os, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, calibrate_keep_counts
from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
from jepa_tpu.utils.schedulers import build_schedules

enc_unroll = int(os.environ.get("ENC_UNROLL", "1"))
pred_unroll = int(os.environ.get("PRED_UNROLL", "1"))
enc_cfg = vit_cfg("vit_large", img_size=224, num_frames=16, tubelet_size=2,
                  uniform_power=True, remat="attn", scan_unroll=enc_unroll)
pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384, depth=12,
                             num_mask_tokens=2, remat="attn",
                             scan_unroll=pred_unroll)
grid = MaskGrid.from_data_cfg(224, enc_cfg.patch_size, 16, 2)
specs = [
    MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
    MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
]
kc = [calibrate_keep_counts(s, grid, 24) for s in specs]
lr_s, wd_s, mom_s = build_schedules(
    ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
    final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
)
state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg)
tc = TrainCfg(num_clips=1, batch_size=24, mask_mode="fixed",
              clip_grad=10.0, clip_after_step=0, seed=0)
fn = jax.jit(
    build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s, specs, grid, kc),
    donate_argnums=(0,),
)
clips = jax.random.normal(jax.random.PRNGKey(1), (24, 16, 224, 224, 3), jnp.bfloat16)
st = jax.device_put(state)
t0 = time.perf_counter()
st, m = fn(st, {"clips": clips})
jax.block_until_ready(m["loss"])
compile_s = time.perf_counter() - t0
iters = int(os.environ.get("AB_ITERS", "10"))
t0 = time.perf_counter()
for _ in range(iters):
    st, m = fn(st, {"clips": clips})
jax.block_until_ready(m["loss"])
dt = (time.perf_counter() - t0) / iters
print("ABRESULT " + json.dumps({
    "step_ms": round(dt * 1000, 2),
    "clips_per_s": round(24 / dt, 2),
    "loss": round(float(m["loss"]), 6),
    "compile_s": round(compile_s, 1),
}))
"""

VARIANTS = [
    ("base", {}),
    ("fast_gelu", {"JEPA_FAST_GELU": "1"}),
    ("kv392", {"JEPA_TM_KV_CHUNK": "392"}),
    ("kv784", {"JEPA_TM_KV_CHUNK": "784"}),
    ("unroll2", {"ENC_UNROLL": "2", "PRED_UNROLL": "2"}),
    ("split_t", {"JEPA_SCAN_SPLIT_TRANSPOSE": "1"}),
    # static-shift softmax is the committed default; the A/B variant now
    # DISABLES it so the sweep can still detect this knob's effect
    ("row_max", {"JEPA_TM_NO_MAX": "0"}),
]


def _selected():
    """--only a,b,c restricts the sweep (e.g. --only base,row_max)."""
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            names = set(sys.argv[i + 1].split(","))
            return [(n, e) for n, e in VARIANTS if n in names]
    return VARIANTS


def run_variant(name: str, env: dict, iters: int) -> dict | None:
    e = dict(os.environ)
    e.update(env)
    e["AB_ITERS"] = str(iters)
    try:
        out = subprocess.run(
            [sys.executable, "-c", STEP_SNIPPET], env=e, capture_output=True,
            text=True, timeout=1500,
        )
    except subprocess.TimeoutExpired:
        print(f"{name}: TIMEOUT")
        return None
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            r = json.loads(line[len("ABRESULT "):])
            print(f"{name}: {r}")
            return r
    tail = (out.stdout + out.stderr).strip().splitlines()[-4:]
    print(f"{name}: FAILED rc={out.returncode}\n  " + "\n  ".join(tail))
    return None


def main():
    iters = 5 if "--quick" in sys.argv else 10
    results = {}
    sel = _selected()
    for name, env in sel:
        r = run_variant(name, env, iters)
        if r:
            results[name] = r
    base = results.get("base")
    if base:
        # combine every knob that individually beat base by >0.5%
        combo_env = {}
        for name, env in sel[1:]:
            r = results.get(name)
            if r and r["step_ms"] < base["step_ms"] * 0.995:
                combo_env.update(env)
        if combo_env:
            print(f"combo env: {combo_env}")
            r = run_variant("combo", combo_env, iters)
            if r:
                results["combo"] = r
    print("\n== summary ==")
    for name, r in sorted(results.items(), key=lambda kv: kv[1]["step_ms"]):
        print(f"  {name:10s} {r['step_ms']:8.2f} ms  {r['clips_per_s']:6.2f} clips/s  loss={r['loss']}")


if __name__ == "__main__":
    main()
