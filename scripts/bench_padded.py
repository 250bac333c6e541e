"""Padded-parity-mode fused step on the real TPU (VERDICT round-1 item 9).

The padded mode is the checkpoint-parity story: host collator masks padded
to static caps with validity weights, kv-masked flash attention. One number
for BENCH.md next to the fixed-mode headline.

Measurement structure: ONE TIER PER SUBPROCESS. The axon PJRT client panics
(client.rs:2008 index==len, rc=134) when two executables alternate over
DONATED state buffers, and without donation two live copies of the ~5.3 GB
ViT-L train state OOM the 16 GB chip (RESOURCE_EXHAUSTED, measured). Each
tier is therefore timed in its own process (single executable + donation =
no alternation, no doubled state); the parent samples the counter-seeded
collator for the tier hit rates and blends:  ms = sum_t rate_t * ms_t.
Real TPU VMs don't have this client; there the app alternates tiers in-proc.

Usage: python scripts/bench_padded.py            (blended measurement)
       python scripts/bench_padded.py --tier N   (one tier, used internally)
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 24
ITERS = 24


def _setup():
    from jepa_tpu.masks.multiblock3d import (
        MaskCollator,
        MaskGrid,
        MaskSpec,
        calibrate_pad_tiers,
    )
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg

    enc_cfg = vit_cfg("vit_large", img_size=224, num_frames=16, tubelet_size=2,
                      uniform_power=True, remat=True)
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384, depth=12,
                                 num_mask_tokens=2)
    grid = MaskGrid.from_data_cfg(224, enc_cfg.patch_size, 16, 2)
    specs = [
        MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
        MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
    ]
    # JEPA_PAD_TIER_MODE: "total" (legacy joint envelope) | "field"
    # (per-field quantiles) — the round-5 A/B knob; see calibrate_pad_tiers.
    tiers = calibrate_pad_tiers(
        specs, grid, BATCH,
        mode=os.environ.get("JEPA_PAD_TIER_MODE", "total"))
    collator = MaskCollator(specs, grid, seed=0)
    return enc_cfg, pred_cfg, grid, specs, tiers, collator


def run_tier(tier_idx: int, caps_arg: str | None = None):
    """Time the fused padded step at one tier's caps (donated, one executable).

    caps_arg "e0,p0;e1,p1" overrides the tier's caps — used by the per-spec
    lattice blend (main_spec), where a cell is a rung combination that is
    not any joint tier."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jepa_tpu.masks.padding import pad_masks
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.schedulers import build_schedules

    enc_cfg, pred_cfg, grid, specs, tiers, collator = _setup()
    if caps_arg:
        caps = [tuple(int(v) for v in part.split(","))
                for part in caps_arg.split(";")]
    else:
        caps = tiers[tier_idx]
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    # per-layer block state, same default as bench.py's fixed-mode headline
    unroll_blocks = os.environ.get("JEPA_UNROLL_GRADS", "2") == "2"
    state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg,
                                     unroll_blocks=unroll_blocks)
    tc = TrainCfg(num_clips=1, batch_size=BATCH, mask_mode="padded",
                  clip_grad=10.0, clip_after_step=0, seed=0)
    fn = jax.jit(
        build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s,
                         specs, grid, [(0, 0)] * len(specs)),
        donate_argnums=(0,),
    )
    clips = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, 224, 224, 3),
                              jnp.bfloat16)

    def make_batch():
        # every sampled batch is forced to THIS tier's caps (pad_masks
        # truncates K > cap — the reference's max_keep slice semantics), so
        # one executable serves the whole run; tier choice frequencies are
        # accounted for by the parent's hit-rate blend.
        me_list, mp_list = collator(BATCH)
        b = {"clips": clips, "masks_enc": [], "enc_weights": [],
             "masks_pred": [], "pred_weights": []}
        for (me, mp), (ce, cp) in zip(zip(me_list, mp_list), caps):
            m, w = pad_masks(me, ce)
            b["masks_enc"].append(jnp.asarray(m))
            b["enc_weights"].append(jnp.asarray(w))
            m, w = pad_masks(mp, cp)
            b["masks_pred"].append(jnp.asarray(m))
            b["pred_weights"].append(jnp.asarray(w))
        return b

    st = jax.device_put(state)
    del state
    t0 = time.perf_counter()
    st, m = fn(st, make_batch())
    jax.block_until_ready(m["loss"])
    print(f"  tier {tier_idx} caps {caps}: compile+1 {time.perf_counter()-t0:.1f}s",
          flush=True)
    # pre-build + pre-transfer all timed batches: host collation overlaps
    # the device step in the real app (loader prefetch), and this 1-core
    # box shares the host with unrelated work — device throughput is the
    # number comparable to the fixed-mode headline.
    batches = [make_batch() for _ in range(ITERS)]
    batches = jax.block_until_ready(jax.device_put(batches))
    t0 = time.perf_counter()
    for b in batches:
        st, m = fn(st, b)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"TIER {tier_idx} ms {dt*1000:.2f} loss {float(m['loss']):.4f}",
          flush=True)
    if os.environ.get("JEPA_PROFILE_TIER") == "1":
        # device-side op attribution of this tier's step (VERDICT r4 task 3:
        # where do the padded-vs-fixed milliseconds go?)
        trace_dir = "/tmp/jepa_xplane_padded"
        with jax.profiler.trace(trace_dir):
            for b in batches[:2]:
                st, m = fn(st, b)
            jax.block_until_ready(m["loss"])
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from xplane_util import print_xplane_summary

        print_xplane_summary(trace_dir, top=40)


def main_spec():
    """Per-spec rung-lattice blend (meta.pad_tier_scope: spec). Each observed
    rung combination (cell) is timed in its own subprocess at its exact cap
    tuple; the blend weighs cells by the counter-seeded collator's empirical
    rates. Cells never observed in the sample don't enter the blend."""
    from jepa_tpu.masks.multiblock3d import (
        calibrate_pad_ladders,
        select_pad_rungs,
    )

    _, _, grid, specs, _, collator = _setup()
    ladders = calibrate_pad_ladders(specs, grid, BATCH)
    print("pad cap ladders:", ladders, flush=True)
    hits = {}
    draws = 200
    for _ in range(draws):
        me_list, mp_list = collator(BATCH)
        r = select_pad_rungs(ladders, me_list, mp_list)
        hits[r] = hits.get(r, 0) + 1
    cells = sorted(hits)
    print(f"rung-cell hit rates over {draws} draws: "
          f"{ {c: h / draws for c, h in hits.items()} }", flush=True)

    ms = {}
    for cell in cells:
        caps = [ladders[s][r] for s, r in enumerate(cell)]
        caps_arg = ";".join(f"{e},{p}" for e, p in caps)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tier", "0",
             "--caps", caps_arg],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stdout.write(p.stdout)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-2000:])
            raise SystemExit(f"cell {cell} subprocess failed rc={p.returncode}")
        mt = re.search(r"TIER 0 ms ([0-9.]+)", p.stdout)
        if mt is None:
            raise SystemExit(f"cell {cell}: no 'TIER 0 ms' line in output")
        ms[cell] = float(mt.group(1))
        print(f"  cell {cell} caps {caps}: {ms[cell]:.1f} ms "
              f"(rate {hits[cell]/draws:.3f})", flush=True)

    blended = sum(hits[c] / draws * ms[c] for c in cells)
    print(f"padded-parity step (per-spec rung blend): {blended:.1f} ms = "
          f"{BATCH / (blended / 1000):.2f} clips/s/chip", flush=True)


def main():
    from jepa_tpu.masks.multiblock3d import select_pad_tier

    _, _, _, _, tiers, collator = _setup()
    print("pad cap tiers:", tiers, flush=True)
    # tier hit rates from the counter-seeded collator (host-only, cheap)
    hits = [0] * len(tiers)
    draws = 200
    for _ in range(draws):
        me_list, mp_list = collator(BATCH)
        hits[select_pad_tier(tiers, me_list, mp_list)] += 1
    rates = [h / draws for h in hits]
    print(f"tier hit rates over {draws} draws: {rates}", flush=True)

    ms = []
    for t in range(len(tiers)):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tier", str(t)],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stdout.write(p.stdout)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-2000:])
            raise SystemExit(f"tier {t} subprocess failed rc={p.returncode}")
        mt = re.search(r"TIER %d ms ([0-9.]+)" % t, p.stdout)
        if mt is None:
            raise SystemExit(f"tier {t}: no 'TIER {t} ms' line in output")
        ms.append(float(mt.group(1)))

    blended = sum(r * m for r, m in zip(rates, ms))
    print(f"padded-parity step (hit-rate blend): {blended:.1f} ms = "
          f"{BATCH / (blended / 1000):.2f} clips/s/chip "
          f"(tiers {['%.1f' % m for m in ms]} ms at rates {rates})", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", type=int, default=None)
    ap.add_argument("--caps", type=str, default=None,
                    help='explicit per-spec caps "e0,p0;e1,p1" (lattice cell)')
    ap.add_argument("--scope", choices=["joint", "spec"], default="joint")
    a = ap.parse_args()
    if a.tier is None:
        main_spec() if a.scope == "spec" else main()
    else:
        run_tier(a.tier, a.caps)
