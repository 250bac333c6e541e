"""On-chip A/B of the round-4 selective-remat save knobs on the fused step.

Each variant runs bench.py in a FRESH subprocess (env knobs are read at
trace time; fresh processes keep the axon client state clean) and parses
its JSON line. Baseline = current defaults (save-qkv ON, per-layer state).

Run: python scripts/bench_r4_remat_ab.py   (from the repo root, keep axon)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# save-fc1 became the committed default after this sweep (678.8 / 676.5 /
# 666.5 / 672.8 ms, BENCH.md round 4) — variants are now expressed relative
# to the defaults so the sweep stays meaningful (the r3 ADVICE lesson):
# "base" = shipped defaults (fc1 ON), "-fc1" turns it off, "+attn_out"
# adds the opt-in knob on top of the defaults.
VARIANTS = [
    ("base", {}),
    ("-fc1", {"JEPA_REMAT_SAVE_FC1": "0"}),
    ("+attn_out", {"JEPA_REMAT_SAVE_ATTN_OUT": "1"}),
    ("+attn_out-fc1", {"JEPA_REMAT_SAVE_ATTN_OUT": "1",
                       "JEPA_REMAT_SAVE_FC1": "0"}),
]


def main():
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    results = {}
    for name, knobs in VARIANTS:
        if only and name not in only:
            continue
        env = dict(os.environ, **knobs)
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, timeout=1800,
                           cwd=REPO, env=env)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            print(f"{name:16s} FAILED rc={p.returncode}\n{p.stderr[-1500:]}",
                  flush=True)
            continue
        d = json.loads(line[-1])
        ms = d["detail"]["step_ms"]
        results[name] = ms
        print(f"{name:16s} {ms:7.1f} ms  ({d['value']} clips/s, "
              f"mfu {d['detail']['mfu']})", flush=True)
    if "base" in results:
        for name, ms in results.items():
            if name != "base":
                print(f"{name}: {results['base'] - ms:+.1f} ms saved vs base "
                      f"(positive = faster)", flush=True)


if __name__ == "__main__":
    main()
