"""Shared xplane parsing for the on-chip profiling scripts.

Wall-clock timing of single ops through the axon tunnel is dominated by
dispatch overhead; device-side op sums from the captured xplane are the
reliable per-op numbers (CLAUDE.md). Used by profile_step.py (fixed-mode
step) and bench_padded.py --profile (padded-parity step).
"""

from __future__ import annotations

import collections
import glob
import os


def print_xplane_summary(trace_dir: str, top: int = 30) -> None:
    """Aggregate per-op device durations from the newest xplane under
    ``trace_dir`` and print them per device line."""
    import jax

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("NO XPLANE CAPTURED")
        return
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[-1], "rb").read()
    )
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"\n=== plane: {plane.name}")
        for line in plane.lines:
            agg = collections.Counter()
            cnt = collections.Counter()
            total = 0.0
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                agg[ev.name] += dur
                cnt[ev.name] += 1
                total += dur
            print(f"\n-- line: {line.name!r} ({total:.1f} ms total)")
            for name, ms in agg.most_common(top):
                print(f"  {ms:9.2f} ms  x{cnt[name]:<5d} {name[:150]}")
