"""Summarize a JAX profiler trace: top XLA ops by device time.

Usage:
    python scripts/summarize_profile.py {checkpoints_dir}/{name}/profile [-n 20]

Reads the trace.json.gz written by `train.py --profile_iters N` (or any
`jax.profiler.start_trace` capture) and aggregates trace events by op
name, printing the top consumers — the quick "where does the step time
go" view without TensorBoard. Works for both TPU and CPU captures.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.trace.json.gz"), recursive=True
    ))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {path}")
    return hits[-1]  # newest capture


def device_track_pids(trace: dict) -> dict:
    """pid → process name for device-side tracks (TPU/XLA ops), skipping
    host-side python/runtime threads."""
    names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            names[ev["pid"]] = name
    keep = {}
    for pid, name in names.items():
        low = name.lower()
        if any(k in low for k in ("tpu", "xla op", "device", "/device:")):
            keep[pid] = name
    return keep or names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir or trace.json.gz file")
    ap.add_argument("-n", "--top", type=int, default=20)
    args = ap.parse_args()

    tf = find_trace(args.path)
    with gzip.open(tf, "rt") as f:
        trace = json.load(f)
    pids = device_track_pids(trace)

    total = 0.0
    by_op = collections.Counter()
    calls = collections.Counter()
    steps = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        name = ev.get("name", "?")
        # envelope rows, not ops: step numbers ("0", "1", …) and the
        # jit_<fn> program span — report step times separately
        if name.isdigit():
            steps.append(dur)
            continue
        if name.startswith("jit_"):
            continue
        # collapse fusion instances: "fusion.123" → "fusion"
        base = name.split(".")[0]
        by_op[base] += dur
        calls[base] += 1
        total += dur

    print(f"trace: {tf}")
    print(f"tracks: {sorted(set(pids.values()))}")
    if steps:
        print(f"steps: {len(steps)}, "
              f"mean {sum(steps) / len(steps) / 1e3:.2f} ms/step")
    print(f"total op time: {total / 1e3:.2f} ms\n")
    print(f"{'op':40s} {'ms':>10s} {'%':>6s} {'calls':>7s}")
    for op, dur in by_op.most_common(args.top):
        print(f"{op:40s} {dur / 1e3:10.2f} {100 * dur / max(total, 1e-9):6.1f} "
              f"{calls[op]:7d}")


if __name__ == "__main__":
    main()
