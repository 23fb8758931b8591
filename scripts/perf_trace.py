"""Trace the fused DAT step and aggregate device op time from the
chrome-trace JSON that jax.profiler emits (no tensorboard needed)."""

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np


def run_trace(out_dir="/tmp/dat_trace"):
    import jax

    sys.path.insert(0, "/root/repo/scripts")
    from perf_sweep import build

    step, state, batch = build(64, True, "auto", "bfloat16", True)
    batch = jax.device_put(batch)
    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss"])
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, m = step(state, batch)
        float(m["loss"])
    print("trace done")


def parse(out_dir="/tmp/dat_trace", top=40):
    files = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {out_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device-side complete events: pid names containing 'TPU'
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        # skip container rows like steps
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"total device op time (3 steps): {total:.1f} ms")
    for name, ms in items:
        print(f"{ms:8.2f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse()
    else:
        run_trace()
        parse()
