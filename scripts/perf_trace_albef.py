"""Trace the ALBEF fused DAT step and aggregate device op time (same
chrome-trace aggregation as perf_trace.py)."""

import sys


def run_trace(out_dir="/tmp/albef_trace"):
    import jax

    sys.path.insert(0, "/root/repo/scripts")
    from perf_sweep_albef import build

    step, state, batch = build(16, True, "auto", "bfloat16", True)
    batch = jax.device_put(batch)
    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss"])
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, m = step(state, batch)
        float(m["loss"])
    print("trace done")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    from perf_trace import parse

    if not (len(sys.argv) > 1 and sys.argv[1] == "parse"):
        run_trace()
    parse("/tmp/albef_trace", top=50)
