"""Memory analysis + timing of selected DAT step configs."""

import sys
import time

import jax

sys.path.insert(0, "/root/repo/scripts")
from perf_sweep import build, measure

for spec in sys.argv[1:]:
    parts = spec.split(",")
    B, remat, attn, ldt, fused = (
        int(parts[0]), bool(int(parts[1])), parts[2], parts[3], bool(int(parts[4]))
    )
    policy = parts[5] if len(parts) > 5 else "full"
    try:
        step, state, batch = build(B, remat, attn, ldt, fused, policy)
        batch = jax.device_put(batch)
        compiled = step.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        print(f"{spec}: peak={ma.temp_size_in_bytes/1e9:.2f}G args={ma.argument_size_in_bytes/1e9:.2f}G out={ma.output_size_in_bytes/1e9:.2f}G", flush=True)
    except Exception as e:
        print(f"{spec}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:140]}", flush=True)

# timing sweep after analysis
for spec in sys.argv[1:]:
    measure(spec)
