"""Dump compiled HLO of the fused DAT step, print the hot fusion bodies."""

import re
import sys

import jax

sys.path.insert(0, "/root/repo/scripts")
from perf_sweep import build

step, state, batch = build(64, True, "auto", "bfloat16", True)
batch = jax.device_put(batch)
txt = step.lower(state, batch).compile().as_text()
open("/tmp/dat_step.hlo", "w").write(txt)
print("bytes:", len(txt))

for name in sys.argv[1:]:
    # print the computation called by this fusion instruction
    m = re.search(rf"%?{re.escape(name)} = .*", txt)
    if not m:
        print(f"--- {name}: NOT FOUND")
        continue
    line = m.group(0)
    print(f"--- {name}:\n{line[:600]}")
    cm = re.search(r"calls=([%\w.\-]+)", line)
    if cm:
        comp = cm.group(1).lstrip("%")
        cdef = re.search(rf"%?{re.escape(comp)} \(.*?\n(?:.*\n)*?}}", txt)
        if cdef:
            body = cdef.group(0)
            print(body[:3000])
