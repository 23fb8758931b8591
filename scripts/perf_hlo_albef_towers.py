"""Dump the compiled HLO of the shipped ALBEF fused DAT step and map the
while loops (scan towers) to their flax scopes via op metadata."""
import re
import sys

import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from feddat_tpu.utils.observability import enable_compilation_cache

enable_compilation_cache()

from bench import _build_albef

_, _, step, state, batch = _build_albef(16, "bfloat16")
batch = jax.device_put(batch)
txt = step.lower(state, batch).compile().as_text()
open("/tmp/albef_step.hlo", "w").write(txt)
print("bytes:", len(txt))

# For each while instruction, find its body computation and sample the
# op_name metadata inside to identify the tower + direction.
whiles = re.findall(r"(%?while\.\d+) = .*?body=%?([\w.\-]+)", txt)
print(f"{len(whiles)} while ops")
for wname, body in whiles:
    cdef = re.search(rf"^%?{re.escape(body)} \(", txt, re.M)
    if not cdef:
        print(wname, body, "BODY NOT FOUND")
        continue
    start = cdef.start()
    end = txt.find("\n}", start)
    section = txt[start:end]
    metas = re.findall(r'op_name="([^"]+)"', section)
    # pick the most informative scopes
    scopes = {}
    for m in metas:
        for key in ("visual_encoder", "text_layers", "fusion_layers",
                    "text_decoder", "text_encoder", "transpose(jvp", "jvp("):
            if key in m:
                scopes[key] = scopes.get(key, 0) + 1
    sample = metas[len(metas) // 2] if metas else ""
    print(wname.lstrip('%'), "::", dict(scopes), "|", sample[:160])
