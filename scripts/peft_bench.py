#!/usr/bin/env python
"""PEFT baseline-zoo train-step throughput on one chip (PERF.md table).

The DAT step's cost story is published (bench.py / PERF.md); the baselines
the reference grid also runs (``main.py:132-245``) — single shared adapter,
LoRA r=16 on q/v (``adaptered_output.py:28-53``), bias-only — are
correctness-tested but had no published samples/s.  This measures their
single-update train step (1 fwd + 1 bwd + 1 AdamW — vs DAT's 3 fwd + 2 bwd
+ 2 AdamW) at full ViLT-B/32 width, each at its best-available attention
path: adapter/prompt keep the frozen-projection attn-block kernel; lora and
bias train projections/biases, so they run the XLA attention path with full
remat (the kernel's contract excludes them — cli.py guards this).

    python scripts/peft_bench.py [--modes adapter,lora,bias,prompt] [--batch 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_plain_step(mode_name: str, batch_size: int):
    import jax
    import jax.numpy as jnp

    from feddat_tpu.configs.core import (
        LoraSpec,
        OptimizerConfig,
        PEFTMode,
        PromptSpec,
        ViltModelConfig,
        adapter_spec_for_mode,
    )
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.train.dat import Partitioner, init_train_state, make_plain_train_step
    from feddat_tpu.train.forwards import make_vilt_forward

    mode = PEFTMode(mode_name)
    block_ok = mode not in (
        PEFTMode.FULL, PEFTMode.BIAS, PEFTMode.LORA, PEFTMode.FREEZE_BOTTOM_K
    )
    cfg = ViltModelConfig(
        adapter=adapter_spec_for_mode(mode),
        lora=LoraSpec(enabled=(mode == PEFTMode.LORA)),
        prompt=PromptSpec(enabled=(mode == PEFTMode.PROMPT)),
        remat=True,
        remat_policy="block_save_nox" if block_ok else "full",
        attention_logits_dtype="bfloat16",
        fuse_ln=block_ok,
    )
    model = ViltContinualLearner(
        cfg, {"fed": TaskHeadSpec(num_labels=100)}, dtype=jnp.bfloat16,
        attn_impl="block" if block_ok else "auto",
    )
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, size=(batch_size, cfg.max_text_len)).astype(np.int32),
        "attention_mask": np.ones((batch_size, cfg.max_text_len), np.int32),
        "pixel_values": rng.randn(batch_size, *cfg.image_size, 3).astype(np.float32),
        "target_scores": np.eye(100, dtype=np.float32)[rng.randint(0, 100, size=batch_size)],
    }
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    opt = OptimizerConfig()
    part = Partitioner(params, "fed", mode)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    adapter_mode = "adapter" if mode == PEFTMode.ADAPTER else "none"
    step = make_plain_train_step(
        make_vilt_forward(model, "fed"), part, opt, max_steps=10_000,
        adapter_mode=adapter_mode,
    )
    return step, state, batch


def measure(mode: str, batch_size: int, warmup=3, iters=20) -> float:
    import jax

    step, state, batch = build_plain_step(mode, batch_size)
    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])  # scalar-readback fence (axon relay; see PERF.md)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    return batch_size * iters / (time.perf_counter() - t0)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("peft_bench")
    p.add_argument("--modes", default="adapter,lora,bias,prompt")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args(argv)

    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()

    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        t0 = time.time()
        v = measure(mode, args.batch)
        print(
            f"{mode}: {v:.1f} samples/s at B={args.batch} "
            f"(wall {time.time() - t0:.0f}s incl. compile)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
