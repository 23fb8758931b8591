"""Round-3 ALBEF perf probes (run on the real chip, one at a time).

Variants over the bench B=16 fused-DAT config:
  base        — ViT block kernel, LN outside (round-2 optimum, 107 samples/s)
  fused_ln    — ViT block kernel WITH the row-chunked fused LN at S=577
  text_block  — + text/fusion self-attention through the block kernel
Also: rank-answer eval throughput for each.

Usage: python scripts/perf_albef_r3.py [variant ...]
"""

import sys
import time

import numpy as np


def build(fuse_ln: bool, text_block: bool, batch_size: int = 16):
    import jax
    import jax.numpy as jnp

    from feddat_tpu.configs.core import (
        AdapterSpec,
        AlbefModelConfig,
        OptimizerConfig,
    )
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.dat import init_train_state
    from feddat_tpu.train.trainers import make_albef_fused_dat_step

    cfg = AlbefModelConfig(
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
        remat=True,
        remat_policy="block_save_nox",
        attention_logits_dtype="bfloat16",
        fuse_ln=fuse_ln,
    )
    model = AlbefModel(
        cfg, dtype=jnp.bfloat16,
        attn_impl="block" if text_block else "auto",
        vision_attn_impl="block",
    )
    rng = np.random.RandomState(0)
    B, A, Lq, La = batch_size, 4, cfg.max_question_len, cfg.max_answer_len
    V = cfg.bert.vocab_size
    batch = {
        "pixel_values": rng.randn(B, cfg.image_res, cfg.image_res, 3).astype(np.float32),
        "question_ids": rng.randint(5, V, size=(B, Lq)).astype(np.int32),
        "question_mask": np.ones((B, Lq), np.int32),
        "answer_ids": rng.randint(5, V, size=(B, A, La)).astype(np.int32),
        "answer_mask": np.ones((B, A, La), np.int32),
        "answer_weights": np.full((B, A), 1.0 / A, np.float32),
    }
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    opt = OptimizerConfig()
    from feddat_tpu.train.dat import Partitioner
    from feddat_tpu.configs.core import PEFTMode

    part = Partitioner(params, "fed", PEFTMode.DAT)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    step, _ = make_albef_fused_dat_step(model, params, opt, max_steps=10_000, donate=True)
    return model, params, step, state, batch


def measure(step, state, batch, batch_size, warmup=3, iters=15):
    import jax

    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])  # scalar-readback fence
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    return batch_size * iters / (time.perf_counter() - t0)


def measure_rank(model, params, batch_size=16, bank=100, k=64, warmup=2, iters=10):
    import jax

    from feddat_tpu.train.evaluation import make_albef_eval_step

    rng = np.random.RandomState(1)
    La = model.cfg.max_answer_len
    V = model.cfg.bert.vocab_size
    answer_ids = rng.randint(5, V, size=(bank, La)).astype(np.int32)
    answer_mask = np.ones((bank, La), np.int32)
    eval_batch = {
        "pixel_values": rng.randn(batch_size, model.cfg.image_res, model.cfg.image_res, 3).astype(np.float32),
        "question_ids": rng.randint(5, V, size=(batch_size, model.cfg.max_question_len)).astype(np.int32),
        "question_mask": np.ones((batch_size, model.cfg.max_question_len), np.int32),
        "gt_labels": rng.randint(0, bank, size=(batch_size, 10)).astype(np.int64),
    }
    eval_step = make_albef_eval_step(model, answer_ids, answer_mask, k=k)
    eval_batch = jax.device_put(eval_batch)
    for _ in range(warmup):
        s = eval_step(params, eval_batch, adapter_mode="ensemble")
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = eval_step(params, eval_batch, adapter_mode="ensemble")
    float(s)
    return batch_size * iters / (time.perf_counter() - t0)


VARIANTS = {
    "base": dict(fuse_ln=False, text_block=False),
    "fused_ln": dict(fuse_ln=True, text_block=False),
    "text_block": dict(fuse_ln=True, text_block=True),
}


def main():
    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        kw = VARIANTS[name]
        B = 16
        model, params, step, state, batch = build(batch_size=B, **kw)
        sps = measure(step, state, batch, B)
        print(f"{name}: train {sps:.1f} samples/s", flush=True)
        if name == which[-1]:
            qps = measure_rank(model, params)
            print(f"{name}: rank-answer {qps:.1f} q/s", flush=True)


if __name__ == "__main__":
    main()
