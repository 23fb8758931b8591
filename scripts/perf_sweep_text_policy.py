"""Round-5 ALBEF BERT-tower lever sweep (PERF.md): text_remat_policy x
dropout-RNG impl x batch on the tuned config (bf16, fused DAT step, live
dropout, ViT layer kernel).

    python scripts/perf_sweep_text_policy.py full names names:48:rbg ...

Each arg is  policy[:batch[:rng_impl]]  (rng_impl in {threefry,rbg})."""
import dataclasses
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np

from feddat_tpu.utils.observability import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from feddat_tpu.configs.core import (
    AdapterSpec,
    AlbefModelConfig,
    OptimizerConfig,
    PEFTMode,
)
from feddat_tpu.models.albef import AlbefModel, init_albef_params
from feddat_tpu.train.dat import Partitioner, init_train_state
from feddat_tpu.train.trainers import make_albef_fused_dat_step


def measure(policy, batch_size=16, text_remat=None, warmup=3, iters=15, rng_impl=None):
    cfg = AlbefModelConfig(
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
        remat=True,
        remat_policy="block_save_nox",
        attention_logits_dtype="bfloat16",
        fuse_ln=True,
        text_remat=text_remat,
        text_remat_policy=policy,
    )
    model = AlbefModel(cfg, dtype=jnp.bfloat16, vision_attn_impl="layer")
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
    part = Partitioner(params, "fed", PEFTMode.DAT)
    key = jax.random.key(0, impl=rng_impl) if rng_impl else jax.random.PRNGKey(0)
    state = init_train_state(params, part, OptimizerConfig(), key)
    step, _ = make_albef_fused_dat_step(model, params, OptimizerConfig(), max_steps=10_000, donate=True, part=part)
    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


for spec in sys.argv[1:]:
    parts = spec.split(":")
    policy = parts[0]
    bs = int(parts[1]) if len(parts) > 1 else 16
    impl = parts[2] if len(parts) > 2 and parts[2] else None
    sps = measure(policy, bs, rng_impl=impl)
    print(f"text_remat_policy={policy} B={bs} rng={impl}: {sps:.2f} samples/s", flush=True)
