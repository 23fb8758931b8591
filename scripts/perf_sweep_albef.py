"""TPU perf sweep for the ALBEF DAT step (run serially — one TPU client).

Usage: python scripts/perf_sweep_albef.py "B,remat,attn,logits_dtype,fused" ...
e.g.:  python scripts/perf_sweep_albef.py 16,1,auto,bfloat16,1 32,1,auto,bfloat16,1
Optional 6th field: vision_attn ("auto"|"flash"|"fused") — overrides the
attention impl for the ViT only (S=577; the text towers stay on `attn`).
"""

import sys
import time

import numpy as np


def build(batch_size, remat, attn_impl, logits_dtype, fused_step, vision_attn=None,
          remat_policy="full"):
    import jax
    import jax.numpy as jnp

    from feddat_tpu.configs.core import (
        AdapterSpec,
        AlbefModelConfig,
        OptimizerConfig,
        PEFTMode,
    )
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
    from feddat_tpu.train.forwards import make_albef_forward
    from feddat_tpu.train.trainers import make_albef_fused_dat_step

    text_remat = None
    if remat_policy.endswith("+notext"):
        text_remat = False
        remat_policy = remat_policy[: -len("+notext")]
    cfg = AlbefModelConfig(
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
        remat=remat,
        remat_policy=remat_policy,
        attention_logits_dtype=logits_dtype,
        fuse_ln=(vision_attn == "block"),
        text_remat=text_remat,
    )
    kwargs = {}
    if vision_attn is not None:
        kwargs["vision_attn_impl"] = vision_attn
    model = AlbefModel(cfg, dtype=jnp.bfloat16, attn_impl=attn_impl, **kwargs)
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
    part = Partitioner(params, "fed", PEFTMode.DAT)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    if fused_step:
        step, _ = make_albef_fused_dat_step(model, params, opt, max_steps=10_000, donate=True)
    else:
        forward = make_albef_forward(model)
        step = make_dat_train_step(forward, part, opt, max_steps=10_000)
    return step, state, batch


def measure(spec):
    import jax

    parts = spec.split(",")
    B, remat, attn, ldt, fused = (
        int(parts[0]), bool(int(parts[1])), parts[2], parts[3], int(parts[4])
    )
    vattn = parts[5] if len(parts) > 5 else None
    policy = parts[6] if len(parts) > 6 else "full"
    try:
        step, state, batch = build(B, remat, attn, ldt, fused, vattn, policy)
        batch = jax.device_put(batch)
        for _ in range(3):
            state, m = step(state, batch)
        float(m["loss"])  # fence (axon: block_until_ready is a no-op)
        t0 = time.perf_counter()
        iters = 15
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])
        dt = time.perf_counter() - t0
        print(f"{spec}: {dt / iters * 1000:.1f} ms/step, {B * iters / dt:.1f} samples/s", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{spec}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        measure(spec)
