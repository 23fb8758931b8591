"""TPU perf sweep for the ViLT DAT step (run serially — one TPU client).

Usage: python scripts/perf_sweep.py "B,remat,attn,logits_dtype,fused_step" ...
e.g.:  python scripts/perf_sweep.py 64,1,auto,bfloat16,1 64,0,fused,bfloat16,1
"""

import sys
import time

import numpy as np


def build(batch_size, remat, attn_impl, logits_dtype, fused_step, remat_policy="full",
          scan_unroll=1, image_size=None):
    import jax
    import jax.numpy as jnp

    from feddat_tpu.configs.core import AdapterSpec, OptimizerConfig, PEFTMode, ViltModelConfig
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.peft.partition import label_params, merge, split_by_roles
    from feddat_tpu.train.dat import (
        Partitioner,
        init_train_state,
        make_dat_train_step,
        make_dat_train_step_fused,
    )
    from feddat_tpu.train.losses import bce_with_logits_vqa

    cfg = ViltModelConfig(
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
        remat=remat,
        remat_policy=remat_policy,
        attention_logits_dtype=logits_dtype,
        scan_unroll=scan_unroll,
        fuse_ln=(attn_impl == "block"),
        **({"image_size": image_size} if image_size else {}),
    )
    model = ViltContinualLearner(
        cfg, {"fed": TaskHeadSpec(num_labels=100)}, dtype=jnp.bfloat16, attn_impl=attn_impl
    )
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, size=(batch_size, cfg.max_text_len)).astype(np.int32),
        "attention_mask": np.ones((batch_size, cfg.max_text_len), np.int32),
        "pixel_values": rng.randn(batch_size, cfg.image_size[0], cfg.image_size[1], 3).astype(np.float32),
        "target_scores": np.eye(100, dtype=np.float32)[rng.randint(0, 100, size=batch_size)],
    }
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    opt = OptimizerConfig()
    part = Partitioner(params, "fed", PEFTMode.DAT)
    if remat_policy == "bf16w":  # frozen backbone stored bf16 (no per-use converts)
        from flax import traverse_util as _tu

        trainable = part.shared_paths | part.local_paths | part.head_paths
        flat = _tu.flatten_dict(params)
        params = _tu.unflatten_dict({
            p: (v if p in trainable else v.astype(jnp.bfloat16)) for p, v in flat.items()
        })
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    if fused_step:
        labels = label_params(params)
        _, frozen_rest = split_by_roles(params, labels, frozenset({"head"}))

        def encode(p, b, mode, r):
            return model.apply(
                {"params": p}, "fed", b, adapter_mode=mode, deterministic=True,
                method=type(model).encode_single_image,
            )

        def head_fn(h, pooled):
            return model.apply(
                {"params": merge(h, frozen_rest)}, "fed", pooled,
                method=type(model).apply_head,
            )

        def task_loss(logits, b):
            return bce_with_logits_vqa(logits, b["target_scores"])

        if fused_step == 2:  # joint mega-batch step
            from feddat_tpu.train.dat import make_dat_train_step_joint

            step = make_dat_train_step_joint(
                encode, head_fn, task_loss, part, opt, max_steps=10_000
            )
        else:
            step = make_dat_train_step_fused(encode, head_fn, task_loss, part, opt, max_steps=10_000)
    else:
        def forward(p, b, mode, dropout_rng):
            _, logits = model.apply(
                {"params": p}, "fed", b, adapter_mode=mode, deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            return bce_with_logits_vqa(logits, b["target_scores"]), logits

        step = make_dat_train_step(forward, part, opt, max_steps=10_000)
    return step, state, batch


def measure(spec):
    import jax

    parts = spec.split(",")
    B, remat, attn, ldt, fused = (
        int(parts[0]), bool(int(parts[1])), parts[2], parts[3], int(parts[4])
    )
    policy = parts[5] if len(parts) > 5 else "full"
    unroll = int(parts[6]) if len(parts) > 6 else 1
    try:
        step, state, batch = build(B, remat, attn, ldt, fused, policy, unroll)
        batch = jax.device_put(batch)
        for _ in range(3):
            state, m = step(state, batch)
        float(m["loss"])  # fence (axon: block_until_ready is a no-op)
        t0 = time.perf_counter()
        iters = 20
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
