"""Decompose the fused DAT step's 135ms: time each constituent on the chip."""

import sys
import time

import numpy as np


def main(B=64):
    import jax
    import jax.numpy as jnp

    from feddat_tpu.configs.core import AdapterSpec, OptimizerConfig, PEFTMode, ViltModelConfig
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.peft.partition import label_params, merge, split_by_roles
    from feddat_tpu.train.dat import Partitioner, init_train_state
    from feddat_tpu.train.losses import bce_with_logits_vqa, kd_kl_loss
    from feddat_tpu.train.optim import adamw_direction, apply_direction, polynomial_schedule

    cfg = ViltModelConfig(
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
        remat=True,
        attention_logits_dtype="bfloat16",
    )
    model = ViltContinualLearner(cfg, {"fed": TaskHeadSpec(num_labels=100)}, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, size=(B, cfg.max_text_len)).astype(np.int32),
        "attention_mask": np.ones((B, cfg.max_text_len), np.int32),
        "pixel_values": rng.randn(B, cfg.image_size[0], cfg.image_size[1], 3).astype(np.float32),
        "target_scores": np.eye(100, dtype=np.float32)[rng.randint(0, 100, size=B)],
    }
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    part = Partitioner(params, "fed", PEFTMode.DAT)
    opt = OptimizerConfig()
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    batch = jax.device_put(batch)
    P = part
    head = P.extract(params, P.head_paths)
    local = P.extract(params, P.local_paths)
    shared = P.extract(params, P.shared_paths)
    labels = label_params(params)
    _, frozen_rest = split_by_roles(params, labels, frozenset({"head"}))

    def encode(p, b, mode):
        return model.apply(
            {"params": p}, "fed", b, adapter_mode=mode, deterministic=True,
            method=type(model).encode_single_image,
        )

    def head_fn(h, pooled):
        return model.apply(
            {"params": merge(h, frozen_rest)}, "fed", pooled,
            method=type(model).apply_head,
        )

    def bench(name, fn, *args, iters=20):
        out = fn(*args)
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:.1f} ms", flush=True)
        return dt

    # 1) one ensemble encoder forward
    f_ens = jax.jit(lambda p, b: jnp.sum(encode(p, b, "ensemble")))
    bench("fwd ensemble", f_ens, params, batch)

    # 2) one adapter_1 encoder forward
    f_a1 = jax.jit(lambda p, b: jnp.sum(encode(p, b, "adapter_1")))
    bench("fwd adapter_1", f_a1, params, batch)

    # 3) fwd+bwd wrt adapter_0 through ensemble (vjp roundtrip)
    def loss_local(local_p, b):
        pooled = encode(P.merge_into(params, local_p), b, "ensemble")
        return jnp.sum(pooled ** 2)

    g_local = jax.jit(jax.grad(loss_local))
    bench("fwd+bwd ensemble (wrt adapter_0)", g_local, local, batch)

    # 4) fwd+bwd wrt (adapter_1, head) through the full loss1 path
    def loss1(shared_p, head_p, b, logits_all):
        full = P.merge_into(P.merge_into(params, shared_p), head_p)
        pooled1 = encode(full, b, "adapter_1")
        logits = head_fn(head_p, pooled1)
        l = bce_with_logits_vqa(logits, b["target_scores"])
        kl = kd_kl_loss(logits, logits_all)
        return (l + kl) / 2.0

    logits_all = jax.jit(lambda p, b: head_fn(head, encode(p, b, "ensemble")))(params, batch)
    g1 = jax.jit(jax.grad(loss1, argnums=(0, 1)))
    bench("fwd+bwd adapter_1 path (loss1)", g1, shared, head, batch, logits_all)

    # 5) optimizer updates alone (3 partitions, 2 ticks)
    tx = adamw_direction(opt)
    schedule = polynomial_schedule(opt, 10000)

    def opt_only(st, grads_s, grads_h, grads_l):
        lr1 = schedule(st.sched_count)
        ns, os_ = apply_direction(tx, grads_s, st.opt_states["shared"], shared, lr1)
        nh, oh = apply_direction(tx, grads_h, st.opt_states["head"], head, lr1)
        nl, ol = apply_direction(tx, grads_l, st.opt_states["local"], local, schedule(st.sched_count + 1))
        return jax.tree_util.tree_leaves(ns)[0].sum() + jax.tree_util.tree_leaves(nl)[0].sum()

    zs = jax.tree_util.tree_map(jnp.zeros_like, shared)
    zh = jax.tree_util.tree_map(jnp.zeros_like, head)
    zl = jax.tree_util.tree_map(jnp.zeros_like, local)
    bench("optimizer x3 partitions", jax.jit(opt_only), state, zs, zh, zl)

    # 6) head fwd+bwd + losses alone
    def loss_head(h, pooled, b, ref):
        logits = head_fn(h, pooled)
        return (bce_with_logits_vqa(logits, b["target_scores"]) + kd_kl_loss(logits, ref)) / 2.0

    pooled = jax.jit(lambda p, b: encode(p, b, "ensemble"))(params, batch)
    bench("head+losses fwd+bwd", jax.jit(jax.grad(loss_head, argnums=(0, 1))), head, pooled, batch, logits_all)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
