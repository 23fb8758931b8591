#!/usr/bin/env python
"""Rank-answer eval lever table (PERF.md; VERDICT r3 item 2).

The two-stage top-k answer ranking (``albef_model.py:171-228``) is the
reference's eval hot loop.  The train step got a measured-variant table in
rounds 1-3; this gives the eval program the same treatment.  Each lever is
measured at the bench eval config (B=16, bank=100, k=64, La=10, ViT-B/16@384)
unless stated:

  base       current code (LSE+gather CE — see models/albef.py::shifted_lm_loss)
  old_ce     pre-round-4 CE: materialized fp32 [B*k, La-1, V] log-softmax
  no_remat   model rebuilt with remat=False — eval has no backward, any
             checkpointing is pure waste IF it costs anything at trace time
  b32 / b48  larger eval batch (serving-style bucket compiles amortize this)
  text_block the text/fusion/decoder towers through the attn-block Pallas
             kernel too (eval-only => the frozen-projection contract holds)
  vis_block  the ViT tower back on the attn-block kernel (round-4 `base`
             is the whole-layer kernel with XLA LN1 above S=448)
  b48_vis_block  the round-4 lever table's best combo, for comparison

    python scripts/rank_levers.py [--levers base,old_ce,...] [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _eval_batch(model, batch_size: int, bank: int):
    rng = np.random.RandomState(1)
    cfg = model.cfg
    La = cfg.max_answer_len
    V = cfg.bert.vocab_size
    answer_ids = rng.randint(5, V, size=(bank, La)).astype(np.int32)
    answer_mask = np.ones((bank, La), np.int32)
    eval_batch = {
        "pixel_values": rng.randn(batch_size, cfg.image_res, cfg.image_res, 3).astype(np.float32),
        "question_ids": rng.randint(5, V, size=(batch_size, cfg.max_question_len)).astype(np.int32),
        "question_mask": np.ones((batch_size, cfg.max_question_len), np.int32),
        "gt_labels": rng.randint(0, bank, size=(batch_size, 10)).astype(np.int64),
    }
    return eval_batch, answer_ids, answer_mask


def _measure(model, params, batch_size: int, bank: int, k: int, warmup, iters) -> float:
    import jax

    from feddat_tpu.train.evaluation import make_albef_eval_step

    eval_batch, answer_ids, answer_mask = _eval_batch(model, batch_size, bank)
    step = make_albef_eval_step(model, answer_ids, answer_mask, k=k)
    eval_batch = jax.device_put(eval_batch)
    for _ in range(warmup):
        s = step(params, eval_batch, adapter_mode="ensemble")
    float(s)  # scalar-readback fence (axon relay; see PERF.md)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(params, eval_batch, adapter_mode="ensemble")
    float(s)
    return batch_size * iters / (time.perf_counter() - t0)


def _old_shifted_lm_loss(logits, labels, soft_labels=None, alpha=0.0):
    """The pre-round-4 CE: materializes the fp32 log-softmax tensor."""
    import jax
    import jax.numpy as jnp

    shifted = logits[:, :-1, :].astype(jnp.float32)
    tgt = labels[:, 1:]
    valid = tgt != -100
    safe_tgt = jnp.where(valid, tgt, 0)
    logp = jax.nn.log_softmax(shifted, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_tgt[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll, axis=-1)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("rank_levers")
    p.add_argument("--levers", default="base,old_ce,no_remat,b32,b48,text_block")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--bank", type=int, default=100)
    p.add_argument("--k", type=int, default=64)
    args = p.parse_args(argv)

    import dataclasses

    from bench import _build_albef
    from feddat_tpu.models.albef import AlbefModel
    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()

    # one init; params are independent of batch size / remat / attn impl
    model, params, _, _, _ = _build_albef(16, "bfloat16", with_step=False)

    def variant(**cfg_kw):
        kw = {"vision_attn_impl": model.vision_attn_impl}
        for k in ("attn_impl", "vision_attn_impl"):
            if k in cfg_kw:
                kw[k] = cfg_kw.pop(k)
        cfg = dataclasses.replace(model.cfg, **cfg_kw) if cfg_kw else model.cfg
        return AlbefModel(cfg, dtype=model.dtype, **kw)

    for lever in [s.strip() for s in args.levers.split(",") if s.strip()]:
        t0 = time.time()
        B, m = 16, model
        if lever == "base":
            pass
        elif lever == "old_ce":
            import feddat_tpu.models.albef as albef_mod

            orig = albef_mod.shifted_lm_loss
            albef_mod.shifted_lm_loss = _old_shifted_lm_loss
            try:
                qps = _measure(model, params, 16, args.bank, args.k, args.warmup, args.iters)
            finally:
                albef_mod.shifted_lm_loss = orig
            print(f"old_ce: {qps:.1f} q/s (wall {time.time() - t0:.0f}s)", flush=True)
            continue
        elif lever == "no_remat":
            m = variant(remat=False)
        elif lever == "b32":
            B = 32
        elif lever == "b48":
            B = 48
        # round-5 candidate-packing levers (ops/attention.packed_self_bias;
        # numerically exact — tests/test_albef.py::test_rank_answer_pack_group_exact).
        # `base` carries the config default eval_pack_group=8 since round 5;
        # `nopack` is the reference layout for comparison.
        elif lever == "nopack":
            m = variant(eval_pack_group=1)
        elif lever == "pack4":
            m = variant(eval_pack_group=4)
        elif lever == "pack16":
            m = variant(eval_pack_group=16)
        elif lever == "pack32":
            m = variant(eval_pack_group=32)
        elif lever == "b32_nopack":
            B, m = 32, variant(eval_pack_group=1)
        elif lever == "text_block":
            m = variant(attn_impl="block")
        elif lever == "vis_block":
            # the pre-round-4-extension ViT-tower path (attn-block kernel)
            m = variant(vision_attn_impl="block")
        elif lever == "b48_vis_block":
            B, m = 48, variant(vision_attn_impl="block")
        else:
            print(f"unknown lever {lever!r}", flush=True)
            continue
        qps = _measure(m, params, B, args.bank, args.k, args.warmup, args.iters)
        print(f"{lever}: {qps:.1f} q/s (wall {time.time() - t0:.0f}s incl. compile)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
