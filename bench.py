"""Benchmark: DAT+MKD federated train-step throughput on one chip.

Measures samples/sec/chip of the full DAT training step (3 forwards +
2 backwards + 2 AdamW updates per batch, the reference's per-batch cost —
``task_trainer.py:280-330``) for BOTH model families:

  * ViLT-B/32 with triple adapters at reduction 16 (the flagship metric,
    printed LAST so drivers that parse the tail line get it);
  * ALBEF (ViT-B/16@384 + fusion BERT + 6-layer decoder) DAT train step +
    the rank-answer eval hot loop (``albef_model.py:171-228``) in q/s.

``vs_baseline`` compares the TPU-tuned configuration (bf16 compute, large
batch, fused jitted step, donated buffers) against the *reference run
configuration* executed by this same framework: batch size 2 and fp32
compute, mirroring ``src/train_vilt.sh`` / ``src/train_albef.sh`` (batch 2,
fp16-autocast on GPU).  The reference PyTorch implementation itself cannot
run on TPU hardware; its configuration can, and is the closest measurable
stand-in for "what the reference does per chip".

Prints one JSON line PER METRIC: {"metric", "value", "unit", "vs_baseline"};
the flagship ViLT line is last.
"""

import json
import sys
import time

import numpy as np


def _progress(msg: str) -> None:
    """Stage marker on stderr (stdout stays pure JSON for the driver).

    The dev tunnel's latency can balloon mid-session; without these, a
    slow stage is indistinguishable from a hang (round 5 lost a 30-minute
    run to exactly that)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _build(batch_size: int, dtype: str):
    import jax

    from feddat_tpu.configs.core import AdapterSpec, OptimizerConfig, PEFTMode, ViltModelConfig
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner
    from feddat_tpu.peft.partition import label_params, merge, split_by_roles
    from feddat_tpu.train.dat import (
        Partitioner,
        init_train_state,
        make_dat_train_step,
        make_dat_train_step_fused,
    )
    from feddat_tpu.train.losses import bce_with_logits_vqa

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        # Tuned bf16 config (round 4): the whole-LAYER Pallas kernel
        # (--attn_impl layer, ops/layer_block.py) — one fused backward per
        # layer (adapter grads + frozen FFN/LN/attention), vjp saves its own
        # minimal residual set so the stack runs WITHOUT remat: 580 samples/s
        # at B=64 vs 517 for attn-block + block_save_nox at B=48 (PERF.md).
        # The fp32 reference-config baseline keeps remat at B>8 (B=64 with
        # remat beats B=32 without: 358 vs 321 measured on v5e).
        tuned = dtype == "bfloat16"
        cfg = ViltModelConfig(
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
            remat=(batch_size > 8) and not tuned,
            remat_policy="full",
            attention_logits_dtype="bfloat16" if tuned else "float32",
            fuse_ln=tuned,
        )
        num_labels = 100
    else:  # CPU smoke-scale
        cfg = ViltModelConfig(
            vocab_size=1000,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            max_text_len=16,
            image_size=(64, 64),
            patch_size=32,
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
        )
        num_labels = 100

    import jax.numpy as jnp

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = ViltContinualLearner(
        cfg, {"fed": TaskHeadSpec(num_labels=num_labels)}, dtype=jdtype,
        attn_impl="layer" if (on_tpu and dtype == "bfloat16") else "auto",
    )

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, size=(batch_size, cfg.max_text_len)).astype(np.int32),
        "attention_mask": np.ones((batch_size, cfg.max_text_len), np.int32),
        "pixel_values": rng.randn(batch_size, cfg.image_size[0], cfg.image_size[1], 3).astype(np.float32),
        "target_scores": np.eye(num_labels, dtype=np.float32)[
            rng.randint(0, num_labels, size=batch_size)
        ],
    }
    from feddat_tpu.models.vilt import init_vilt_params

    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)

    def forward(p, b, mode, dropout_rng):
        _, logits = model.apply(
            {"params": p}, "fed", b, adapter_mode=mode, deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return bce_with_logits_vqa(logits, b["target_scores"]), logits

    opt = OptimizerConfig()
    part = Partitioner(params, "fed", PEFTMode.DAT)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        # tuned config: the fused DAT step shares one ensemble encoder pass
        # between its teacher and local-update stages (+14% measured)
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

        step = make_dat_train_step_fused(encode, head_fn, task_loss, part, opt, max_steps=10_000)
    else:
        step = make_dat_train_step(forward, part, opt, max_steps=10_000)
    return step, state, batch


def _measure(batch_size: int, dtype: str, warmup=3, iters=20) -> float:
    import jax

    step, state, batch = _build(batch_size, dtype)
    # Stage the batch in HBM once: in training the host pipeline prefetches
    # asynchronously (feddat_tpu.data.pipeline.prefetch_to_device), so steady
    # state is compute-bound, not transfer-bound.
    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, m = step(state, batch)
    # NOTE: through the axon relay ``block_until_ready`` returns before the
    # computation finishes; a scalar readback is the only reliable fence.
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])  # forces the dependent chain to materialize
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _build_albef(batch_size: int, dtype: str, answers_per_q: int = 4,
                 fused=None, with_step: bool = True, dropout: bool = True):
    """``fused=None`` -> fused iff bf16 (the tuned config; since round 4 the
    fused step THREADS live dropout through, so it is stochastic like the
    reference).  ``fused=False`` keeps the standard DAT step (the exact
    reference sequence: three independent stochastic forwards).
    ``dropout=False`` zeroes the BERT dropout rates (deterministic
    throughput mode).  ``with_step=False`` skips the
    Partitioner/opt-state/step build (rank-answer eval only needs
    model+params+batch — no AdamW moment trees in HBM)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from feddat_tpu.configs.core import (
        AdapterSpec,
        AlbefBertConfig,
        AlbefModelConfig,
        OptimizerConfig,
        PEFTMode,
    )
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
    from feddat_tpu.train.forwards import make_albef_forward
    from feddat_tpu.train.trainers import make_albef_fused_dat_step

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        # Tuned bf16 config (round 4): the whole-LAYER Pallas kernel on the
        # ViT tower (S=577, all 12 blocks are eligible adapter sites; the
        # vjp saves its own residuals so the ViT scan runs without remat)
        # — 98.6 -> 116.4 samples/s over attn-block + block_save_nox
        # (PERF.md).  The text/fusion/decoder towers (post-LN BERT) keep
        # XLA attention + block_save_nox remat.
        cfg = AlbefModelConfig(
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=16),
            remat=True,
            remat_policy="block_save_nox" if dtype == "bfloat16" else "full",
            attention_logits_dtype="bfloat16" if dtype == "bfloat16" else "float32",
            fuse_ln=(dtype == "bfloat16"),
            # round 5: selective remat for the post-LN BERT towers — saves
            # the tagged qkv (incl. the fusion layers' S=577 image K/V
            # projections, the dominant backward recompute) /attn_probs/
            # attn_out/ffn_preact instead of full recompute (+4%, PERF.md)
            text_remat_policy="names" if dtype == "bfloat16" else "full",
        )
    else:  # CPU smoke-scale
        cfg = AlbefModelConfig(
            image_res=64, patch_size=32, vision_width=32, vision_layers=2, vision_heads=4,
            bert=AlbefBertConfig(vocab_size=200, hidden_size=32, num_layers=4, num_heads=4,
                                 intermediate_size=64, fusion_layer=2),
            decoder_layers=2, max_question_len=8, max_answer_len=6,
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
        )
    if not dropout:
        cfg = dataclasses.replace(
            cfg,
            bert=dataclasses.replace(cfg.bert, hidden_dropout=0.0, attention_dropout=0.0),
        )
    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = AlbefModel(
        cfg, dtype=jdtype,
        vision_attn_impl="layer" if (on_tpu and dtype == "bfloat16") else None,
    )
    rng = np.random.RandomState(0)
    B, A, Lq, La = batch_size, answers_per_q, cfg.max_question_len, cfg.max_answer_len
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
    if not with_step:
        return model, params, None, None, batch
    opt = OptimizerConfig()
    part = Partitioner(params, "fed", PEFTMode.DAT)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    if fused is None:
        fused = dtype == "bfloat16"
    # round 5: dropout masks from the TPU hardware RNG (XLA RngBitGenerator)
    # instead of per-element threefry on the VPU — +7% with ALBEF's default
    # dropout 0.1 live on 24 BERT layer-sites (PERF.md); fp32 baseline keeps
    # the jax-default threefry.
    d_rng = "rbg" if dtype == "bfloat16" else "threefry"
    if fused:
        step, _ = make_albef_fused_dat_step(model, params, opt, max_steps=10_000,
                                            donate=True, dropout_rng=d_rng)
    else:
        forward = make_albef_forward(model)
        step = make_dat_train_step(forward, part, opt, max_steps=10_000,
                                   dropout_rng=d_rng)
    return model, params, step, state, batch


def _measure_albef_train(batch_size: int, dtype: str, warmup=3, iters=15,
                         fused=None, dropout: bool = True) -> float:
    import jax

    _, _, step, state, batch = _build_albef(batch_size, dtype, fused=fused,
                                            dropout=dropout)
    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])  # scalar-readback fence (axon relay)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _measure_albef_rank(batch_size: int = 16, bank: int = 100, k: int = 64,
                        warmup=2, iters=10) -> float:
    """Rank-answer eval throughput (two-stage top-k, the reference's eval
    hot loop ``albef_model.py:171-228``) in questions/s."""
    import jax

    from feddat_tpu.train.evaluation import make_albef_eval_step

    model, params, _, _, batch = _build_albef(batch_size, "bfloat16", with_step=False)
    rng = np.random.RandomState(1)
    La = batch["answer_ids"].shape[-1]
    V = model.cfg.bert.vocab_size
    answer_ids = rng.randint(5, V, size=(bank, La)).astype(np.int32)
    answer_mask = np.ones((bank, La), np.int32)
    eval_batch = {
        "pixel_values": batch["pixel_values"],
        "question_ids": batch["question_ids"],
        "question_mask": batch["question_mask"],
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
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _measure_vilt_e2e(dtype: str = "bfloat16", batch_size: int = 64):
    """END-TO-END round throughput with the REAL host pipeline: on-disk JPEGs
    decoded + resized + normalized, questions WordPiece-tokenized per batch,
    double-buffered device staging (``prefetch_to_device``) — the exact
    pipeline-inside-forward failure mode of the reference
    (``src/modeling/vilt.py:98-99``) this framework moves off the step path.

    Returns (staged_sps, e2e_sps, cold_sps): the SAME jitted program fed
    (a) one HBM-resident batch, (b) the live pipeline warm (u8 cache hot),
    (c) the live pipeline cold (fresh cache, first-epoch cost), so the
    deltas isolate host feeding.  Canvas (384, 384) to match the staged
    benchmark's sequence length."""
    import os
    import tempfile

    import jax
    from PIL import Image

    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import ViltVQAPipeline, prefetch_to_device
    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        batch_size = 8
    n_images = 256 if on_tpu else 16
    n_examples = batch_size * (26 if on_tpu else 3)

    step, state, _ = _build(batch_size, dtype)

    vocab_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "vocab30k.txt"
    )
    # CPU smoke builds a vocab_size=1000 model — the 30k vocab's ids would
    # silently clamp in the embedding gather; use the toy tokenizer there
    if on_tpu and os.path.isfile(vocab_file):
        tokenizer = WordPieceTokenizer.from_vocab_file(vocab_file)
        try:
            from feddat_tpu import native

            if native.available():
                tokenizer = native.NativeWordPiece(tokenizer.vocab)
        except Exception:
            pass
    else:
        tokenizer = WordPieceTokenizer.toy(
            ["what", "is", "the", "color", "of", "thing", "in", "picture"]
        )

    rng = np.random.RandomState(0)
    words = ["what", "is", "the", "color", "of", "thing", "in", "picture",
             "how", "many", "people", "doing", "wearing", "holding"]
    with tempfile.TemporaryDirectory() as tmp:
        img_dir = os.path.join(tmp, "vizwiz", "images")
        os.makedirs(img_dir)
        for i in range(n_images):
            # realistic decode cost: 640x480 JPEG (noise decodes slower than
            # natural images -> slightly pessimistic host cost)
            Image.fromarray(
                rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, f"img{i}.jpg"), quality=90)
        examples = [
            VQAExample(
                question_id=i,
                image_id=f"img{i % n_images}.jpg",
                question=" ".join(words[j] for j in rng.randint(0, len(words), 8)),
                labels=[int(rng.randint(0, 100))],
                scores=[1.0],
                answers=["a"],
            )
            for i in range(n_examples)
        ]
        backend = make_backend("vizwiz", "bench", tmp)
        # cache_images: decode+resize once (u8), per-epoch normalize+pad
        # fused in the native core — the steady-state training config (the
        # federated loop revisits every client's data each round)
        # pixels_u8: raw uint8 to the chip + on-device normalize (4x less
        # host->device traffic — decisive through the dev tunnel's ~22 MB/s,
        # and a real PCIe/infeed win on production hosts)
        pipe_kwargs = dict(
            num_labels=100, batch_size=batch_size, seed=0,
            cache_images=True, pixels_u8=True,
            # match the staged model's shapes (_build): canvas = image_size,
            # same max_text_len
            **({"canvas": (384, 384)} if on_tpu
               else {"canvas": (64, 64), "max_text_len": 16}),
        )
        pipe = ViltVQAPipeline(examples, backend, tokenizer, **pipe_kwargs)
        # a SEPARATE pipeline instance for the cold/warm passes: staging one
        # batch below warms `pipe`'s u8 cache with that batch's images,
        # which would make the "cold" epoch start partially warm
        pipe_live = ViltVQAPipeline(examples, backend, tokenizer, **pipe_kwargs)

        # (a) staged: one pipeline batch resident in HBM (same program)
        staged = jax.device_put(next(pipe.train_batches(0)))
        for _ in range(3):
            state, m = step(state, staged)
        float(m["loss"])  # scalar-readback fence (axon relay)
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, staged)
        float(m["loss"])
        staged_sps = batch_size * iters / (time.perf_counter() - t0)

        # (b) live cold: first pass decodes + resizes every unique image
        # from disk (fresh pipeline instance -> fully cold cache)
        n_steps = 0
        t0 = time.perf_counter()
        for batch in prefetch_to_device(pipe_live.train_batches(1), size=2):
            state, m = step(state, batch)
            n_steps += 1
        float(m["loss"])
        cold_sps = batch_size * n_steps / (time.perf_counter() - t0)
        # (c) live warm: steady state (u8 cache hot — rounds 2..R of training)
        t0 = time.perf_counter()
        for batch in prefetch_to_device(pipe_live.train_batches(2), size=2):
            state, m = step(state, batch)
        float(m["loss"])
        e2e_sps = batch_size * n_steps / (time.perf_counter() - t0)
    return staged_sps, e2e_sps, cold_sps


def _measure_albef_e2e(batch_size: int = 16):
    """ALBEF end-to-end round with the real host pipeline (decode + resize +
    tokenize + staging; u8 pixels, warm image cache) vs the SAME program fed
    one staged batch.  Returns (staged_sps, live_sps)."""
    import os
    import tempfile

    import jax
    from PIL import Image

    from feddat_tpu.data.albef_pipeline import AlbefVQAPipeline
    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import prefetch_to_device
    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        batch_size = 4
    n_images = 128 if on_tpu else 8
    n_steps_total = 16 if on_tpu else 3

    model, params, step, state, _ = _build_albef(batch_size, "bfloat16")
    vocab_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "vocab30k.txt"
    )
    if on_tpu and os.path.isfile(vocab_file):
        tokenizer = WordPieceTokenizer.from_vocab_file(vocab_file)
        try:
            from feddat_tpu import native

            if native.available():
                tokenizer = native.NativeWordPiece(tokenizer.vocab)
        except Exception:
            pass
    else:
        tokenizer = WordPieceTokenizer.toy(
            ["what", "is", "the", "color", "of", "thing", "in", "picture"]
        )
    rng = np.random.RandomState(0)
    words = ["what", "is", "the", "color", "of", "thing", "in", "picture"]
    with tempfile.TemporaryDirectory() as tmp:
        img_dir = os.path.join(tmp, "vizwiz", "images")
        os.makedirs(img_dir)
        for i in range(n_images):
            Image.fromarray(
                rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, f"img{i}.jpg"), quality=90)
        examples = [
            VQAExample(
                i, f"img{i % n_images}.jpg",
                " ".join(words[j] for j in rng.randint(0, len(words), 6)),
                [int(rng.randint(0, 100))], [1.0], ["a"],
            )
            for i in range(batch_size * n_steps_total)
        ]
        backend = make_backend("vizwiz", "bench", tmp)
        pipe = AlbefVQAPipeline(
            examples, backend, tokenizer, answer_list=["a"] * 100,
            batch_size=batch_size, seed=0, cache_images=True, pixels_u8=True,
            **({} if on_tpu else {"image_size": 64, "max_question_len": 8,
                                  "max_answer_len": 6}),
        )
        staged = jax.device_put(next(pipe.train_batches(0)))
        for _ in range(3):
            state, m = step(state, staged)
        float(m["loss"])  # scalar-readback fence (axon relay)
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, staged)
        float(m["loss"])
        staged_sps = batch_size * 10 / (time.perf_counter() - t0)
        n = 0
        for b in prefetch_to_device(pipe.train_batches(1), size=2):
            state, m = step(state, b)
            n += 1
        float(m["loss"])
        t0 = time.perf_counter()
        for b in prefetch_to_device(pipe.train_batches(2), size=2):
            state, m = step(state, b)
        float(m["loss"])
        live_sps = batch_size * n / (time.perf_counter() - t0)
    return staged_sps, live_sps


def main():
    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip the ~8 min of compiles

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"

    # -- ALBEF (secondary metrics, printed first) --------------------------
    # B=48 is the round-5 tuned optimum for the headline fused step (131.5
    # vs 128.9 at B=16 with names+rbg, PERF.md round-5 lever table); the
    # secondary variants keep B=16 (their round-4 comparison points).
    albef_bs = 48 if on_tpu else 4
    albef_bs_small = 16 if on_tpu else 4
    # the tuned fused step CARRIES live dropout since round 4 (fresh masks
    # per step; the one deviation from the reference's three independent
    # draws — stages ①/③ share the ensemble pass's mask — is
    # distribution-level-equivalence-tested, tests/test_dat_fused.py)
    _progress(f"albef tuned fused+dropout B={albef_bs}")
    albef_tuned = _measure_albef_train(albef_bs, "bfloat16")
    # sequence-exact variant: the standard bf16 step (three independent
    # stochastic forwards — bitwise the reference sequence, like the fp32
    # baseline below)
    _progress(f"albef sequence-exact standard step B={albef_bs_small}")
    albef_tuned_dropout = _measure_albef_train(albef_bs_small, "bfloat16", fused=False)
    # throughput mode with dropout disabled (the pre-round-4 headline;
    # deterministic shared ensemble pass)
    _progress(f"albef dropout-off B={albef_bs_small}")
    albef_tuned_det = _measure_albef_train(albef_bs_small, "bfloat16", dropout=False)
    # 30 iters: the B=2 fp32 denominator is latency-dominated and noisy at
    # few iters (same lesson as the ViLT baseline below)
    _progress("albef fp32 B=2 baseline (30 iters, latency-dominated)")
    albef_base = _measure_albef_train(2, "float32", warmup=3, iters=30)
    _progress("albef rank-answer eval")
    rank_qps = _measure_albef_rank(batch_size=16 if on_tpu else 2,
                                   bank=100, k=64 if on_tpu else 8)
    _progress("albef e2e round (staged + live)")
    albef_e2e_staged, albef_e2e_live = _measure_albef_e2e()
    print(
        json.dumps(
            {
                "metric": "albef_dat_train_samples_per_sec_per_chip",
                "value": round(albef_tuned, 2),
                "unit": "samples/s",
                "vs_baseline": round(albef_tuned / albef_base, 2),
                "baseline_samples_per_sec": round(albef_base, 2),
                # the headline fused step now CARRIES dropout (reference
                # default 0.1; distribution-level parity — see PERF.md);
                # this is the standard bf16 step — the exact reference
                # SEQUENCE (three independent draws) — and its own ratio
                "dropout_exact_samples_per_sec": round(albef_tuned_dropout, 2),
                "dropout_exact_vs_baseline": round(albef_tuned_dropout / albef_base, 2),
                # dropout disabled entirely (pre-round-4 throughput mode)
                "dropout_off_samples_per_sec": round(albef_tuned_det, 2),
                "rank_answer_questions_per_sec": round(rank_qps, 2),
                # end-to-end round with the real host pipeline (u8 pixels,
                # warm image cache) vs the same program fed from HBM
                "e2e_round_samples_per_sec": round(albef_e2e_live, 2),
                "e2e_staged_same_program_samples_per_sec": round(albef_e2e_staged, 2),
            }
        ),
        flush=True,
    )

    # -- end-to-end with the real host pipeline (VERDICT r2 item 3) --------
    _progress("vilt e2e round (staged + live + cold)")
    e2e_staged, e2e_live, e2e_cold = _measure_vilt_e2e("bfloat16")
    print(
        json.dumps(
            {
                "metric": "vilt_dat_e2e_round_samples_per_sec",
                "value": round(e2e_live, 2),
                "unit": "samples/s",
                # same jitted program fed from HBM: the delta isolates the
                # host pipeline (JPEG decode + resize + tokenize + staging).
                # Named vs_STAGED: this is a live-vs-staged ratio, NOT the
                # tuned-vs-fp32-baseline ratio the other lines report.
                "vs_staged": round(e2e_live / e2e_staged, 2),
                "staged_same_program_samples_per_sec": round(e2e_staged, 2),
                # first-epoch cost (each UNIQUE image decoded+resized from
                # disk once on this 1-CPU host; rounds 2..R run at `value`)
                "cold_first_epoch_samples_per_sec": round(e2e_cold, 2),
            }
        ),
        flush=True,
    )

    # -- ViLT (flagship metric, LAST line) ----------------------------------
    # per-pass B=64 is the measured optimum for the whole-layer-kernel
    # config (B=48: 569, B=64: 580, B=96: 570 samples/s — PERF.md round 4)
    tuned_bs = 64 if on_tpu else 8
    _progress(f"vilt tuned layer-kernel B={tuned_bs}")
    tuned = _measure(tuned_bs, "bfloat16")
    # 50 iters: the B=2 denominator is latency-dominated and noisy at 10
    # (and still ~3% run-to-run at 30); the extra second buys stability
    _progress("vilt fp32 B=2 baseline (50 iters)")
    baseline = _measure(2, "float32", warmup=5, iters=50)
    print(
        json.dumps(
            {
                "metric": "vilt_dat_train_samples_per_sec_per_chip",
                "value": round(tuned, 2),
                "unit": "samples/s",
                "vs_baseline": round(tuned / baseline, 2),
                # the denominator: THIS framework at the reference's own
                # B=2 fp32 config (fully jitted; ~81% of fp32 matmul peak) —
                # a conservative stand-in for the torch reference, which
                # cannot run on TPU.  See BASELINE.md / PERF.md.
                "baseline_samples_per_sec": round(baseline, 2),
                "e2e_round_samples_per_sec": round(e2e_live, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
