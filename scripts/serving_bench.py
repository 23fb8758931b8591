#!/usr/bin/env python
"""Serving-path throughput/latency bench (PERF.md "Serving" section).

Measures the deployed prediction surface (feddat_tpu/serving.py) on the
real chip: end-to-end ``predict()`` (host preprocess + pad + jitted forward
+ top-k) and the jitted forward alone, for both families.

    python scripts/serving_bench.py

NOTE: the dev host exposes ONE CPU core, so the end-to-end numbers are the
pessimistic host-bound floor (a production TPU VM host has ~100 cores and
its preprocess parallelizes across the batch); the forward-only line is the
chip-side ceiling.
"""

import json
import sys
import time

import numpy as np


def _tokenizer():
    import os

    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    vocab_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "vocab30k.txt",
    )
    if os.path.isfile(vocab_file):
        tok = WordPieceTokenizer.from_vocab_file(vocab_file)
        try:
            from feddat_tpu import native

            if native.available():
                return native.NativeWordPiece(tok.vocab), len(tok.vocab)
        except Exception:
            pass
        return tok, len(tok.vocab)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "color", "of", "thing"])
    return tok, len(tok.vocab)


def bench_vilt(batch_size=16, n_images=64, iters=10):
    import jax
    from PIL import Image

    from feddat_tpu.configs.core import AdapterSpec, ViltModelConfig
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.serving import ViltVqaPredictor

    on_tpu = jax.devices()[0].platform == "tpu"
    tok, vocab = _tokenizer()
    if on_tpu:
        cfg = ViltModelConfig(
            vocab_size=max(vocab, 30522),
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2")),
            attention_logits_dtype="bfloat16",
        )
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    else:
        cfg = ViltModelConfig(
            vocab_size=max(vocab, 64), hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_text_len=16, image_size=(64, 64), patch_size=32,
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2")),
        )
        import jax.numpy as jnp

        dtype = jnp.float32
        batch_size, n_images, iters = 4, 8, 3
    model = ViltContinualLearner(cfg, {"fed": TaskHeadSpec(num_labels=100)}, dtype=dtype)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": np.ones((2, cfg.max_text_len), np.int32),
        "attention_mask": np.ones((2, cfg.max_text_len), np.int32),
        "pixel_values": np.zeros((2, cfg.image_size[0], cfg.image_size[1], 3), np.float32),
        "target_scores": np.zeros((2, 100), np.float32),
    }
    import jax

    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    pred = ViltVqaPredictor(
        model, params, "fed", tok, [f"ans{i}" for i in range(100)],
        batch_size=batch_size, canvas=cfg.image_size,
        max_text_len=cfg.max_text_len,
        batch_buckets=(1,),  # latency bucket: single requests skip the
                             # batch_size-padded pixel payload
    )
    imgs = [
        Image.fromarray(rng.randint(0, 255, (480, 640, 3), dtype=np.uint8))
        for _ in range(n_images)
    ]
    qs = ["what is the color of the thing in the picture"] * n_images

    pred.predict(imgs[:batch_size], qs[:batch_size])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        pred.predict(imgs, qs)
    e2e = n_images * iters / (time.perf_counter() - t0)

    # single-request latency (B=1 bucket)
    pred.predict(imgs[:1], qs[:1])  # bucket compile + warm
    lat = []
    for i in range(min(10, n_images)):
        t0 = time.perf_counter()
        pred.predict(imgs[i : i + 1], qs[:1])
        lat.append(time.perf_counter() - t0)

    # forward-only (chip-side ceiling): staged pre-preprocessed batch
    staged, _ = (
        pred._preprocess(imgs[:batch_size], qs[:batch_size]),
        None,
    )
    staged = jax.device_put(staged)
    probs = pred._forward(pred._params, staged, pred.adapter_mode)
    float(np.asarray(probs)[0, 0])  # readback fence
    t0 = time.perf_counter()
    for _ in range(20):
        probs = pred._forward(pred._params, staged, pred.adapter_mode)
    float(np.asarray(probs)[0, 0])
    fwd = batch_size * 20 / (time.perf_counter() - t0)
    return {
        "metric": "vilt_serving",
        "e2e_predictions_per_sec": round(e2e, 2),
        "forward_only_predictions_per_sec": round(fwd, 2),
        "single_request_p50_ms": round(1000 * float(np.median(lat)), 1),
        "batch_size": batch_size,
    }


def bench_albef(batch_size=16, n_images=32, iters=5):
    import jax
    from PIL import Image

    from feddat_tpu.configs.core import AdapterSpec, AlbefBertConfig, AlbefModelConfig
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.serving import AlbefVqaPredictor

    on_tpu = jax.devices()[0].platform == "tpu"
    tok, vocab = _tokenizer()
    import jax.numpy as jnp

    if on_tpu:
        cfg = AlbefModelConfig(
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2")),
            attention_logits_dtype="bfloat16",
        )
        dtype, k = jnp.bfloat16, 64
    else:
        cfg = AlbefModelConfig(
            image_res=64, patch_size=32, vision_width=32, vision_layers=2,
            vision_heads=4,
            bert=AlbefBertConfig(vocab_size=max(vocab, 200), hidden_size=32,
                                 num_layers=4, num_heads=4, intermediate_size=64,
                                 fusion_layer=2),
            decoder_layers=2, max_question_len=8, max_answer_len=6,
            adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2")),
        )
        dtype, k = jnp.float32, 8
        batch_size, n_images, iters = 4, 8, 2
    model = AlbefModel(cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    B, Lq, La = 2, cfg.max_question_len, cfg.max_answer_len
    batch = {
        "pixel_values": rng.randn(B, cfg.image_res, cfg.image_res, 3).astype(np.float32),
        "question_ids": np.ones((B, Lq), np.int32),
        "question_mask": np.ones((B, Lq), np.int32),
        "answer_ids": np.ones((B, 2, La), np.int32),
        "answer_mask": np.ones((B, 2, La), np.int32),
        "answer_weights": np.full((B, 2), 0.5, np.float32),
    }
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    pred = AlbefVqaPredictor(
        model, params, tok, [f"answer {i}" for i in range(100)],
        batch_size=batch_size, k=k,
        max_question_len=cfg.max_question_len, max_answer_len=cfg.max_answer_len,
        batch_buckets=(1,),
    )
    imgs = [
        Image.fromarray(rng.randint(0, 255, (480, 640, 3), dtype=np.uint8))
        for _ in range(n_images)
    ]
    qs = ["what is the color of the thing"] * n_images
    pred.predict(imgs[:batch_size], qs[:batch_size])
    t0 = time.perf_counter()
    for _ in range(iters):
        pred.predict(imgs, qs)
    e2e = n_images * iters / (time.perf_counter() - t0)
    pred.predict(imgs[:1], qs[:1])  # bucket compile + warm
    lat = []
    for i in range(min(6, n_images)):
        t0 = time.perf_counter()
        pred.predict(imgs[i : i + 1], qs[:1])
        lat.append(time.perf_counter() - t0)
    return {
        "metric": "albef_serving",
        "e2e_questions_per_sec": round(e2e, 2),
        "single_request_p50_ms": round(1000 * float(np.median(lat)), 1),
        "batch_size": batch_size,
        "rerank_k": k,
    }


def main():
    import os

    import jax

    # the axon sitecustomize imports jax at startup and pins the platform;
    # honor an explicit JAX_PLATFORMS=cpu request (same dance as
    # __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    print(json.dumps(bench_vilt()), flush=True)
    print(json.dumps(bench_albef()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
