#!/usr/bin/env python
"""Canvas-bucketing e2e measurement (VERDICT r4 item 7; PERF.md round 5).

The CLI's ViLT canvas is (384, 640) (the reference's shorter-384 /
longer<=640 resize envelope as one static shape), but portrait/square
images only fill a (384, <=384) top-left rectangle — the rest is zero pad
shipped over the host->device link every step.  ``--canvas_bucket`` pads
those train batches onto a square (384, 384) canvas instead (exactness:
tests/test_canvas_bucket.py).

This measures warm-live e2e round throughput (u8 cache hot, pixels_u8,
prefetch) at the (384, 640) canvas over a 50/50 portrait/landscape image
mix, bucketed vs not, plus the staged reference of each program.

    python scripts/perf_canvas_bucket.py [--batch 48] [--iters-epochs 2]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser("perf_canvas_bucket")
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--examples_per_batch", type=int, default=20)
    p.add_argument("--portrait_frac", type=float, default=0.5,
                   help="fraction of portrait (narrow-bucket) images; 1.0 "
                        "isolates the narrow program (no two-program "
                        "alternation in the bucketed arm)")
    p.add_argument("--reps", type=int, default=3,
                   help="interleaved repetitions per arm (median reported): "
                        "the dev tunnel's H2D rate drifts ~2x between "
                        "minutes, so back-to-back single shots mislead")
    args = p.parse_args(argv)

    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()

    import jax
    from PIL import Image

    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import ViltVQAPipeline, prefetch_to_device
    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_sweep import build  # the tuned ViLT step builder

    B = args.batch
    # tuned config but at the CLI canvas (384, 640)
    step, state, _ = build(B, False, "layer", "bfloat16", True,
                           image_size=(384, 640))

    tokenizer = WordPieceTokenizer.toy(
        ["what", "is", "the", "color", "of", "thing", "in", "picture"]
    )
    rng = np.random.RandomState(0)
    n_images = args.images
    n_examples = B * args.examples_per_batch
    with tempfile.TemporaryDirectory() as tmp:
        img_dir = os.path.join(tmp, "vizwiz", "images")
        os.makedirs(img_dir)
        n_portrait = int(round(args.portrait_frac * n_images))
        for i in range(n_images):
            # landscape (wide bucket) vs portrait (narrow bucket) mix
            w, h = (480, 640) if i < n_portrait else (640, 480)
            Image.fromarray(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, f"img{i}.jpg"), quality=90)
        examples = [
            VQAExample(
                question_id=i, image_id=f"img{i % n_images}.jpg",
                question="what is the thing", labels=[int(rng.randint(0, 100))],
                scores=[1.0], answers=["a"],
            )
            for i in range(n_examples)
        ]
        backend = make_backend("vizwiz", "bench", tmp)

        def run(bucket: bool):
            pipe = ViltVQAPipeline(
                examples, backend, tokenizer, num_labels=100, batch_size=B,
                seed=0, cache_images=True, pixels_u8=True,
                canvas=(384, 640), canvas_bucket=bucket,
            )
            nonlocal state
            # warm epoch: decode cache + compile both shapes
            for batch in prefetch_to_device(pipe.train_batches(0), size=2):
                state, m = step(state, batch)
            float(m["loss"])
            n_steps = 0
            t0 = time.perf_counter()
            for batch in prefetch_to_device(pipe.train_batches(1), size=2):
                state, m = step(state, batch)
                n_steps += 1
            float(m["loss"])
            return B * n_steps / (time.perf_counter() - t0)

        plain_reps, bucket_reps = [], []
        for rep in range(args.reps):
            plain_reps.append(run(False))
            bucket_reps.append(run(True))
            print(f"  rep {rep}: plain {plain_reps[-1]:.1f} vs bucketed "
                  f"{bucket_reps[-1]:.1f} samples/s", flush=True)
        plain = float(np.median(plain_reps))
        bucketed = float(np.median(bucket_reps))
        print(f"e2e warm-live (B={B}, portrait_frac={args.portrait_frac}, canvas 384x640, "
              f"median of {args.reps} interleaved reps): "
              f"plain {plain:.1f} vs bucketed {bucketed:.1f} samples/s "
              f"({bucketed / plain:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
