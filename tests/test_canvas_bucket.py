"""Canvas bucketing (VERDICT r4 item 7): narrow train batches pad onto a
square canvas instead of the full landscape one.

Exactness contract: the reference resize rule is untouched (the u8 cache is
shared across buckets); only the zero-pad shrinks, and the model slices the
top-left subgrid of its learned position grid — so per-image pixels and
model outputs are identical between the bucketed and full-canvas layouts.
"""

import io

import jax
import numpy as np
import pytest
from PIL import Image

from feddat_tpu.data.pipeline import ViltVQAPipeline
from conftest import TINY_VILT, tiny_batch


class _FakeBackend:
    """In-memory image backend with controlled aspect ratios."""

    def __init__(self, sizes):
        # image_id -> PIL image of the given (w, h), deterministic content
        self.images = {}
        rng = np.random.RandomState(0)
        for i, (w, h) in enumerate(sizes):
            arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            self.images[i] = Image.fromarray(arr)

    def load(self, image_id):
        return self.images[image_id]


class _FakeTokenizer:
    def batch_encode(self, texts, max_len):
        ids = np.ones((len(texts), max_len), np.int32)
        return ids, np.ones_like(ids)


class _Ex:
    def __init__(self, i):
        self.image_id = i
        self.question = "q"
        self.labels = [i % 4]
        self.scores = [1.0]


def _make_pipeline(canvas_bucket, pixels_u8=False, cache_images=False):
    # 8 narrow (portrait/square) + 8 wide (landscape) images.  (500, 800)
    # portraits have min(side) > 384, so they take the stage-1 shorter/longer
    # resize — whose thresholds depend on the canvas; they pin that the
    # bucketed decode keeps the FULL-canvas rule (longer cap 640, two bicubic
    # passes) instead of resizing with the narrow canvas's 384 cap
    sizes = (
        [(300, 400)] * 2 + [(500, 800)] * 2 + [(384, 384)] * 4
        + [(900, 500)] * 4 + [(640, 300)] * 4
    )
    backend = _FakeBackend(sizes)
    examples = [_Ex(i) for i in range(16)]
    return ViltVQAPipeline(
        examples, backend, _FakeTokenizer(), num_labels=4,
        max_text_len=4, canvas=(384, 640), batch_size=4, seed=0,
        num_workers=0, canvas_bucket=canvas_bucket, pixels_u8=pixels_u8,
        cache_images=cache_images,
    )


def test_bucketed_epoch_shapes_and_pixel_equality():
    plain = _make_pipeline(False)
    bucketed = _make_pipeline(True)

    plain_pixels = {}
    n_plain = 0
    for batch in plain.train_batches(0):
        assert batch["pixel_values"].shape[1:3] == (384, 640)
        for j in range(len(batch["input_ids"])):
            # identify the example by its target label + image content hash
            img = batch["pixel_values"][j]
            lab = int(batch["target_scores"][j].argmax())
            plain_pixels.setdefault(lab, []).append(img)
        n_plain += 1

    n_narrow = n_wide = 0
    for batch in bucketed.train_batches(0):
        H, W = batch["pixel_values"].shape[1:3]
        assert (H, W) in ((384, 384), (384, 640))
        if W == 384:
            n_narrow += 1
        else:
            n_wide += 1
        for j in range(len(batch["input_ids"])):
            img = batch["pixel_values"][j]
            lab = int(batch["target_scores"][j].argmax())
            # the narrow canvas is the top-left crop of the wide one; every
            # bucketed image must match SOME plain image of the same label
            # exactly on its region (and, for narrow batches, the plain
            # image must be empty beyond the crop — i.e. truly narrow)
            matches = [
                p for p in plain_pixels[lab]
                if np.array_equal(p[:H, :W], img)
                and (W == 640 or not p[:, W:].any())
            ]
            assert matches, f"bucketed image (label {lab}) not found in plain epoch"
    assert n_narrow >= 1 and n_wide >= 1, (n_narrow, n_wide)
    assert n_narrow + n_wide == n_plain == bucketed.steps_per_epoch


def test_resized_wh_matches_decode():
    pipe = _make_pipeline(True)
    from feddat_tpu.data.images import vilt_resized_u8

    for ex in pipe.examples:
        h, w = pipe._resized_wh(ex)
        arr = vilt_resized_u8(pipe.backend.load(ex.image_id), pipe.canvas)
        assert arr.shape[:2] == (h, w), (ex.image_id, arr.shape, (h, w))


def test_bucketed_u8_path():
    bucketed = _make_pipeline(True, pixels_u8=True, cache_images=True)
    shapes = set()
    for batch in bucketed.train_batches(0):
        assert batch["pixel_values"].dtype == np.uint8
        assert batch["pixel_mask"].shape[-1] == 2  # compact rectangle dims
        shapes.add(batch["pixel_values"].shape[1:3])
    assert (384, 384) in shapes and (384, 640) in shapes


def test_model_narrow_canvas_exact():
    """A narrow-canvas batch produces EXACTLY the full-canvas logits: the
    sliced position subgrid + masked padding are the same computation."""
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    import dataclasses

    cfg = dataclasses.replace(TINY_VILT, image_size=(32, 64))
    model = ViltContinualLearner(cfg, {"coco": TaskHeadSpec(num_labels=8)})
    rng = np.random.RandomState(0)
    B = 2
    batch_wide = tiny_batch(rng, batch_size=B, cfg=dataclasses.replace(cfg, image_size=(32, 64)), num_labels=8)
    # narrow content: zero out the right half and mask it
    batch_wide["pixel_values"][:, :, 32:, :] = 0.0
    mask_wide = np.zeros((B, 32, 64), np.int32)
    mask_wide[:, :, :32] = 1
    batch_wide["pixel_mask"] = mask_wide

    batch_narrow = dict(batch_wide)
    batch_narrow["pixel_values"] = batch_wide["pixel_values"][:, :, :32, :]
    batch_narrow["pixel_mask"] = mask_wide[:, :, :32]

    params = init_vilt_params(model, jax.random.PRNGKey(0), batch_wide)

    def logits(b):
        _, lg = model.apply(
            {"params": b_params}, "coco", b, adapter_mode="ensemble", deterministic=True
        )
        return np.asarray(lg)

    b_params = params
    lw = logits(batch_wide)
    ln = logits(batch_narrow)
    np.testing.assert_allclose(lw, ln, rtol=1e-6, atol=1e-6)
