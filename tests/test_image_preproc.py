"""Image-preprocessing parity (SURVEY.md §7.3 'PIL-exact image
preprocessing parity'): our host pipeline vs torchvision's transforms
(what the reference uses, ``vqa_dataset_crossvqa.py:533-572``,
``cocoimages_dataset_crossvqas.py:77-110``)."""

import numpy as np
import pytest
from PIL import Image

from feddat_tpu.data.images import (
    CLIP_MEAN,
    CLIP_STD,
    process_albef_image,
    process_vilt_image,
    vilt_resize,
)

def _rand_img(rng, w, h):
    return Image.fromarray(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))


def test_albef_preproc_matches_torchvision():
    """Resize((384,384), bicubic) + ToTensor + Normalize(CLIP stats)."""
    T = pytest.importorskip("torchvision.transforms")

    rng = np.random.RandomState(0)
    img = _rand_img(rng, 500, 375)
    ref = T.Compose(
        [
            T.Resize((64, 64), interpolation=T.InterpolationMode.BICUBIC),
            T.ToTensor(),
            T.Normalize(CLIP_MEAN.tolist(), CLIP_STD.tolist()),
        ]
    )(img).numpy().transpose(1, 2, 0)
    ours = process_albef_image(img, size=64)
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=1e-2)


def test_vilt_resize_rule_matches_torchvision():
    """T.Resize(size=384, max_size=640) shorter-side rule at small scale."""
    T = pytest.importorskip("torchvision.transforms")

    rng = np.random.RandomState(1)
    for w, h in [(800, 600), (600, 800), (2000, 500)]:
        img = _rand_img(rng, w, h)
        # scale the rule down: shorter 96, max 160
        ref = T.Resize(size=96, max_size=160)(img)
        ours = vilt_resize(img, shorter=96, longer=160)
        assert ours.size == ref.size, (img.size, ours.size, ref.size)


def test_vilt_canvas_mask_covers_resized_region():
    rng = np.random.RandomState(2)
    img = _rand_img(rng, 120, 60)  # small image: no resize (min side < 384)
    pixels, mask = process_vilt_image(img, canvas=(96, 160))
    assert pixels.shape == (96, 160, 3) and mask.shape == (96, 160)
    assert mask[:60, :120].all() and not mask[60:, :].any() and not mask[:, 120:].any()
    # padded region is exactly zero
    assert np.all(pixels[60:, :, :] == 0)


def test_small_image_not_upscaled():
    """Reference only resizes when min(side) > 384
    (``cocoimages_dataset_crossvqas.py:108-110``)."""
    rng = np.random.RandomState(3)
    img = _rand_img(rng, 100, 80)
    pixels, mask = process_vilt_image(img, canvas=(384, 640))
    assert mask[:80, :100].all() and mask.sum() == 80 * 100


def test_portrait_image_fits_canvas_not_cropped():
    """A portrait image (shorter side = width) resizes past the 384-row
    canvas; it must be downscaled to FIT (README deviation), never cropped."""
    rng = np.random.RandomState(4)
    img = _rand_img(rng, 480, 640)  # w=480, h=640 portrait
    pixels, mask = process_vilt_image(img, canvas=(384, 640))
    # shorter-side-384 gives (384, 512); fit-scale 384/512 gives (288, 384)
    assert mask[:384, :288].all() and mask.sum() == 384 * 288
    # content present at the bottom rows (a crop would have zeroed them)
    assert np.abs(pixels[383, :288]).sum() > 0


def test_nondefault_canvas_downscales_not_upscales():
    """Smoke-mode canvases must downscale toward the canvas, not upscale
    toward the hardcoded 384/640 and then lose everything to the clamp."""
    rng = np.random.RandomState(5)
    img = _rand_img(rng, 100, 80)
    pixels, mask = process_vilt_image(img, canvas=(64, 64))
    assert pixels.shape == (64, 64, 3)
    # scale = 64/100 -> (64, 51): the full image, downscaled
    assert mask[:51, :64].all() and mask.sum() == 51 * 64


def test_cached_pipeline_bitwise_matches_uncached(tmp_path):
    """cache_images=True (u8 cache + fused finalize, native when available)
    must produce BITWISE-identical batches to the per-image PIL+numpy path,
    and identical batches across epochs (warm cache)."""
    import os

    from PIL import Image

    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import ViltVQAPipeline
    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "vizwiz" / "images"
    os.makedirs(img_dir)
    sizes = [(480, 640), (300, 200), (384, 384), (640, 480), (100, 700)]
    for i, (h, w) in enumerate(sizes):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"img{i}.jpg"
        )
    tok = WordPieceTokenizer.toy(["what", "is", "the"])
    examples = [
        VQAExample(i, f"img{i % len(sizes)}.jpg", "what is the", [i % 4], [1.0], ["a"])
        for i in range(10)
    ]
    backend = make_backend("vizwiz", "t", str(tmp_path))
    kw = dict(num_labels=8, batch_size=5, canvas=(128, 160), max_text_len=8, seed=0)
    plain = ViltVQAPipeline(examples, backend, tok, **kw)
    cached = ViltVQAPipeline(examples, backend, tok, cache_images=True, **kw)
    for b0, b1 in zip(plain.train_batches(0), cached.train_batches(0)):
        for k in b0:
            np.testing.assert_array_equal(b0[k], b1[k], err_msg=k)
    # epoch 2: warm cache must reproduce the cold-path batches exactly
    for b0, b1 in zip(plain.train_batches(1), cached.train_batches(1)):
        for k in b0:
            np.testing.assert_array_equal(b0[k], b1[k], err_msg=k)
    assert len(cached._cache) == len(sizes)


def test_cached_albef_pipeline_bitwise_matches_uncached(tmp_path):
    import os

    from PIL import Image

    from feddat_tpu.data.albef_pipeline import AlbefVQAPipeline
    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    rng = np.random.RandomState(1)
    img_dir = tmp_path / "vizwiz" / "images"
    os.makedirs(img_dir)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)).save(
            img_dir / f"img{i}.jpg"
        )
    tok = WordPieceTokenizer.toy(["what", "is", "the", "a"])
    examples = [
        VQAExample(i, f"img{i % 4}.jpg", "what is the", [0], [1.0], ["a"])
        for i in range(8)
    ]
    backend = make_backend("vizwiz", "t", str(tmp_path))
    kw = dict(
        answer_list=["a", "the"], image_size=96, max_question_len=8,
        max_answer_len=4, batch_size=4, seed=0,
    )
    plain = AlbefVQAPipeline(examples, backend, tok, **kw)
    cached = AlbefVQAPipeline(examples, backend, tok, cache_images=True, **kw)
    for which in ("train", "eval"):
        its = (
            (plain.train_batches(0), cached.train_batches(0))
            if which == "train"
            else (plain.eval_batches(), cached.eval_batches())
        )
        for b0, b1 in zip(*its):
            for k in b0:
                np.testing.assert_array_equal(b0[k], b1[k], err_msg=f"{which}:{k}")


def test_u8_device_normalize_matches_host_normalize(tmp_path):
    """pixels_u8 pipeline + in-model normalization == host-normalized f32
    pipeline, through the real model forward (the canvas zero-pad is
    reproduced by the pixel-mask multiply)."""
    import os

    import jax
    from PIL import Image

    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import ViltVQAPipeline
    from feddat_tpu.data.tokenizer import WordPieceTokenizer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    from conftest import TINY_VILT

    rng = np.random.RandomState(3)
    img_dir = tmp_path / "vizwiz" / "images"
    os.makedirs(img_dir)
    # one image smaller than the canvas -> real zero-pad region
    for i, (h, w) in enumerate([(32, 32), (20, 28), (40, 48)]):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"img{i}.png"
        )
    tok = WordPieceTokenizer.toy(["what", "is", "the"])
    examples = [
        VQAExample(i, f"img{i % 3}.png", "what is the", [i % 4], [1.0], ["a"])
        for i in range(4)
    ]
    backend = make_backend("vizwiz", "t", str(tmp_path))
    kw = dict(num_labels=8, batch_size=4, canvas=TINY_VILT.image_size,
              max_text_len=TINY_VILT.max_text_len, seed=0)
    f32_pipe = ViltVQAPipeline(examples, backend, tok, **kw)
    u8_pipe = ViltVQAPipeline(examples, backend, tok, pixels_u8=True, **kw)
    b_f32 = next(f32_pipe.train_batches(0))
    b_u8 = next(u8_pipe.train_batches(0))
    assert b_u8["pixel_values"].dtype == np.uint8
    # u8 mode ships a compact [B, 2] (h, w) dims mask; check it encodes the
    # same rectangle the full-plane mask marks
    assert b_u8["pixel_mask"].shape == (4, 2)
    for i in range(4):
        h, w = b_u8["pixel_mask"][i]
        full = np.zeros_like(b_f32["pixel_mask"][i])
        full[:h, :w] = 1
        np.testing.assert_array_equal(b_f32["pixel_mask"][i], full)

    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=8)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), b_f32)

    @jax.jit
    def logits(b):
        _, out = model.apply({"params": params}, "t", b, adapter_mode="ensemble",
                             deterministic=True)
        return out

    np.testing.assert_allclose(
        np.asarray(logits(b_f32)), np.asarray(logits(b_u8)), rtol=1e-5, atol=1e-5
    )


def test_u8_albef_matches_host_normalize(tmp_path):
    import os

    import jax
    from PIL import Image

    from feddat_tpu.data.albef_pipeline import AlbefVQAPipeline
    from feddat_tpu.data.datasets import VQAExample
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.tokenizer import WordPieceTokenizer
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from test_albef import TINY_ALBEF

    rng = np.random.RandomState(4)
    img_dir = tmp_path / "vizwiz" / "images"
    os.makedirs(img_dir)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)).save(
            img_dir / f"img{i}.png"
        )
    tok = WordPieceTokenizer.toy(["what", "is", "the", "a"])
    examples = [
        VQAExample(i, f"img{i % 2}.png", "what is the", [0], [1.0], ["a"])
        for i in range(4)
    ]
    backend = make_backend("vizwiz", "t", str(tmp_path))
    kw = dict(answer_list=["a", "the"], image_size=TINY_ALBEF.image_res,
              max_question_len=6, max_answer_len=4, batch_size=4, seed=0)
    b_f32 = next(AlbefVQAPipeline(examples, backend, tok, **kw).train_batches(0))
    b_u8 = next(
        AlbefVQAPipeline(examples, backend, tok, pixels_u8=True, **kw).train_batches(0)
    )
    assert b_u8["pixel_values"].dtype == np.uint8
    model = AlbefModel(TINY_ALBEF)
    params = init_albef_params(model, jax.random.PRNGKey(0), b_f32)

    @jax.jit
    def loss(b):
        out, _ = model.apply({"params": params}, b, adapter_mode="ensemble",
                             deterministic=True)
        return out

    np.testing.assert_allclose(float(loss(b_f32)), float(loss(b_u8)), rtol=1e-5)
