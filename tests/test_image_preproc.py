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
