"""Native C++ pipeline core vs pure-Python references."""

import numpy as np
import pytest

from feddat_tpu import native
from feddat_tpu.data.tokenizer import WordPieceTokenizer

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_native_wordpiece_matches_python():
    tok = WordPieceTokenizer.toy(["what", "is", "the", "dog", "color", "doing"])
    ntok = native.NativeWordPiece(tok.vocab)
    texts = ["What is the dog color?", "the dog, doing!", "unknownword here", ""]
    ids_py, mask_py = tok.batch_encode(texts, 12)
    ids_c, mask_c = ntok.batch_encode(texts, 12)
    np.testing.assert_array_equal(ids_c, ids_py)
    np.testing.assert_array_equal(mask_c, mask_py)


def test_native_resize_matches_numpy_bilinear():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(3, 20, 24, 3), dtype=np.uint8)
    mean = [0.5, 0.5, 0.5]
    std = [0.5, 0.5, 0.5]
    out = native.resize_normalize_batch(imgs, (10, 12), mean, std, num_threads=2)
    assert out.shape == (3, 10, 12, 3)

    # reference: half-pixel bilinear in numpy
    def ref_resize(img, oh, ow):
        h, w, _ = img.shape
        ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
        xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
        y0 = ys.astype(int); y1 = np.minimum(y0 + 1, h - 1); wy = (ys - y0)[:, None, None]
        x0 = xs.astype(int); x1 = np.minimum(x0 + 1, w - 1); wx = (xs - x0)[None, :, None]
        f = img.astype(np.float64)
        top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
        bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
        return top * (1 - wy) + bot * wy

    ref = ref_resize(imgs[0], 10, 12) / 255.0
    ref = (ref - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-4)


def test_native_resize_identity_when_same_size():
    imgs = np.full((1, 8, 8, 3), 128, np.uint8)
    out = native.resize_normalize_batch(imgs, (8, 8), [0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(out, 128 / 255.0, atol=1e-6)


def test_finalize_canvas_batch_direct():
    """Direct contract test of the fused native finalize: variable-size u8
    images -> normalized f32 canvas + mask, bitwise equal to numpy."""
    native = pytest.importorskip("feddat_tpu.native")
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    mean, std = [0.5, 0.4, 0.3], [0.5, 0.6, 0.7]
    H, W = 48, 64
    imgs = [
        rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        for (h, w) in [(48, 64), (20, 30), (60, 80), (48, 10)]
    ]
    out, mask = native.finalize_canvas_batch(imgs, (H, W), mean, std, num_threads=2)
    assert out.shape == (4, H, W, 3) and mask.shape == (4, H, W)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    for i, a in enumerate(imgs):
        h, w = min(a.shape[0], H), min(a.shape[1], W)
        want = np.zeros((H, W, 3), np.float32)
        want[:h, :w] = (a[:h, :w].astype(np.float32) / np.float32(255.0) - m) / s
        wmask = np.zeros((H, W), np.int32)
        wmask[:h, :w] = 1
        np.testing.assert_array_equal(out[i], want)
        np.testing.assert_array_equal(mask[i], wmask)
    # no-mask variant (ALBEF: exact-size resize)
    out2, mask2 = native.finalize_canvas_batch(
        imgs[:1], (H, W), mean, std, with_mask=False
    )
    assert mask2 is None
    np.testing.assert_array_equal(out2[0], out[0])
