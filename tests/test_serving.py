"""Serving surface: fixed-shape jitted predictors for both families."""

import jax
import numpy as np
import pytest
from PIL import Image

from feddat_tpu.data.tokenizer import WordPieceTokenizer
from feddat_tpu.serving import AlbefVqaPredictor, ViltVqaPredictor

from conftest import TINY_VILT


def _images(n, rng, hw=(40, 56)):
    return [
        Image.fromarray(rng.randint(0, 255, (*hw, 3), dtype=np.uint8)) for _ in range(n)
    ]


def test_vilt_predictor_structure_and_padding_invariance():
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    rng = np.random.RandomState(0)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "color"])
    label2ans = [f"ans{i}" for i in range(16)]
    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    imgs = _images(5, rng)
    questions = [f"what is the color {i}" for i in range(5)]

    def make(batch_size):
        p = ViltVqaPredictor(
            model, None, "t", tok, label2ans, batch_size=batch_size,
            canvas=TINY_VILT.image_size, max_text_len=TINY_VILT.max_text_len,
        )
        batch = p._preprocess(imgs[:2], questions[:2])
        params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
        p._params = params
        return p

    pred8 = make(8).predict(imgs, questions, top_k=3)
    assert len(pred8) == 5 and all(len(r) == 3 for r in pred8)
    for row in pred8:
        probs = [p for _, p in row]
        assert probs == sorted(probs, reverse=True)
        assert all(a in label2ans for a, _ in row)
    # chunked (2 batches of 4, zero-padded) must equal the one-batch result
    pred4 = make(4).predict(imgs, questions, top_k=3)
    for r8, r4 in zip(pred8, pred4):
        assert [a for a, _ in r8] == [a for a, _ in r4]
        np.testing.assert_allclose(
            [p for _, p in r8], [p for _, p in r4], rtol=1e-5, atol=1e-6
        )


def test_albef_predictor_structure():
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from test_albef import TINY_ALBEF

    rng = np.random.RandomState(1)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "a", "red", "blue"])
    answers = ["red", "blue", "a red", "the blue", "a", "the"]
    model = AlbefModel(TINY_ALBEF)
    imgs = _images(3, rng)
    questions = ["what is the a", "what is red", "is the blue a"]

    p = AlbefVqaPredictor(
        model, None, tok, answers, batch_size=4, k=4,
        max_question_len=6, max_answer_len=4,
    )
    batch = p._preprocess(imgs, questions)
    batch["answer_ids"] = np.zeros((3, 2, 4), np.int32)
    batch["answer_mask"] = np.zeros((3, 2, 4), np.int32)
    batch["answer_weights"] = np.zeros((3, 2), np.float32)
    p._params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    out = p.predict(imgs, questions, top_k=2)
    assert len(out) == 3 and all(len(r) == 2 for r in out)
    for row in out:
        assert all(a in answers for a, _ in row)
        assert all(np.isfinite(pr) for _, pr in row)
    # deterministic
    out2 = p.predict(imgs, questions, top_k=2)
    assert out == out2
