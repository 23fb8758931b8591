"""NLVR2 / SNLI-VE / VCR: ingestion, pipelines, multi-image and
multi-choice forwards, CE training (reference trainers
``train_nlvr2.py`` / ``train_snli_ve.py`` / ``train_vcr.py``)."""

import json
import os

import jax
import numpy as np
import pytest

from feddat_tpu.data.classification_datasets import (
    Nlvr2Pipeline,
    SnliVePipeline,
    VcrPipeline,
    convert_to_low_shot_per_class,
    load_nlvr2_examples,
    load_snli_ve_examples,
    load_vcr_examples,
    vcr_tag_text,
)
from feddat_tpu.data.tokenizer import WordPieceTokenizer
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

from conftest import TINY_VILT

TOK = WordPieceTokenizer.toy(
    ["the", "left", "image", "is", "true", "a", "person", "gray", "dog", "what", "sep"]
)


def _img(tmp_path, name, size=(50, 40)):
    from PIL import Image

    p = tmp_path / name
    p.parent.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", size, (10, 20, 30)).save(p)
    return str(p)


def test_vcr_tag_text_substitution():
    objects = ["person", "dog", "person"]
    out = vcr_tag_text(["what", "is", [0], "doing", "with", [1]], objects)
    assert "Casey" in out and "the gray dog" in out


def test_vcr_tag_text_list_keeps_last_subelement_only():
    """Reference parity (``vcr_dataset.py:47-52``): the inner loop
    overwrites ``temporal_text``, so a multi-person tag contributes only
    the LAST index's name."""
    objects = ["person", "dog", "person"]
    out = vcr_tag_text(["are", [0, 2], "talking"], objects)
    assert "Jessie" in out and "Casey" not in out
    assert out == "are Jessie talking "


def test_low_shot_per_class_fresh_rng_per_class():
    """Reference parity (``nlvr2_dataset.py:126-129``): a FRESH
    ``random.Random(1)`` per class, not one shared generator."""
    import random as _random
    from dataclasses import dataclass

    @dataclass
    class E:
        label: int
        idx: int

    ex = [E(c, i) for c in range(2) for i in range(50)]
    low = convert_to_low_shot_per_class(ex, num_labels=2, shots_per_class=5, seed=1)
    for c in range(2):
        cls = [e for e in ex if e.label == c]
        want = _random.Random(1).sample(cls, 5)
        assert low[c * 5 : (c + 1) * 5] == want


def test_nlvr2_ingest_and_pipeline(tmp_path):
    data = tmp_path / "nlvr2"
    (data / "data").mkdir(parents=True)
    (data / "images" / "dev").mkdir(parents=True)
    lines = []
    for i in range(4):
        base = f"dev-{i}-0"
        _img(data / "images" / "dev", f"dev-{i}-img0.png")
        _img(data / "images" / "dev", f"dev-{i}-img1.png")
        lines.append(
            {"identifier": f"dev-{i}-0", "sentence": "the left image is true",
             "label": "True" if i % 2 else "False"}
        )
    with open(data / "data" / "dev.json", "w") as f:
        f.write("\n".join(json.dumps(l) for l in lines))
    ex = load_nlvr2_examples(str(data), "val")
    assert len(ex) == 4 and ex[0].label == 0 and ex[1].label == 1

    low = convert_to_low_shot_per_class(ex, num_labels=2, shots_per_class=1)
    assert len(low) == 2

    pipe = Nlvr2Pipeline(ex, TOK, max_text_len=8, canvas=(32, 32), batch_size=2)
    b = next(pipe.train_batches(0))
    assert b["pixel_values"].shape == (2, 2, 32, 32, 3)
    assert b["labels"].shape == (2,)


def test_snli_ve_ingest(tmp_path):
    data = tmp_path / "snli"
    data.mkdir()
    with open(data / "snli_ve_dev.jsonl", "w") as f:
        f.write(
            json.dumps({"Flickr30K_ID": "77", "sentence2": "a person", "gold_label": "neutral"})
            + "\n"
        )
    ex = load_snli_ve_examples(str(data), "dev")
    assert ex[0].image_id == 77 and ex[0].label == 2


def test_vcr_ingest(tmp_path):
    data = tmp_path / "vcr"
    (data / "annotation").mkdir(parents=True)
    line = {
        "annot_id": "train-0",
        "objects": ["person", "dog"],
        "question": ["what", "is", [0], "doing"],
        "answer_choices": [["a"], ["the", [1]], ["gray"], ["person"]],
        "answer_label": 1,
        "rationale_choices": [["a"], ["b"], ["c"], ["d"]],
        "rationale_label": 3,
    }
    with open(data / "annotation" / "train.jsonl", "w") as f:
        f.write(json.dumps(line) + "\n")
    qa = load_vcr_examples(str(data), "train", "qa")
    assert len(qa[0].texts) == 4 and qa[0].label == 1
    qar = load_vcr_examples(str(data), "train", "qar")
    assert qar[0].label == 3 and all("[SEP]" in t for t in qar[0].texts)


def test_multi_image_forward_and_ce_training():
    """NLVR2-style: 2 images, concat pooled, CE loss decreases."""
    import jax.numpy as jnp

    from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
    from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
    from feddat_tpu.train.forwards import make_vilt_forward

    model = ViltContinualLearner(
        TINY_VILT, {"nlvr2": TaskHeadSpec(num_labels=2, num_images=2)}
    )
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "input_ids": rng.randint(1, 100, size=(B, TINY_VILT.max_text_len)).astype(np.int32),
        "attention_mask": np.ones((B, TINY_VILT.max_text_len), np.int32),
        "pixel_values": rng.randn(B, 2, 32, 32, 3).astype(np.float32),
        "labels": rng.randint(0, 2, size=(B,)).astype(np.int64),
    }
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    _, logits = model.apply({"params": params}, "nlvr2", batch, adapter_mode="ensemble")
    assert logits.shape == (B, 2)

    part = Partitioner(params, "nlvr2", PEFTMode.DAT)
    opt = OptimizerConfig(lr=1e-2)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    step = make_dat_train_step(
        make_vilt_forward(model, "nlvr2", loss="ce"), part, opt, max_steps=100, donate=False
    )
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_multi_choice_forward():
    """VCR-style: 4 text choices, one image, per-choice logits."""
    model = ViltContinualLearner(
        TINY_VILT,
        {"vcr": TaskHeadSpec(num_labels=4, model_type="multi-choice", num_choices=4)},
    )
    rng = np.random.RandomState(0)
    B, C, L = 2, 4, TINY_VILT.max_text_len
    batch = {
        "input_ids": rng.randint(1, 100, size=(B, C, L)).astype(np.int32),
        "attention_mask": np.ones((B, C, L), np.int32),
        "pixel_values": rng.randn(B, 32, 32, 3).astype(np.float32),
        "labels": rng.randint(0, 4, size=(B,)).astype(np.int64),
    }
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    _, logits = model.apply({"params": params}, "vcr", batch, adapter_mode="ensemble")
    assert logits.shape == (B, C)
