"""PEFT baseline zoo: each mode trains exactly its partition
(reference ``src/train/main.py:132-245``)."""

import collections
import dataclasses

import jax
import numpy as np
import pytest
from flax import traverse_util

from feddat_tpu.configs.core import (
    AdapterSpec,
    LoraSpec,
    OptimizerConfig,
    PEFTMode,
    PromptSpec,
    ViltModelConfig,
)
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
from feddat_tpu.peft.partition import label_params
from feddat_tpu.train.dat import Partitioner, init_train_state, make_plain_train_step
from feddat_tpu.train.forwards import make_vilt_forward

from conftest import TINY_VILT, tiny_batch

BASE = dataclasses.replace(TINY_VILT, adapter=AdapterSpec())
OPT = OptimizerConfig(lr=1e-2)


def _run_mode(mode, cfg, adapter_mode="none", steps=3):
    model = ViltContinualLearner(cfg, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0), cfg=cfg)
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    part = Partitioner(params, "coco", mode)
    state = init_train_state(params, part, OPT, jax.random.PRNGKey(1))
    step = make_plain_train_step(
        make_vilt_forward(model, "coco"), part, OPT, max_steps=100,
        adapter_mode=adapter_mode, donate=False,
    )
    for _ in range(steps):
        state, m = step(state, batch)
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    fl = traverse_util.flatten_dict(label_params(params))
    changed = collections.Counter()
    for k in f0:
        if not np.allclose(np.asarray(f0[k]), np.asarray(f1[k])):
            changed[fl[k]] += 1
    return set(changed), float(m["loss"])


def test_bias_mode_trains_biases_and_head():
    changed, _ = _run_mode(PEFTMode.BIAS, BASE)
    assert changed == {"bias", "norm_bias", "head"}, changed


def test_norm_mode_trains_layernorms_and_head():
    changed, _ = _run_mode(PEFTMode.NORM, BASE)
    assert changed == {"norm", "norm_bias", "head"}, changed


def test_none_mode_trains_only_head():
    changed, _ = _run_mode(PEFTMode.NONE, BASE)
    assert changed == {"head"}, changed


def test_full_mode_trains_everything():
    changed, _ = _run_mode(PEFTMode.FULL, BASE)
    assert "backbone" in changed and "head" in changed


def test_lora_mode_trains_lora_and_head():
    cfg = dataclasses.replace(BASE, lora=LoraSpec(rank=2, alpha=2.0, enabled=True))
    changed, _ = _run_mode(PEFTMode.LORA, cfg)
    assert changed == {"lora", "head"}, changed


def test_lora_init_is_identity():
    """B init zero -> LoRA path contributes nothing at init (loralib behavior)."""
    cfg = dataclasses.replace(BASE, lora=LoraSpec(rank=2, alpha=2.0, enabled=True))
    model = ViltContinualLearner(cfg, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0), cfg=cfg)
    params_l = init_vilt_params(model, jax.random.PRNGKey(0), batch)

    base_model = ViltContinualLearner(BASE, {"coco": TaskHeadSpec(num_labels=16)})
    # strip lora params -> same tree as the base model
    flat = {
        k: v
        for k, v in traverse_util.flatten_dict(params_l).items()
        if "lora_a" not in k and "lora_b" not in k
    }
    params_b = traverse_util.unflatten_dict(flat)
    out_l = model.apply({"params": params_l}, "coco", batch)[1]
    out_b = base_model.apply({"params": params_b}, "coco", batch)[1]
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_b), rtol=1e-5, atol=1e-6)


def test_prompt_mode_trains_prompts_and_head():
    cfg = dataclasses.replace(BASE, prompt=PromptSpec(length=3, bottleneck=8, enabled=True))
    changed, loss = _run_mode(PEFTMode.PROMPT, cfg)
    assert changed == {"prompt", "head"}, changed
    assert np.isfinite(loss)


def test_prompt_extends_sequence_not_crash():
    cfg = dataclasses.replace(BASE, prompt=PromptSpec(length=3, bottleneck=8, enabled=True))
    model = ViltContinualLearner(cfg, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(1), cfg=cfg)
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    _, logits = model.apply({"params": params}, "coco", batch)
    assert logits.shape == (batch["input_ids"].shape[0], 16)
