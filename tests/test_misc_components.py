"""Freeze-bottom-k, vilt_clf single-modality heads, results table, seeding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from feddat_tpu.configs.core import AdapterSpec, OptimizerConfig, PEFTMode
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
from feddat_tpu.train.dat import Partitioner, init_train_state, make_plain_train_step
from feddat_tpu.train.forwards import make_vilt_forward

from conftest import TINY_VILT, tiny_batch

BASE = dataclasses.replace(TINY_VILT, adapter=AdapterSpec())


def test_freeze_bottom_k_freezes_bottom_layers_and_embeddings():
    model = ViltContinualLearner(BASE, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0), cfg=BASE)
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    part = Partitioner(params, "coco", PEFTMode.FREEZE_BOTTOM_K, layers_to_freeze=1)
    assert part.grad_mask, "stacked layer masks expected"
    opt = OptimizerConfig(lr=1e-2)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(1))
    step = make_plain_train_step(
        make_vilt_forward(model, "coco"), part, opt, max_steps=100, donate=False
    )
    for _ in range(3):
        state, _ = step(state, batch)
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    for k in f0:
        joined = "/".join(map(str, k))
        a, b = np.asarray(f0[k]), np.asarray(f1[k])
        if "embeddings" in joined:
            np.testing.assert_array_equal(a, b, err_msg=f"embeddings moved: {joined}")
        elif "/layers/" in f"/{joined}/" or "layers/layer" in joined:
            # bottom layer frozen, top layer trained
            np.testing.assert_array_equal(a[0], b[0], err_msg=f"layer0 moved: {joined}")
            if a.shape[0] > 1 and a[1:].size:
                pass  # upper layers may or may not move per-leaf; checked below
    # at least one upper-layer leaf moved
    moved_upper = any(
        not np.allclose(np.asarray(f0[k])[1:], np.asarray(f1[k])[1:])
        for k in f0
        if "layers/layer" in "/".join(map(str, k))
    )
    assert moved_upper


def test_vilt_clf_heads():
    from feddat_tpu.models.vilt_clf import (
        ViltForImageClassification,
        ViltForMultipleChoice,
        ViltForSequenceClassification,
        mean_image,
    )

    rng = np.random.RandomState(0)
    imgs = rng.randn(5, 32, 32, 3).astype(np.float32)
    mean = mean_image(imgs)
    assert mean.shape == (32, 32, 3)

    m = ViltForImageClassification(BASE, num_labels=7, cls_token_id=1, sep_token_id=2)
    pv = jnp.asarray(imgs[:2])
    p = jax.jit(lambda r: m.init(r, pv))(jax.random.PRNGKey(0))["params"]
    out = m.apply({"params": p}, pv)
    assert out.shape == (2, 7)

    ids = jnp.asarray(rng.randint(1, 90, size=(2, BASE.max_text_len)), jnp.int32)
    mask = jnp.ones_like(ids)
    ms = ViltForSequenceClassification(BASE, num_labels=3)
    ps = jax.jit(lambda r: ms.init(r, ids, mask, jnp.asarray(mean)))(jax.random.PRNGKey(0))["params"]
    out = ms.apply({"params": ps}, ids, mask, jnp.asarray(mean))
    assert out.shape == (2, 3)

    idsc = jnp.asarray(rng.randint(1, 90, size=(2, 4, BASE.max_text_len)), jnp.int32)
    maskc = jnp.ones_like(idsc)
    mc = ViltForMultipleChoice(BASE, num_choices=4)
    pc = jax.jit(lambda r: mc.init(r, idsc, maskc, jnp.asarray(mean)))(jax.random.PRNGKey(0))["params"]
    out = mc.apply({"params": pc}, idsc, maskc, jnp.asarray(mean))
    assert out.shape == (2, 4)


def test_results_table(tmp_path):
    import json

    from feddat_tpu.utils.results import format_table, load_histories, mean_std_table

    h1 = [{"round": 0, "scores": {"art": [50.0, 40.0, 45.0], "gqa": [30.0, 20.0, 25.0]}}]
    h2 = [{"round": 0, "scores": {"art": [60.0, 40.0, 45.0], "gqa": [40.0, 20.0, 25.0]}}]
    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    json.dump(h1, open(p1, "w"))
    json.dump(h2, open(p2, "w"))
    table = mean_std_table(load_histories([str(p1), str(p2)]))
    assert table["art"]["mean"] == 55.0 and table["gqa"]["std"] == 5.0
    assert table["average"]["mean"] == 45.0
    assert "task" in format_table(table)


def test_seed_everything():
    from feddat_tpu.utils.seeding import seed_everything

    eff = seed_everything(42)
    a = np.random.rand(3)
    seed_everything(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert eff == 42  # single process


def test_param_budget_report():
    """Startup observability (reference prints counts/% at main.py:371-374)."""
    from feddat_tpu.peft.partition import count_params, param_budget

    cfg = dataclasses.replace(
        TINY_VILT,
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
    )
    model = ViltContinualLearner(cfg, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0), cfg=cfg)
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    b = param_budget(params, PEFTMode.DAT)
    assert b["total"] == count_params(params)
    # DAT: trainable = adapter_0 + adapter_1 + heads; communicated = adapter_1
    assert 0 < b["communicated"] < b["trainable"] < b["total"]
    # personal = heads + adapter_0 + adapter_2
    assert b["personal"] > b["communicated"]
    assert abs(b["trainable_pct"] - 100.0 * b["trainable"] / b["total"]) < 1e-9


def test_create_model_perf_knobs():
    """create_model plumbs the TPU perf knobs (remat/attn_impl/logits dtype)
    into both model families' configs."""
    from feddat_tpu.models import create_model

    m, cfg = create_model(
        "vilt", {"t": TaskHeadSpec(num_labels=4)}, PEFTMode.DAT,
        remat=True, remat_policy="full", attn_impl="fused",
        attention_logits_dtype="bfloat16",
    )
    assert cfg.remat and cfg.attention_logits_dtype == "bfloat16"
    assert m.attn_impl == "fused"
    m2, cfg2 = create_model(
        "albef_no_distill", {}, PEFTMode.DAT,
        remat=True, attention_logits_dtype="bfloat16",
    )
    assert cfg2.remat and cfg2.attention_logits_dtype == "bfloat16"
    assert m2.attn_impl == "auto"


def test_evaluate_debug_steps_truncation():
    """--debug N eval truncation (task_trainer.py:122-123): batches 0..N are
    scored, the denominator stays the full dataset size."""
    from feddat_tpu.train.evaluation import evaluate

    calls = []

    def fake_step(params, batch, adapter_mode="none"):
        calls.append(batch)
        return 2.0  # 2 points per batch

    batches = [{"i": i} for i in range(10)]
    # no truncation: all 10 batches, 20/40*100
    score = evaluate(None, fake_step, iter(batches), num_examples=40)
    assert score == 50.0 and len(calls) == 10
    calls.clear()
    # debug=3: batches 0..3 run (4 of them); denominator unchanged
    score = evaluate(None, fake_step, iter(batches), num_examples=40, debug_steps=3)
    assert len(calls) == 4
    assert score == 4 * 2.0 / 40 * 100.0
