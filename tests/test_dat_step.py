"""DAT+MKD train-step semantics (reference ``task_trainer.py:280-330``)."""

import collections

import jax
import numpy as np
from flax import traverse_util

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
from feddat_tpu.peft.partition import label_params, teacher_refresh
from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
from feddat_tpu.train.losses import bce_with_logits_vqa

from conftest import tiny_batch

OPT = OptimizerConfig(lr=1e-2)


def _forward(model):
    def forward(p, b, mode, dropout_rng):
        _, logits = model.apply(
            {"params": p}, "coco", b, adapter_mode=mode, deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return bce_with_logits_vqa(logits, b["target_scores"]), logits

    return forward


def test_dat_step_decreases_loss_and_respects_partitions(tiny_model):
    model, params = tiny_model
    batch = tiny_batch(np.random.RandomState(1))
    part = Partitioner(params, "coco", PEFTMode.DAT)
    state = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    step = make_dat_train_step(_forward(model), part, OPT, max_steps=100, donate=False)

    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    # scheduler clock ticks twice per batch (two optimizer steps)
    assert int(state.sched_count) == 12

    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    fl = traverse_util.flatten_dict(label_params(params))
    changed = collections.Counter()
    for k in f0:
        if not np.allclose(np.asarray(f0[k]), np.asarray(f1[k])):
            changed[fl[k]] += 1
    # only shared/local adapters + the active head move; backbone and the
    # frozen teacher must be untouched
    assert set(changed) == {"shared", "local", "head"}, dict(changed)


def test_teacher_refresh_copies_shared_into_teacher(tiny_model):
    _, params = tiny_model
    refreshed = teacher_refresh(params)
    flat = traverse_util.flatten_dict(refreshed)
    for path, value in flat.items():
        strs = [str(p) for p in path]
        if any("adapter_2" in p for p in strs):
            src = tuple(p.replace("adapter_2", "adapter_1") for p in strs)
            np.testing.assert_array_equal(np.asarray(value), np.asarray(flat[src]))


def test_first_update_uses_zero_lr_warmup(tiny_model):
    """torch LambdaLR factor(0)=0 under warmup: the very first optimizer step
    must not move parameters (lr=0) but the second (factor(1)) must."""
    model, params = tiny_model
    batch = tiny_batch(np.random.RandomState(2))
    part = Partitioner(params, "coco", PEFTMode.DAT)
    state = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    step = make_dat_train_step(_forward(model), part, OPT, max_steps=100, donate=False)
    state, _ = step(state, batch)
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    fl = traverse_util.flatten_dict(label_params(params))
    # shared updated at lr=schedule(0)=0 -> unchanged; local at schedule(1)>0 -> changed
    shared_same = all(
        np.allclose(np.asarray(f0[k]), np.asarray(f1[k]))
        for k in f0
        if fl[k] == "shared"
    )
    local_changed = any(
        not np.allclose(np.asarray(f0[k]), np.asarray(f1[k]))
        for k in f0
        if fl[k] == "local"
    )
    assert shared_same and local_changed
