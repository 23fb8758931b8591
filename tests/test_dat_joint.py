"""Joint (mega-batched) DAT step == standard DAT step, exactly, when
encoder dropout is off.  The joint step runs the ensemble and adapter_1
passes as ONE 2B forward + ONE shared backward (train/dat.py::
dat_step_core_joint); semantics must match the reference-exact core."""

import jax
import numpy as np
from flax import traverse_util

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
from feddat_tpu.peft.partition import label_params, merge, split_by_roles
from feddat_tpu.train.dat import (
    Partitioner,
    init_train_state,
    make_dat_train_step,
    make_dat_train_step_joint,
)
from feddat_tpu.train.forwards import make_vilt_forward
from feddat_tpu.train.losses import bce_with_logits_vqa

from conftest import TINY_VILT, tiny_batch

OPT = OptimizerConfig(lr=1e-2)


def _make_joint(model, params, part, task_key="coco", **kw):
    labels = label_params(params)
    _, frozen_rest = split_by_roles(params, labels, frozenset({"head"}))

    def encode(p, b, mode, rng):
        return model.apply(
            {"params": p}, task_key, b, adapter_mode=mode, deterministic=True,
            method=type(model).encode_single_image,
        )

    def head_fn(head_subtree, pooled):
        return model.apply(
            {"params": merge(head_subtree, frozen_rest)}, task_key, pooled,
            method=type(model).apply_head,
        )

    def task_loss(logits, b):
        return bce_with_logits_vqa(logits, b["target_scores"])

    return make_dat_train_step_joint(
        encode, head_fn, task_loss, part, OPT, max_steps=100, donate=False, **kw
    )


def test_joint_step_matches_standard():
    model = ViltContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(5))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    part = Partitioner(params, "coco", PEFTMode.DAT)

    std_step = make_dat_train_step(
        make_vilt_forward(model, "coco"), part, OPT, max_steps=100, donate=False
    )
    joint_step = _make_joint(model, params, part)

    s_std = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    s_joint = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    for _ in range(3):
        s_std, m_std = std_step(s_std, batch)
        s_joint, m_joint = joint_step(s_joint, batch)
        np.testing.assert_allclose(
            float(m_std["loss"]), float(m_joint["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m_std["loss_shared"]), float(m_joint["loss_shared"]), rtol=1e-5
        )
    f0 = traverse_util.flatten_dict(s_std.params)
    f1 = traverse_util.flatten_dict(s_joint.params)
    for k in f0:
        np.testing.assert_allclose(
            np.asarray(f0[k]), np.asarray(f1[k]), rtol=2e-5, atol=1e-7, err_msg=str(k)
        )


def test_weighted_adapter_mode_matches_static_modes():
    """MODE_WEIGHTED with one-hot / ensemble rows == the static modes."""
    model = ViltContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(7))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    B = batch["input_ids"].shape[0]

    def enc(mode, weights=None):
        b = dict(batch)
        if weights is not None:
            b["adapter_weights"] = np.tile(np.asarray(weights, np.float32), (B, 1))
        return model.apply(
            {"params": params}, "coco", b, adapter_mode=mode, deterministic=True,
            method=type(model).encode_single_image,
        )

    np.testing.assert_allclose(
        np.asarray(enc("weighted", [0.0, 1.0, 0.0])), np.asarray(enc("adapter_1")),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(enc("weighted", [0.5, 0.0, 0.5])), np.asarray(enc("ensemble")),
        rtol=1e-6, atol=1e-7,
    )


def test_joint_step_matches_standard_with_sched_total():
    """The joint step must honor the SPMD full-epochs per-slot schedule
    horizon (``_sched_total``) exactly like the standard core, and must not
    try to example-double the scalar side channel."""
    model = ViltContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(11))
    B = batch["input_ids"].shape[0]
    # a horizon deliberately different from max_steps=100
    batch = dict(batch, _sched_total=np.full((B,), 17, np.int32))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    part = Partitioner(params, "coco", PEFTMode.DAT)

    std_step = make_dat_train_step(
        make_vilt_forward(model, "coco"), part, OPT, max_steps=100, donate=False
    )
    joint_step = _make_joint(model, params, part)
    s_std = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    s_joint = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    for _ in range(3):
        s_std, m_std = std_step(s_std, batch)
        s_joint, m_joint = joint_step(s_joint, batch)
        np.testing.assert_allclose(float(m_std["lr"]), float(m_joint["lr"]), rtol=1e-6)
    f0 = traverse_util.flatten_dict(s_std.params)
    f1 = traverse_util.flatten_dict(s_joint.params)
    for k in f0:
        np.testing.assert_allclose(
            np.asarray(f0[k]), np.asarray(f1[k]), rtol=2e-5, atol=1e-7, err_msg=str(k)
        )
