"""Checkpoint/resume + observability (SURVEY.md §5.4/§5.5 — real persistence
and metrics the reference lacks)."""

import json
import os

import jax
import numpy as np
import pytest
from flax import traverse_util

from feddat_tpu.utils.checkpointing import (
    latest_round,
    restore_federated_state,
    save_federated_state,
)
from feddat_tpu.utils.observability import MetricsLogger, experiment_name, setup_logger


def test_save_restore_roundtrip(tmp_path):
    server = {"layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    personal = {"c0": {"head": {"bias": np.ones(3, np.float32)}}}
    rng = jax.random.PRNGKey(7)
    save_federated_state(str(tmp_path), 3, server, personal, rng)
    assert latest_round(str(tmp_path)) == 3
    rnd, s2, p2, rng2 = restore_federated_state(str(tmp_path))
    assert rnd == 3
    np.testing.assert_array_equal(np.asarray(s2["layer"]["kernel"]), server["layer"]["kernel"])
    np.testing.assert_array_equal(np.asarray(p2["c0"]["head"]["bias"]), personal["c0"]["head"]["bias"])
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(rng))


def test_latest_round_picks_max(tmp_path):
    for r in (0, 2, 5):
        save_federated_state(str(tmp_path), r, {"a": np.zeros(1)}, {}, jax.random.PRNGKey(0))
    assert latest_round(str(tmp_path)) == 5
    rnd, *_ = restore_federated_state(str(tmp_path))
    assert rnd == 5


def test_engine_resume(tmp_path):
    """A trainer killed after round 0 resumes at round 1 with state intact."""
    from feddat_tpu.configs.core import FederatedConfig, OptimizerConfig, PEFTMode, TrainConfig
    from feddat_tpu.data.synthetic import SyntheticVQAClient
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    from conftest import TINY_VILT

    clients = {
        "c0": SyntheticVQAClient(
            task_key="c0", num_train=8, num_eval=4, num_labels=16,
            vocab_size=TINY_VILT.vocab_size, text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size, batch_size=4, seed=0,
        )
    }
    model = ViltContinualLearner(TINY_VILT, {"c0": TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), next(clients["c0"].train_batches(0)))
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=2, local_epochs=1, eval_every=10),
        num_epochs=2,
    )
    t1 = FederatedTrainer(model, params, clients, cfg, checkpoint_dir=str(tmp_path))
    t1.run_round(0)
    t1.save_checkpoint(0)
    srv_after_r0 = jax.tree_util.tree_map(np.asarray, t1.server_params)

    t2 = FederatedTrainer(model, params, clients, cfg, checkpoint_dir=str(tmp_path))
    start = t2.try_resume()
    assert start == 1
    f1 = traverse_util.flatten_dict(srv_after_r0)
    f2 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, t2.server_params))
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k], err_msg=str(k))


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(path, log_every=2)
    m.step({"loss": 1.0}, batch_size=4, task_key="t")
    m.step({"loss": 0.5}, batch_size=4, task_key="t")  # emits here
    m.round(0, {"t": [1.0, 2.0, 3.0]}, wall_s=1.5)
    m.close()
    records = [json.loads(l) for l in open(path)]
    kinds = [r["kind"] for r in records]
    assert kinds == ["run_start", "step", "round"]
    assert records[1]["samples_per_sec"] > 0
    assert records[1]["loss"] == 0.5


def test_experiment_name_encodes_config():
    from feddat_tpu.configs.core import TrainConfig

    name = experiment_name(TrainConfig())
    assert "vilt" in name and "dat" in name and "seed1" in name
