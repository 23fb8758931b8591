"""Federated engine semantics (reference ``src/train/main.py:50-65, 440-558``)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from feddat_tpu.configs.core import (
    FederatedConfig,
    OptimizerConfig,
    PEFTMode,
    TrainConfig,
)
from feddat_tpu.data.synthetic import SyntheticVQAClient
from feddat_tpu.federated.engine import FederatedTrainer
from feddat_tpu.federated.fedavg import fedavg
from feddat_tpu.peft.partition import label_params, split_by_roles

from conftest import TINY_VILT


def _make_clients(n=2):
    return {
        f"client_{i}": SyntheticVQAClient(
            task_key=f"client_{i}",
            num_train=16,
            num_eval=8,
            num_labels=16,
            vocab_size=TINY_VILT.vocab_size,
            text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size,
            batch_size=4,
            seed=i,
        )
        for i in range(n)
    }


def _make_trainer(mode=PEFTMode.DAT, rounds=1, n=2, vilt_cfg=TINY_VILT):
    from feddat_tpu.models.adapters import MODE_INIT
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner

    clients = _make_clients(n)
    heads = {k: TaskHeadSpec(num_labels=16) for k in clients}
    model = ViltContinualLearner(vilt_cfg, heads)
    sample = next(iter(clients.values()))
    batch = next(sample.train_batches(0))
    from feddat_tpu.models.vilt import init_vilt_params

    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        peft_mode=mode,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=rounds, local_epochs=1, eval_every=1),
        num_epochs=4,
        seed=0,
    )
    return FederatedTrainer(model, params, clients, cfg), params


def test_fedavg_weighted_average():
    trees = [{"a": jnp.ones((2,)) * v} for v in (1.0, 3.0)]
    out = fedavg(trees)
    np.testing.assert_allclose(np.asarray(out["a"]), 2.0)
    out = fedavg(trees, weights=[3.0, 1.0])
    np.testing.assert_allclose(np.asarray(out["a"]), 1.5)


def test_round_updates_only_comm_subset_on_server():
    trainer, params0 = _make_trainer()
    trainer.run_round(0)
    f0 = traverse_util.flatten_dict(params0)
    f1 = traverse_util.flatten_dict(trainer.server_params)
    fl = traverse_util.flatten_dict(label_params(params0))
    for k in f0:
        if fl[k] == "shared":
            continue
        np.testing.assert_array_equal(
            np.asarray(f0[k]), np.asarray(f1[k]), err_msg=f"{k} ({fl[k]}) moved on server"
        )
    moved = [k for k in f0 if fl[k] == "shared" and not np.allclose(np.asarray(f0[k]), np.asarray(f1[k]))]
    assert moved, "shared subset did not move"


def test_personalization_isolated_per_client():
    trainer, _ = _make_trainer()
    trainer.run_round(0)
    p0 = traverse_util.flatten_dict(trainer.personal["client_0"])
    p1 = traverse_util.flatten_dict(trainer.personal["client_1"])
    # each client's own head must have trained
    own0 = [k for k in p0 if "task_client_0" in "/".join(map(str, k))]
    assert own0
    # client_0's copy of client_1's head must equal client_1's start state --
    # i.e. clients may not influence each other's personal params.
    diffs = 0
    for k in p0:
        path = "/".join(map(str, k))
        if "task_client_1" in path:
            if not np.allclose(np.asarray(p0[k]), np.asarray(p1[k])):
                diffs += 1
    # client_0 never trains task_client_1's head; client_1 does.  So the
    # stored trees must differ on that head.
    assert diffs > 0


def test_federated_dat_learns_synthetic_task():
    trainer, _ = _make_trainer(rounds=3)
    # measure train-loss improvement on a fixed batch across rounds — robust
    # on tiny models where a handful of eval examples makes scores noisy
    client = trainer.clients[0]
    probe = next(client.data.train_batches(epoch=0))
    import jax

    from feddat_tpu.train.losses import bce_with_logits_vqa

    def probe_loss():
        params = trainer._client_params(client)
        loss, _ = client.forward(params, probe, "ensemble", jax.random.PRNGKey(0))
        return float(loss)

    before = probe_loss()
    history = trainer.run()
    after = probe_loss()
    assert after < before, (before, after)
    # DAT eval protocol: [ensemble, adapter_0-only, adapter_1-only]
    final = history[-1]["scores"]
    for task, scores in final.items():
        assert len(scores) == 3


def test_adapter_mode_round_runs():
    import dataclasses

    from feddat_tpu.configs.core import AdapterSpec

    cfg = dataclasses.replace(
        TINY_VILT, adapter=AdapterSpec(names=("adapter",), reduction_factor=4)
    )
    trainer, _ = _make_trainer(mode=PEFTMode.ADAPTER, rounds=1, n=2, vilt_cfg=cfg)
    history = trainer.run()
    assert history


def test_fedavg_rejects_weight_length_mismatch():
    import pytest

    trees = [{"w": jnp.ones(2)}, {"w": jnp.zeros(2)}, {"w": jnp.ones(2)}]
    with pytest.raises(ValueError, match="client_weights"):
        fedavg(trees, weights=[0.5, 0.5])


def test_eval_uses_stored_teacher_not_refreshed():
    """DAT eval swaps in the client's STORED personal adapter_2 without a
    teacher refresh — the reference evaluates the post-aggregation server
    model with the personal params swapped in (``main.py:520-558``), so the
    eval-time teacher is the one captured after the client's last local
    training (== pre-round server adapter_1), not the post-round average.
    The SPMD engine refreshes only at round start; the oracle must match."""
    trainer, _ = _make_trainer(rounds=1)
    trainer.run_round(0)
    client = trainer.clients[0]
    params = trainer._client_params(client, refresh=False)
    flat = traverse_util.flatten_dict(params)
    pflat = traverse_util.flatten_dict(trainer.personal[client.task_key])
    teacher_keys = [k for k in pflat if any("adapter_2" in str(s) for s in k)]
    assert teacher_keys
    for k in teacher_keys:
        np.testing.assert_array_equal(np.asarray(flat[k]), np.asarray(pflat[k]))
    # a refresh against the post-round server adapter_1 would differ
    sflat = traverse_util.flatten_dict(trainer.server_params)
    diffs = 0
    for k in teacher_keys:
        k1 = tuple(str(s).replace("adapter_2", "adapter_1") for s in k)
        diffs += int(not np.allclose(np.asarray(flat[k]), np.asarray(sflat[k1])))
    assert diffs > 0, "post-round server adapter_1 should differ from the stored teacher"
