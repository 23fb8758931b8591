"""SPMD clients-mesh engine vs sequential semantics.

With dropout disabled the math must agree: the SPMD round (shard_map over
(client, data), pmean grads, stacked banks, reduction FedAvg) reproduces a
manual per-client sequential run of the same DAT steps.
"""

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
from feddat_tpu.federated.spmd import FED_HEAD_KEY, SPMDFederatedTrainer
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
from feddat_tpu.parallel.mesh import make_mesh
from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
from feddat_tpu.train.forwards import make_vilt_forward

from conftest import TINY_VILT


def _setup(num_clients, batch_size=4):
    clients = [
        SyntheticVQAClient(
            task_key=f"client_{i}",
            num_train=8,
            num_eval=4,
            num_labels=16,
            vocab_size=TINY_VILT.vocab_size,
            text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size,
            batch_size=batch_size,
            val_batch_size=batch_size,
            seed=i,
        )
        for i in range(num_clients)
    ]
    model = ViltContinualLearner(TINY_VILT, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), next(clients[0].train_batches(0)))
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
        seed=0,
    )
    return model, params, clients, cfg


def test_spmd_round_matches_sequential_math():
    model, params, clients, cfg = _setup(num_clients=2)
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    trainer.run_round(0)
    spmd_state = jax.tree_util.tree_map(np.asarray, trainer.client_state)

    # manual sequential replay with the same step semantics
    forward = make_vilt_forward(model, FED_HEAD_KEY)
    part = Partitioner(params, FED_HEAD_KEY, PEFTMode.DAT)
    max_steps = min(c.steps_per_epoch for c in clients) * cfg.num_epochs
    step = make_dat_train_step(forward, part, cfg.optimizer, max_steps, donate=False)
    steps = min(c.steps_per_epoch for c in clients)

    from feddat_tpu.peft.partition import teacher_refresh

    client_parts = []
    for i, c in enumerate(clients):
        p = teacher_refresh(params)
        state = init_train_state(p, part, cfg.optimizer, jax.random.PRNGKey(7 + i))
        it = c.train_batches(epoch=0)
        for _ in range(steps):
            state, _ = step(state, next(it))
        flat = traverse_util.flatten_dict(state.params)
        client_parts.append(
            traverse_util.unflatten_dict({k: flat[k] for k in trainer.client_paths})
        )
    # fedavg of shared across clients
    flat0 = traverse_util.flatten_dict(client_parts[0])
    flat1 = traverse_util.flatten_dict(client_parts[1])
    spmd_flat = traverse_util.flatten_dict(spmd_state)
    for k in flat0:
        ours = [np.asarray(flat0[k]), np.asarray(flat1[k])]
        if k in part.shared_paths:
            expected = 0.5 * ours[0] + 0.5 * ours[1]
            got0, got1 = np.asarray(spmd_flat[k][0]), np.asarray(spmd_flat[k][1])
            np.testing.assert_allclose(got0, expected, rtol=2e-4, atol=2e-5, err_msg=str(k))
            np.testing.assert_allclose(got1, expected, rtol=2e-4, atol=2e-5, err_msg=str(k))
        else:
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), ours[c], rtol=2e-4, atol=2e-5, err_msg=str(k)
                )


def test_spmd_data_parallel_matches_single_device():
    """client=1 x data=2 with split batches == one full-batch DAT step."""
    model, params, clients, cfg = _setup(num_clients=1, batch_size=8)
    mesh = make_mesh(num_clients=1, data_parallel=2)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    trainer.run_round(0)
    spmd_state = jax.tree_util.tree_map(np.asarray, trainer.client_state)

    forward = make_vilt_forward(model, FED_HEAD_KEY)
    part = Partitioner(params, FED_HEAD_KEY, PEFTMode.DAT)
    max_steps = clients[0].steps_per_epoch * cfg.num_epochs
    step = make_dat_train_step(forward, part, cfg.optimizer, max_steps, donate=False)

    from feddat_tpu.peft.partition import teacher_refresh

    p = teacher_refresh(params)
    state = init_train_state(p, part, cfg.optimizer, jax.random.PRNGKey(3))
    for batch in clients[0].train_batches(epoch=0):
        state, _ = step(state, batch)
    flat_seq = traverse_util.flatten_dict(state.params)
    spmd_flat = traverse_util.flatten_dict(spmd_state)
    for k in spmd_flat:
        np.testing.assert_allclose(
            np.asarray(spmd_flat[k][0]),
            np.asarray(flat_seq[k]),
            rtol=5e-4,
            atol=5e-5,
            err_msg=str(k),
        )


def test_spmd_eval_with_heterogeneous_eval_sizes():
    """Clients with different eval-set sizes: exhausted clients must be
    padded with zero-valid batches, and scores still normalize per client."""
    clients = [
        SyntheticVQAClient(
            task_key=f"client_{i}",
            num_train=8,
            num_eval=4 * (i + 1),  # 4 and 8
            num_labels=16,
            vocab_size=TINY_VILT.vocab_size,
            text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size,
            batch_size=4,
            val_batch_size=4,
            seed=i,
        )
        for i in range(2)
    ]
    model = ViltContinualLearner(TINY_VILT, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), next(clients[0].train_batches(0)))
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1,
    )
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    entry = trainer.evaluate_round(0)
    for task, scores in entry["scores"].items():
        assert all(0.0 <= s <= 100.0 for s in scores), (task, scores)


def test_spmd_adapter_mode_matches_sequential_math():
    """Non-DAT modes through the SPMD engine: plain single-update steps with
    pmean DP sync + FedAvg of the single shared adapter."""
    model, params, clients, cfg = _setup(num_clients=2)
    import dataclasses

    from feddat_tpu.configs.core import AdapterSpec
    from feddat_tpu.train.dat import make_plain_train_step

    acfg = dataclasses.replace(
        TINY_VILT, adapter=AdapterSpec(names=("adapter",), reduction_factor=4)
    )
    model = ViltContinualLearner(acfg, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), next(clients[0].train_batches(0)))
    cfg = dataclasses.replace(cfg, peft_mode=PEFTMode.ADAPTER)
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    trainer.run_round(0)
    spmd_flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, trainer.client_state)
    )

    part = Partitioner(params, FED_HEAD_KEY, PEFTMode.ADAPTER)
    max_steps = min(c.steps_per_epoch for c in clients) * cfg.num_epochs
    step = make_plain_train_step(
        make_vilt_forward(model, FED_HEAD_KEY), part, cfg.optimizer, max_steps,
        adapter_mode="adapter", donate=False,
    )
    steps = min(c.steps_per_epoch for c in clients)
    client_parts = []
    for i, c in enumerate(clients):
        state = init_train_state(params, part, cfg.optimizer, jax.random.PRNGKey(7 + i))
        it = c.train_batches(epoch=0)
        for _ in range(steps):
            state, _ = step(state, next(it))
        flat = traverse_util.flatten_dict(state.params)
        client_parts.append({k: flat[k] for k in trainer.client_paths})
    for k in client_parts[0]:
        ours = [np.asarray(client_parts[0][k]), np.asarray(client_parts[1][k])]
        if k in part.shared_paths:
            expected = 0.5 * ours[0] + 0.5 * ours[1]
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), expected, rtol=2e-4, atol=2e-5, err_msg=str(k)
                )
        else:
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), ours[c], rtol=2e-4, atol=2e-5, err_msg=str(k)
                )
    entry = trainer.evaluate_round(0)
    for scores in entry["scores"].values():
        assert len(scores) == 1  # single-mode eval for non-DAT


def test_spmd_albef_matches_sequential_math():
    """ALBEF family through the SPMD engine: DAT core on the LM loss +
    rank-answer eval with per-client answer banks inside shard_map."""
    import dataclasses

    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.peft.partition import teacher_refresh
    from feddat_tpu.train.forwards import make_albef_forward
    from test_albef import TINY_ALBEF, TINY_BERT

    acfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.0, attention_dropout=0.0),
    )
    clients = [
        SyntheticAlbefClient(
            task_key=f"client_{i}", num_train=8, num_eval=4, num_answers=8,
            vocab_size=64, question_len=6, answer_len=4, image_size=(32, 32),
            batch_size=4, seed=i,
        )
        for i in range(2)
    ]
    model = AlbefModel(acfg)
    batch0 = next(clients[0].train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch0)
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
        seed=0,
    )
    banks = {c.task_key: (c.answer_ids, c.answer_mask) for c in clients}
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(
        model, params, clients, cfg, mesh, family="albef", answer_banks=banks, rank_k=4
    )
    trainer.run_round(0)
    spmd_flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, trainer.client_state)
    )

    part = Partitioner(params, FED_HEAD_KEY, PEFTMode.DAT)
    max_steps = min(c.steps_per_epoch for c in clients) * cfg.num_epochs
    step = make_dat_train_step(
        make_albef_forward(model), part, cfg.optimizer, max_steps, donate=False
    )
    steps = min(c.steps_per_epoch for c in clients)
    client_parts = []
    for i, c in enumerate(clients):
        p = teacher_refresh(params)
        state = init_train_state(p, part, cfg.optimizer, jax.random.PRNGKey(7 + i))
        it = c.train_batches(epoch=0)
        for _ in range(steps):
            state, _ = step(state, next(it))
        flat = traverse_util.flatten_dict(state.params)
        client_parts.append({k: flat[k] for k in trainer.client_paths})
    for k in client_parts[0]:
        ours = [np.asarray(client_parts[0][k]), np.asarray(client_parts[1][k])]
        if k in part.shared_paths:
            expected = 0.5 * ours[0] + 0.5 * ours[1]
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), expected, rtol=5e-4, atol=5e-5, err_msg=str(k)
                )
        else:
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), ours[c], rtol=5e-4, atol=5e-5, err_msg=str(k)
                )
    entry = trainer.evaluate_round(0)
    for scores in entry["scores"].values():
        assert len(scores) == 3 and all(0.0 <= s <= 100.0 for s in scores)


def test_spmd_albef_fused_matches_spmd_standard():
    """ALBEF SPMD with the fused DAT core == ALBEF SPMD standard core."""
    import dataclasses

    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from test_albef import TINY_ALBEF, TINY_BERT

    acfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.0, attention_dropout=0.0),
    )
    clients = [
        SyntheticAlbefClient(
            task_key=f"client_{i}", num_train=8, num_eval=4, num_answers=8,
            vocab_size=64, question_len=6, answer_len=4, image_size=(32, 32),
            batch_size=4, seed=i,
        )
        for i in range(2)
    ]
    model = AlbefModel(acfg)
    params = init_albef_params(model, jax.random.PRNGKey(0), next(clients[0].train_batches(0)))
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
        seed=0,
    )
    banks = {c.task_key: (c.answer_ids, c.answer_mask) for c in clients}
    t_std = SPMDFederatedTrainer(
        model, params, clients, cfg, make_mesh(num_clients=2, data_parallel=1),
        family="albef", answer_banks=banks, rank_k=4,
    )
    t_fused = SPMDFederatedTrainer(
        model, params, clients, cfg, make_mesh(num_clients=2, data_parallel=1),
        family="albef", answer_banks=banks, rank_k=4, use_fused=True,
    )
    t_std.run_round(0)
    t_fused.run_round(0)
    f0 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, t_std.client_state))
    f1 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, t_fused.client_state))
    for k in f0:
        # atol 1e-4: fp32 reassociation noise amplified by AdamW's
        # g/(sqrt(v)+eps) on first-step near-zero adapter grads; the tied LM
        # head (h @ E^T) contracts in a different order between the fused
        # head-only pass and the standard full forward, so a couple of
        # elements land ~8e-5 apart (measured 2/1024 at rtol 1.5e-3)
        np.testing.assert_allclose(f0[k], f1[k], rtol=5e-4, atol=1e-4, err_msg=str(k))


def test_spmd_fused_matches_spmd_standard():
    """SPMD with the fused DAT core == SPMD with the standard core."""
    model, params, clients, cfg = _setup(num_clients=2)
    t_std = SPMDFederatedTrainer(
        model, params, clients, cfg, make_mesh(num_clients=2, data_parallel=1)
    )
    t_fused = SPMDFederatedTrainer(
        model, params, clients, cfg, make_mesh(num_clients=2, data_parallel=1),
        use_fused=True,
    )
    t_std.run_round(0)
    t_fused.run_round(0)
    f0 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, t_std.client_state))
    f1 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, t_fused.client_state))
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], rtol=5e-4, atol=1e-6, err_msg=str(k))


def test_spmd_heterogeneous_truncation():
    """Pins the documented SPMD min-steps semantics (README '--engine spmd'):
    with unequal client sizes the round runs exactly min(steps_per_epoch)
    steps, every client consuming the FIRST min-steps batches of its own
    epoch iterator — equivalent to a sequential replay truncated the same
    way (NOT to the reference's full-epoch-per-client loop)."""
    sizes = [8, 16]  # 2 vs 4 steps at batch 4
    clients = [
        SyntheticVQAClient(
            task_key=f"client_{i}",
            num_train=sizes[i],
            num_eval=4,
            num_labels=16,
            vocab_size=TINY_VILT.vocab_size,
            text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size,
            batch_size=4,
            val_batch_size=4,
            seed=i,
        )
        for i in range(2)
    ]
    model = ViltContinualLearner(TINY_VILT, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), next(clients[0].train_batches(0)))
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1,
        seed=0,
    )
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)

    # the stacked stream is truncated to the smaller client's step count
    min_steps = min(c.steps_per_epoch for c in clients)
    assert min_steps == 2 and clients[1].steps_per_epoch == 4
    stacked = list(trainer._stacked_train_batches(0))
    assert len(stacked) == min_steps

    trainer.run_round(0)
    spmd_flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, trainer.client_state)
    )

    # sequential replay: each client consumes exactly its first min_steps
    # batches (this is the pinned truncation semantics)
    from feddat_tpu.peft.partition import teacher_refresh

    part = Partitioner(params, FED_HEAD_KEY, PEFTMode.DAT)
    max_steps = min_steps * cfg.num_epochs
    step = make_dat_train_step(
        make_vilt_forward(model, FED_HEAD_KEY), part, cfg.optimizer, max_steps,
        donate=False,
    )
    client_parts = []
    for i, c in enumerate(clients):
        p = teacher_refresh(params)
        state = init_train_state(p, part, cfg.optimizer, jax.random.PRNGKey(7 + i))
        it = c.train_batches(epoch=0)
        consumed = [next(it) for _ in range(min_steps)]
        # cross-check the SPMD engine fed exactly these batches to this slot
        for s, b in enumerate(consumed):
            for k in b:
                np.testing.assert_array_equal(stacked[s][k][i], b[k])
        for b in consumed:
            state, _ = step(state, b)
        flat = traverse_util.flatten_dict(state.params)
        client_parts.append({k: flat[k] for k in trainer.client_paths})
    for k in client_parts[0]:
        ours = [np.asarray(client_parts[0][k]), np.asarray(client_parts[1][k])]
        if k in part.shared_paths:
            expected = 0.5 * ours[0] + 0.5 * ours[1]
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), expected, rtol=2e-4, atol=2e-5,
                    err_msg=str(k),
                )
        else:
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), ours[c], rtol=2e-4, atol=2e-5,
                    err_msg=str(k),
                )


def test_spmd_debug_steps_truncation():
    """--debug N truncates the SPMD train stream (reference semantics:
    batches 0..N run, ``main.py:275-276``) and the eval loop."""
    import dataclasses

    model, params, clients, cfg = _setup(num_clients=2, batch_size=2)  # 4 steps/epoch
    cfg = dataclasses.replace(cfg, debug_steps=1)
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    stacked = list(trainer._stacked_train_batches(0))
    assert len(stacked) == 2  # steps 0..debug inclusive
    trainer.run_round(0)
    entry = trainer.evaluate_round(0)
    for scores in entry["scores"].values():
        assert all(0.0 <= s <= 100.0 for s in scores)


def test_spmd_full_epochs_matches_sequential_heterogeneous():
    """full_epochs=True: heterogeneous clients run their FULL epochs (the
    reference's per-client loop, main.py:466-503) — exhausted clients are
    no-op-gated, each client keeps its own schedule horizon, and the result
    matches a per-client sequential replay exactly."""
    sizes = [8, 16]  # 2 vs 4 steps at batch 4
    clients = [
        SyntheticVQAClient(
            task_key=f"client_{i}",
            num_train=sizes[i],
            num_eval=4,
            num_labels=16,
            vocab_size=TINY_VILT.vocab_size,
            text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size,
            batch_size=4,
            val_batch_size=4,
            seed=i,
        )
        for i in range(2)
    ]
    model = ViltContinualLearner(TINY_VILT, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), next(clients[0].train_batches(0)))
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3, warmup_ratio=0.25),  # nonzero warmup:
        # exercises the per-client dynamic schedule horizons
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1,
        seed=0,
    )
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh, full_epochs=True)

    stacked = list(trainer._stacked_train_batches(0))
    assert len(stacked) == max(c.steps_per_epoch for c in clients) == 4
    # client 0 is valid for its 2 steps then gated
    np.testing.assert_array_equal(
        np.array([b["_step_valid"][0, 0] for b in stacked]), [1, 1, 0, 0]
    )
    np.testing.assert_array_equal(
        np.array([b["_step_valid"][1, 0] for b in stacked]), [1, 1, 1, 1]
    )

    trainer.run_round(0)
    spmd_flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, trainer.client_state)
    )

    # sequential replay: each client runs its FULL epoch with its OWN
    # schedule horizon (engine.py semantics)
    from feddat_tpu.peft.partition import teacher_refresh

    part = Partitioner(params, FED_HEAD_KEY, PEFTMode.DAT)
    client_parts = []
    for i, c in enumerate(clients):
        step = make_dat_train_step(
            make_vilt_forward(model, FED_HEAD_KEY), part, cfg.optimizer,
            max_steps=c.steps_per_epoch * cfg.num_epochs, donate=False,
        )
        p = teacher_refresh(params)
        state = init_train_state(p, part, cfg.optimizer, jax.random.PRNGKey(7 + i))
        for b in c.train_batches(epoch=0):
            state, _ = step(state, b)
        flat = traverse_util.flatten_dict(state.params)
        client_parts.append({k: flat[k] for k in trainer.client_paths})
    for k in client_parts[0]:
        ours = [np.asarray(client_parts[0][k]), np.asarray(client_parts[1][k])]
        if k in part.shared_paths:
            expected = 0.5 * ours[0] + 0.5 * ours[1]
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), expected, rtol=2e-4, atol=2e-5,
                    err_msg=str(k),
                )
        else:
            for c in range(2):
                np.testing.assert_allclose(
                    np.asarray(spmd_flat[k][c]), ours[c], rtol=2e-4, atol=2e-5,
                    err_msg=str(k),
                )


def test_spmd_freeze_bottom_k_comm_semantics_match_oracle():
    """FedAvg communicates comm_roles(mode), not the trainable set: under
    FREEZE_BOTTOM_K the comm set is EMPTY (reference comm_state_dict_names
    routing), so the upper layers train within a round but are reset to the
    server/init values at round end — exactly what the sequential oracle
    does (engine.py run_round discards trained non-comm non-personal
    params).  Only the personal heads persist."""
    import dataclasses

    model, params, clients, cfg = _setup(num_clients=2)
    cfg = dataclasses.replace(
        cfg, peft_mode=PEFTMode.FREEZE_BOTTOM_K, layers_to_freeze=1
    )
    mesh = make_mesh(num_clients=2, data_parallel=1)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    assert not trainer._comm_paths  # comm_roles(FREEZE_BOTTOM_K) is empty
    # reset set = trained upper layers + the (untrained, so no-op) teacher
    assert trainer._round_reset_paths == (
        trainer.partitioner.shared_paths | trainer.teacher_paths
    )

    trainer.run_round(0)
    bank = jax.tree_util.tree_map(np.asarray, trainer.client_state)
    flat_bank = traverse_util.flatten_dict(bank)
    flat_init = traverse_util.flatten_dict(params)
    head_paths = trainer.partitioner.head_paths

    head_moved = False
    for p, v in flat_bank.items():
        if p in head_paths:
            head_moved = head_moved or not np.allclose(
                v[0], np.asarray(flat_init[p])
            )
        else:
            # everything non-personal was reset to the init/server value
            for c in range(2):
                np.testing.assert_array_equal(
                    v[c], np.asarray(flat_init[p]), err_msg=str(p)
                )
    assert head_moved, "personal heads should have trained"

    # eval still runs post-reset and yields finite scores
    entry = trainer.evaluate_round(0)
    for scores in entry["scores"].values():
        assert all(np.isfinite(s) for s in scores)


def test_spmd_graceful_preemption(tmp_path):
    """SIGTERM during an SPMD round: finish it, checkpoint it, exit at the
    (single-process) consensus boundary instead of dying mid-collective."""
    import dataclasses
    import os
    import signal

    from feddat_tpu.utils.checkpointing import latest_round

    model, params, clients, cfg = _setup(num_clients=2)
    cfg = dataclasses.replace(
        cfg, federated=FederatedConfig(comm_rounds=4, local_epochs=1, eval_every=4)
    )
    mesh = make_mesh(num_clients=2, data_parallel=1)

    fired = {"n": 0}
    orig = clients[0].train_batches

    def signaling_train_batches(epoch=0):
        # second round (epoch ids are round*1000+e): deliver the preemption
        if epoch >= 1000:
            fired["n"] += 1
            os.kill(os.getpid(), signal.SIGTERM)
        yield from orig(epoch)

    clients[0].train_batches = signaling_train_batches
    prev = signal.getsignal(signal.SIGTERM)
    trainer = SPMDFederatedTrainer(
        model, params, clients, cfg, mesh, checkpoint_dir=str(tmp_path)
    )
    history = trainer.run(resume=False)
    assert fired["n"] == 1
    assert latest_round(str(tmp_path)) == 1  # rounds 0 and 1 ran, 2..3 didn't
    assert signal.getsignal(signal.SIGTERM) == prev
    # eval_every=4 never fired before the break; a preempted run must NOT
    # fall back to evaluating the final round as if it completed
    assert history == []
