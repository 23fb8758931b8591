"""REAL multi-process SPMD federated training over localhost.

The round-2 review found the multi-host data path untestable by the 8-device
dryrun (all one process).  This test actually runs it: two OS processes, four
virtual CPU devices each, ``jax.distributed`` over a localhost coordinator
(Gloo collectives) — the mechanics of a TPU pod launch, minus the ICI.

Each process feeds ONLY its hosted clients' batches (the remote clients'
iterators are poisoned to raise), the global [C, B, ...] arrays are
assembled with ``jax.make_array_from_process_local_data``, and the result
must match a single-process 8-device run of the identical config bit-for-bit
(up to fp32 collective reassociation).

Reference analogue being replaced: the accelerate multi-process launch
(``accelerate_config.yaml:1-11``, ``src/train/main.py:362-365``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

NUM_CLIENTS = 4
DATA_PARALLEL = 2
NPROC = 2


def _make_clients():
    from feddat_tpu.data.synthetic import SyntheticVQAClient

    from conftest import TINY_VILT

    return [
        SyntheticVQAClient(
            task_key=f"client_{i}",
            num_train=8,
            num_eval=4,
            num_labels=16,
            vocab_size=TINY_VILT.vocab_size,
            text_len=TINY_VILT.max_text_len,
            image_size=TINY_VILT.image_size,
            batch_size=4,
            val_batch_size=4,
            seed=i,
        )
        for i in range(NUM_CLIENTS)
    ]


def _make_model_and_cfg(clients):
    import jax

    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.federated.spmd import FED_HEAD_KEY
    from feddat_tpu.models.vilt import (
        TaskHeadSpec,
        ViltContinualLearner,
        init_vilt_params,
    )

    from conftest import TINY_VILT

    model = ViltContinualLearner(TINY_VILT, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(
        model, jax.random.PRNGKey(0), next(clients[0].train_batches(0))
    )
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1,
        seed=0,
    )
    return model, params, cfg


def _flatten_state(client_state):
    import jax
    from flax import traverse_util

    flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, client_state)
    )
    return {"/".join(map(str, k)): v for k, v in flat.items()}


def _make_albef_clients():
    from feddat_tpu.data.synthetic import SyntheticAlbefClient

    return [
        SyntheticAlbefClient(
            task_key=f"client_{i}", num_train=8, num_eval=4, num_answers=8,
            vocab_size=64, question_len=6, answer_len=4, image_size=(32, 32),
            batch_size=4, seed=i,
        )
        for i in range(NUM_CLIENTS)
    ]


def _make_albef_model_and_cfg(clients):
    import dataclasses

    import jax

    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from test_albef import TINY_ALBEF, TINY_BERT

    acfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.0, attention_dropout=0.0),
    )
    model = AlbefModel(acfg)
    params = init_albef_params(
        model, jax.random.PRNGKey(0), next(clients[0].train_batches(0))
    )
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1,
        seed=0,
    )
    return model, params, cfg


def worker(proc_id: int, nproc: int, port: int, out_dir: str, family: str = "vilt") -> None:
    """One process of the multi-host run (invoked via subprocess)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", nproc, proc_id)
    assert jax.process_count() == nproc

    from feddat_tpu.federated.spmd import SPMDFederatedTrainer
    from feddat_tpu.parallel.mesh import make_multihost_mesh

    if family == "preempt":
        return _preempt_worker(proc_id, out_dir)
    if family == "resume":
        return _resume_worker(proc_id, out_dir)
    if family == "albef":
        clients = _make_albef_clients()
        model, params, cfg = _make_albef_model_and_cfg(clients)
    else:
        clients = _make_clients()
        model, params, cfg = _make_model_and_cfg(clients)
    mesh = make_multihost_mesh(num_clients=NUM_CLIENTS, data_parallel=DATA_PARALLEL)

    kwargs = {}
    if family == "albef":
        kwargs = dict(
            family="albef",
            answer_banks={c.task_key: (c.answer_ids, c.answer_mask) for c in clients},
            rank_k=4,
        )
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh, **kwargs)
    assert trainer._multihost and len(trainer.local_slots) == NUM_CLIENTS // nproc

    # poison the REMOTE clients' data iterators: the contract is that this
    # process never materializes another host's batches
    def poisoned(*a, **kw):
        raise AssertionError(
            f"process {proc_id} iterated a remote client's data"
        )

    for i, c in enumerate(clients):
        if i not in trainer.local_slots:
            c.train_batches = poisoned
            c.eval_batches = poisoned

    trainer.run_round(0)
    entry = trainer.evaluate_round(0)

    # allgather the client-sharded bank so process 0 holds the full state.
    # NOTE: _to_host on sharded arrays is a collective — all processes
    # iterate in the same (sorted flatten) order.
    from flax import traverse_util

    flat = traverse_util.flatten_dict(trainer.client_state)
    state = {
        "/".join(map(str, k)): trainer._to_host(flat[k]) for k in sorted(flat)
    }
    if proc_id == 0:
        np.savez(os.path.join(out_dir, "mh_state.npz"), **state)
        with open(os.path.join(out_dir, "mh_scores.json"), "w") as f:
            json.dump(
                {"scores": entry["scores"], "local_slots": trainer.local_slots}, f
            )


def _preempt_worker(proc_id: int, out_dir: str) -> None:
    """Preemption CONSENSUS across real processes: only process 1 receives
    SIGTERM (mid round 1); the per-round consensus allgather must make BOTH
    processes checkpoint round 1 and leave the collective loop together —
    a lone early exit would deadlock the other at the next collective."""
    import dataclasses
    import signal

    from feddat_tpu.configs.core import FederatedConfig
    from feddat_tpu.federated.spmd import SPMDFederatedTrainer
    from feddat_tpu.parallel.mesh import make_multihost_mesh
    from feddat_tpu.utils.checkpointing import latest_round

    clients = _make_clients()
    model, params, cfg = _make_model_and_cfg(clients)
    cfg = dataclasses.replace(
        cfg, federated=FederatedConfig(comm_rounds=3, local_epochs=1, eval_every=3)
    )
    mesh = make_multihost_mesh(num_clients=NUM_CLIENTS, data_parallel=DATA_PARALLEL)
    ckpt = os.path.join(out_dir, "ckpt")
    trainer = SPMDFederatedTrainer(
        model, params, clients, cfg, mesh, checkpoint_dir=ckpt
    )

    if proc_id == 1:
        # deliver SIGTERM to THIS process only, while round 1's batches are
        # being produced (spmd passes epoch = round*1000 + e)
        victim = clients[trainer.local_slots[0]]
        orig = victim.train_batches

        def signaling(epoch=0):
            if epoch >= 1000:
                os.kill(os.getpid(), signal.SIGTERM)
            yield from orig(epoch)

        victim.train_batches = signaling

    history = trainer.run(resume=False)
    # both processes must agree: rounds 0..1 ran, 2 did not, no final eval
    assert history == [], history
    if proc_id == 0:
        assert latest_round(ckpt) == 1, latest_round(ckpt)
        with open(os.path.join(out_dir, "preempt_ok.json"), "w") as f:
            json.dump({"latest_round": latest_round(ckpt)}, f)


def _resume_worker(proc_id: int, out_dir: str) -> None:
    """Checkpoint/RESUME across real processes: run round 0, checkpoint,
    rebuild a fresh trainer, try_resume (round-agreement allgather + the
    collective orbax restore), run round 1, and dump the final state —
    compared against an uninterrupted single-process 2-round run."""
    import jax

    from feddat_tpu.federated.spmd import SPMDFederatedTrainer
    from feddat_tpu.parallel.mesh import make_multihost_mesh
    from flax import traverse_util

    ckpt = os.path.join(out_dir, "ckpt")
    clients = _make_clients()
    model, params, cfg = _make_model_and_cfg(clients)
    mesh = make_multihost_mesh(num_clients=NUM_CLIENTS, data_parallel=DATA_PARALLEL)
    t1 = SPMDFederatedTrainer(model, params, clients, cfg, mesh, checkpoint_dir=ckpt)
    t1.run_round(0)
    t1.save_checkpoint(0)

    # fresh trainer, DIFFERENT init (resume must fully overwrite it)
    clients2 = _make_clients()
    params2 = jax.tree_util.tree_map(lambda x: x * 0.0, params)
    t2 = SPMDFederatedTrainer(model, params2, clients2, cfg, mesh, checkpoint_dir=ckpt)
    start = t2.try_resume()
    assert start == 1, start
    t2.run_round(1)
    entry = t2.evaluate_round(1)
    flat = traverse_util.flatten_dict(t2.client_state)
    state = {"/".join(map(str, k)): t2._to_host(flat[k]) for k in sorted(flat)}
    if proc_id == 0:
        np.savez(os.path.join(out_dir, "mh_state.npz"), **state)
        with open(os.path.join(out_dir, "mh_scores.json"), "w") as f:
            json.dump({"scores": entry["scores"], "local_slots": t2.local_slots}, f)


def _run_two_process(tmp_path, family: str):
    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)), os.path.dirname(__file__)]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(pid), str(NPROC), str(port),
             str(tmp_path), family],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(NPROC)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"


def _compare_with_single_process(tmp_path, trainer):
    trainer.run_round(0)
    entry = trainer.evaluate_round(0)
    want = _flatten_state(trainer.client_state)
    got = dict(np.load(tmp_path / "mh_state.npz"))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=5e-4, atol=5e-6, err_msg=k)
    mh = json.load(open(tmp_path / "mh_scores.json"))
    assert mh["local_slots"] == [0, 1]
    for task, scores in entry["scores"].items():
        np.testing.assert_allclose(mh["scores"][task], scores, atol=0.51, err_msg=task)


@pytest.mark.slow
def test_two_process_spmd_round_matches_single_process(tmp_path):
    _run_two_process(tmp_path, "vilt")

    # single-process reference run of the identical config (8 devices here)
    from feddat_tpu.federated.spmd import SPMDFederatedTrainer
    from feddat_tpu.parallel.mesh import make_mesh

    clients = _make_clients()
    model, params, cfg = _make_model_and_cfg(clients)
    mesh = make_mesh(num_clients=NUM_CLIENTS, data_parallel=DATA_PARALLEL)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    _compare_with_single_process(tmp_path, trainer)


@pytest.mark.slow
def test_two_process_preemption_consensus(tmp_path):
    """Only process 1 is SIGTERM'd; the consensus allgather makes both
    processes checkpoint the same round and exit rc=0 (no deadlock, no
    mid-collective abandonment)."""
    _run_two_process(tmp_path, "preempt")
    got = json.load(open(tmp_path / "preempt_ok.json"))
    assert got["latest_round"] == 1


@pytest.mark.slow
def test_two_process_checkpoint_resume_matches_uninterrupted(tmp_path):
    """2-process round 0 -> checkpoint -> FRESH trainers resume -> round 1
    must equal an uninterrupted single-process 2-round run (collective orbax
    save/restore + round-agreement allgather + rng-chain restoration)."""
    _run_two_process(tmp_path, "resume")

    from feddat_tpu.federated.spmd import SPMDFederatedTrainer
    from feddat_tpu.parallel.mesh import make_mesh

    clients = _make_clients()
    model, params, cfg = _make_model_and_cfg(clients)
    mesh = make_mesh(num_clients=NUM_CLIENTS, data_parallel=DATA_PARALLEL)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    trainer.run_round(0)
    trainer.run_round(1)
    entry = trainer.evaluate_round(1)
    want = _flatten_state(trainer.client_state)
    got = dict(np.load(tmp_path / "mh_state.npz"))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=5e-4, atol=5e-6, err_msg=k)
    mh = json.load(open(tmp_path / "mh_scores.json"))
    for task, scores in entry["scores"].items():
        np.testing.assert_allclose(mh["scores"][task], scores, atol=0.51, err_msg=task)


@pytest.mark.slow
def test_two_process_albef_spmd_round_matches_single_process(tmp_path):
    """ALBEF family across two REAL processes: additionally exercises the
    answer-bank global assembly (P(client)-sharded [C, N, La] banks built
    from process-local shards) and the in-shard rank-answer eval."""
    _run_two_process(tmp_path, "albef")

    from feddat_tpu.federated.spmd import SPMDFederatedTrainer
    from feddat_tpu.parallel.mesh import make_mesh

    clients = _make_albef_clients()
    model, params, cfg = _make_albef_model_and_cfg(clients)
    mesh = make_mesh(num_clients=NUM_CLIENTS, data_parallel=DATA_PARALLEL)
    trainer = SPMDFederatedTrainer(
        model, params, clients, cfg, mesh, family="albef",
        answer_banks={c.task_key: (c.answer_ids, c.answer_mask) for c in clients},
        rank_k=4,
    )
    _compare_with_single_process(tmp_path, trainer)


if __name__ == "__main__":
    worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
           sys.argv[5] if len(sys.argv) > 5 else "vilt")
