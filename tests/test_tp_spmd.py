"""Tensor parallelism composed with the SPMD clients-mesh engine.

VERDICT r4 item 5: SURVEY §2.7 frames the decomposition as a ``(clients,
data)`` mesh plus an optional ``model`` axis.  These tests run the SPMD
engine over a ``(client, data, model)`` mesh — shard_map stays manual over
(client, data) only (``axis_names``), the backbone carries the
``parallel.tp`` column/row layout on the auto model axis, and GSPMD inserts
the per-layer all-reduces — and assert numerical equivalence with the plain
``(client, data)`` run of the identical round (same clients, seeds, data).
"""

import jax
import numpy as np

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

from conftest import TINY_VILT


def _setup(num_clients=2, batch_size=4, peft_mode=PEFTMode.DAT):
    import dataclasses

    from feddat_tpu.configs.core import adapter_spec_for_mode

    model_cfg = dataclasses.replace(
        TINY_VILT, adapter=adapter_spec_for_mode(peft_mode, 4)
    )
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
    model = ViltContinualLearner(model_cfg, {FED_HEAD_KEY: TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(
        model, jax.random.PRNGKey(0), next(clients[0].train_batches(0))
    )
    cfg = TrainConfig(
        peft_mode=peft_mode,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
        seed=0,
    )
    return model, params, clients, cfg


def _run_round(model, params, clients, cfg, mesh):
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    trainer.run_round(0)
    state = jax.tree_util.tree_map(np.asarray, trainer.client_state)
    scores = trainer.evaluate_round(0)
    return state, scores


def test_tp_spmd_matches_plain_spmd():
    """(client=2, data=2, model=2) over 8 devices reproduces the
    (client=2, data=2) run bit-for-fp32-noise: the TP layout is a pure
    placement change (GSPMD all-reduces replace local contractions)."""
    model, params, clients, cfg = _setup()
    base_state, base_scores = _run_round(
        model, params, clients, cfg, make_mesh(num_clients=2, data_parallel=2)
    )
    tp_state, tp_scores = _run_round(
        model, params, clients, cfg,
        make_mesh(num_clients=2, data_parallel=2, model_parallel=2),
    )

    flat_b = jax.tree_util.tree_leaves(base_state)
    flat_t = jax.tree_util.tree_leaves(tp_state)
    for b, t in zip(flat_b, flat_t):
        np.testing.assert_allclose(b, t, rtol=2e-4, atol=2e-5)
    assert jax.tree_util.tree_structure(base_scores) == jax.tree_util.tree_structure(tp_scores)
    for b, t in zip(jax.tree_util.tree_leaves(base_scores), jax.tree_util.tree_leaves(tp_scores)):
        np.testing.assert_allclose(b, t, rtol=2e-4, atol=2e-4)


def _spec_axes(spec):
    axes = set()
    for entry in spec:
        if entry is None:
            continue
        if isinstance(entry, str):
            axes.add(entry)
        else:
            axes.update(entry)
    return axes


def test_tp_spmd_backbone_actually_sharded():
    """The model axis is not decorative: column/row-parallel kernels really
    are sharded over it, and the trainable adapter partition stays
    replicated (the parallel.tp contract)."""
    from flax import traverse_util

    from feddat_tpu.parallel.tp import MODEL_AXIS

    model, params, clients, cfg = _setup()
    mesh = make_mesh(num_clients=2, data_parallel=2, model_parallel=2)
    trainer = SPMDFederatedTrainer(model, params, clients, cfg, mesh)
    flat = traverse_util.flatten_dict(trainer.backbone)
    names_sharded = {
        "/".join(p)
        for p, v in flat.items()
        if MODEL_AXIS in _spec_axes(v.sharding.spec)
    }
    assert any("intermediate/kernel" in n for n in names_sharded), names_sharded
    assert any("query/dense/kernel" in n for n in names_sharded), names_sharded
    assert any(n.endswith("out/kernel") for n in names_sharded), names_sharded
    # adapters (the trainable partition) must stay replicated over model
    for p, v in flat.items():
        if "adapter" in "/".join(p):
            assert MODEL_AXIS not in _spec_axes(v.sharding.spec), p


def test_tp_spmd_adapter_mode():
    """Single-shared-adapter PEFT mode (plain step core) also composes."""
    model, params, clients, cfg = _setup(peft_mode=PEFTMode.ADAPTER)
    base_state, base_scores = _run_round(
        model, params, clients, cfg, make_mesh(num_clients=2, data_parallel=1)
    )
    tp_state, tp_scores = _run_round(
        model, params, clients, cfg,
        make_mesh(num_clients=2, data_parallel=1, model_parallel=2),
    )
    flat_b = jax.tree_util.tree_leaves(base_state)
    flat_t = jax.tree_util.tree_leaves(tp_state)
    for b, t in zip(flat_b, flat_t):
        np.testing.assert_allclose(b, t, rtol=2e-4, atol=2e-5)
    assert jax.tree_util.tree_structure(base_scores) == jax.tree_util.tree_structure(tp_scores)
    for b, t in zip(jax.tree_util.tree_leaves(base_scores), jax.tree_util.tree_leaves(tp_scores)):
        np.testing.assert_allclose(b, t, rtol=2e-4, atol=2e-4)


def test_tp_spmd_albef_matches_plain_spmd():
    """The ALBEF family (LM loss + rank-answer eval inside shard_map) also
    composes with the model axis: (client=2, data=2, model=2) reproduces
    the (client=2, data=2) run."""
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
    params = init_albef_params(
        model, jax.random.PRNGKey(0), next(clients[0].train_batches(0))
    )
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
        seed=0,
    )
    banks = {c.task_key: (c.answer_ids, c.answer_mask) for c in clients}

    def run(mesh):
        trainer = SPMDFederatedTrainer(
            model, params, clients, cfg, mesh, family="albef",
            answer_banks=banks, rank_k=4,
        )
        trainer.run_round(0)
        state = jax.tree_util.tree_map(np.asarray, trainer.client_state)
        return state, trainer.evaluate_round(0)

    base_state, base_scores = run(make_mesh(num_clients=2, data_parallel=2))
    tp_state, tp_scores = run(
        make_mesh(num_clients=2, data_parallel=2, model_parallel=2)
    )
    for b, t in zip(
        jax.tree_util.tree_leaves(base_state), jax.tree_util.tree_leaves(tp_state)
    ):
        np.testing.assert_allclose(b, t, rtol=5e-4, atol=5e-5)
    assert base_scores["scores"].keys() == tp_scores["scores"].keys()
    for k in base_scores["scores"]:
        np.testing.assert_allclose(
            base_scores["scores"][k], tp_scores["scores"][k], rtol=5e-4, atol=5e-4
        )
