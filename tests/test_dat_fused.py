"""Fused DAT step (single ensemble encoder pass) == standard DAT step,
exactly, when encoder dropout is off."""

import jax
import numpy as np
import pytest
from flax import traverse_util

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
from feddat_tpu.train.dat import (
    Partitioner,
    init_train_state,
    make_dat_train_step,
    make_dat_train_step_fused,
)
from feddat_tpu.train.forwards import make_vilt_forward
from feddat_tpu.train.losses import bce_with_logits_vqa

from conftest import TINY_VILT, tiny_batch

OPT = OptimizerConfig(lr=1e-2)


def test_fused_step_matches_standard():
    model = ViltContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(5))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    part = Partitioner(params, "coco", PEFTMode.DAT)

    std_step = make_dat_train_step(
        make_vilt_forward(model, "coco"), part, OPT, max_steps=100, donate=False
    )

    def encode(p, b, mode, rng):
        return model.apply(
            {"params": p}, "coco", b, adapter_mode=mode, deterministic=True,
            method=type(model).encode_single_image,
        )

    def head_fn(head_subtree, pooled):
        # head params live at task_coco in the tree; rebuild a minimal tree
        from feddat_tpu.peft.partition import merge

        return model.apply(
            {"params": merge(head_subtree, _frozen_rest)},
            "coco",
            pooled,
            method=type(model).apply_head,
        )

    from feddat_tpu.peft.partition import split_by_roles, label_params

    labels = label_params(params)
    _, _frozen_rest = split_by_roles(params, labels, frozenset({"head"}))

    def task_loss(logits, b):
        return bce_with_logits_vqa(logits, b["target_scores"])

    fused_step = make_dat_train_step_fused(
        encode, head_fn, task_loss, part, OPT, max_steps=100, donate=False
    )

    s_std = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    s_fused = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    for i in range(3):
        s_std, m_std = std_step(s_std, batch)
        s_fused, m_fused = fused_step(s_fused, batch)
        np.testing.assert_allclose(
            float(m_std["loss"]), float(m_fused["loss"]), rtol=1e-5
        )
    f0 = traverse_util.flatten_dict(s_std.params)
    f1 = traverse_util.flatten_dict(s_fused.params)
    for k in f0:
        np.testing.assert_allclose(
            np.asarray(f0[k]), np.asarray(f1[k]), rtol=2e-5, atol=1e-7, err_msg=str(k)
        )


def test_engine_with_fused_dat_step():
    from feddat_tpu.configs.core import FederatedConfig, TrainConfig
    from feddat_tpu.data.synthetic import SyntheticVQAClient
    from feddat_tpu.federated.engine import FederatedTrainer

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
        optimizer=OPT,
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
    )
    t_fused = FederatedTrainer(model, params, clients, cfg, use_fused_dat=True)
    t_std = FederatedTrainer(model, params, clients, cfg, use_fused_dat=False)
    t_fused.run_round(0)
    t_std.run_round(0)
    f0 = traverse_util.flatten_dict(t_std.server_params)
    f1 = traverse_util.flatten_dict(t_fused.server_params)
    for k in f0:
        np.testing.assert_allclose(
            np.asarray(f0[k]), np.asarray(f1[k]), rtol=2e-5, atol=1e-7, err_msg=str(k)
        )


def test_albef_fused_step_matches_standard():
    """ALBEF fused DAT step == standard step (dropout disabled)."""
    import dataclasses

    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.forwards import make_albef_forward
    from feddat_tpu.train.trainers import make_albef_fused_dat_step
    from test_albef import TINY_ALBEF, TINY_BERT

    cfg = dataclasses.replace(
        TINY_ALBEF, bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.0, attention_dropout=0.0)
    )
    client = SyntheticAlbefClient(
        task_key="c", num_train=8, num_eval=4, num_answers=8, vocab_size=64,
        question_len=6, answer_len=4, image_size=(32, 32), batch_size=4, seed=0,
    )
    model = AlbefModel(cfg)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    from feddat_tpu.train.dat import make_dat_train_step

    part_std = Partitioner(params, "fed", PEFTMode.DAT)
    std_step = make_dat_train_step(
        make_albef_forward(model), part_std, OPT, max_steps=100, donate=False
    )
    fused_step, part_f = make_albef_fused_dat_step(model, params, OPT, max_steps=100)

    s_std = init_train_state(params, part_std, OPT, jax.random.PRNGKey(0))
    s_fused = init_train_state(params, part_f, OPT, jax.random.PRNGKey(0))
    for _ in range(2):
        s_std, m_std = std_step(s_std, batch)
        s_fused, m_fused = fused_step(s_fused, batch)
        np.testing.assert_allclose(float(m_std["loss"]), float(m_fused["loss"]), rtol=1e-5)
    f0 = traverse_util.flatten_dict(s_std.params)
    f1 = traverse_util.flatten_dict(s_fused.params)
    for k in f0:
        np.testing.assert_allclose(
            np.asarray(f0[k]), np.asarray(f1[k]), rtol=5e-4, atol=1e-6, err_msg=str(k)
        )


def test_albef_sequential_engine_fused_routes_and_carries_dropout(caplog):
    """FederatedTrainer(use_fused_dat=True) with an ALBEF model must route to
    the ALBEF fused builder (it used to hit the ViLT-only one and crash).
    With live dropout (reference default 0.1) the fused step THREADS the
    masks through (round 4) — it must log the documented stage-①/③
    mask-sharing deviation at INFO, not the old drops-dropout warning, and
    the run must be stochastic (nonzero dropout actually applied)."""
    import dataclasses
    import logging

    from feddat_tpu.configs.core import FederatedConfig, TrainConfig
    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.evaluation import make_albef_eval_step
    from feddat_tpu.train.forwards import make_albef_forward
    from test_albef import TINY_ALBEF, TINY_BERT

    # give the tiny config the reference's nonzero dropout -> expect the warning
    acfg = dataclasses.replace(
        TINY_ALBEF, bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.1)
    )

    clients = {
        f"c{i}": SyntheticAlbefClient(
            task_key=f"c{i}", num_train=8, num_eval=4, num_answers=8,
            vocab_size=64, question_len=6, answer_len=4, image_size=(32, 32),
            batch_size=4, seed=i,
        )
        for i in range(2)
    }
    model = AlbefModel(acfg)
    batch = next(clients["c0"].train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        encoder_name="albef_no_distill",
        peft_mode=PEFTMode.DAT,
        optimizer=OPT,
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1,
        seed=0,
    )

    def make_eval(mdl, task_key):
        c = clients[task_key]
        return make_albef_eval_step(mdl, c.answer_ids, c.answer_mask, k=4)

    with caplog.at_level(logging.INFO, logger="feddat_tpu"):
        trainer = FederatedTrainer(
            model, params, clients, cfg,
            make_forward=lambda m, k: make_albef_forward(m),
            make_eval=make_eval,
            use_fused_dat=True,
        )
    assert any("carries live dropout" in r.message for r in caplog.records)
    assert not any("drops dropout" in r.message for r in caplog.records)
    history = trainer.run()
    assert history and all(len(v) == 3 for v in history[-1]["scores"].values())


@pytest.mark.slow
def test_albef_fused_dropout_distribution_matches_standard():
    """With live dropout the fused step cannot be bitwise-exact vs the
    standard step (three independent mask draws there; here stages ① and ③
    share the ensemble pass's draw).  The claim to hold is DISTRIBUTIONAL:
    over many rng seeds from identical init, the per-step losses of the two
    steps must have matching means (within pooled standard error), and both
    must actually be stochastic (dropout live).  Reference sequence:
    ``task_trainer.py:280-330``."""
    import dataclasses

    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.dat import make_dat_train_step
    from feddat_tpu.train.forwards import make_albef_forward
    from feddat_tpu.train.trainers import make_albef_fused_dat_step
    from test_albef import TINY_ALBEF, TINY_BERT

    cfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.3, attention_dropout=0.3),
    )
    client = SyntheticAlbefClient(
        task_key="c", num_train=8, num_eval=4, num_answers=8, vocab_size=64,
        question_len=6, answer_len=4, image_size=(32, 32), batch_size=4, seed=0,
    )
    model = AlbefModel(cfg)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    part = Partitioner(params, "fed", PEFTMode.DAT)
    std_step = make_dat_train_step(
        make_albef_forward(model), part, OPT, max_steps=100, donate=False
    )
    fused_step, part_f = make_albef_fused_dat_step(model, params, OPT, max_steps=100)

    N = 32
    losses = {"std": [], "fused": []}
    for name, step, p in (("std", std_step, part), ("fused", fused_step, part_f)):
        for seed in range(N):
            state = init_train_state(params, p, OPT, jax.random.PRNGKey(100 + seed))
            state, m1 = step(state, batch)
            _, m2 = step(state, batch)
            losses[name].append(
                (float(m1["loss"]), float(m1["loss_shared"]),
                 float(m2["loss"]), float(m2["loss_shared"]))
            )
    std = np.array(losses["std"])
    fused = np.array(losses["fused"])
    # both stochastic: seed changes the loss (dropout is actually live)
    assert std.std(axis=0).min() > 1e-6
    assert fused.std(axis=0).min() > 1e-6
    # distribution-level equivalence: means within 4 pooled standard errors
    # per tracked loss (stage-③ and stage-② losses, steps 1 and 2)
    se = np.sqrt((std.var(axis=0) + fused.var(axis=0)) / N)
    diff = np.abs(std.mean(axis=0) - fused.mean(axis=0))
    assert (diff < 4 * se + 1e-7).all(), (
        f"fused-with-dropout loss means diverge from standard: diff={diff}, "
        f"4*se={4 * se}, std_means={std.mean(axis=0)}, "
        f"fused_means={fused.mean(axis=0)}"
    )
