"""ViLT-BERT variant, single-task mode, model registry, CLI parser."""

import dataclasses

import jax
import numpy as np
import pytest
from flax import traverse_util

pytestmark = pytest.mark.slow

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
from feddat_tpu.models import create_model
from feddat_tpu.models.vilt import TaskHeadSpec, init_vilt_params
from feddat_tpu.models.viltbert import ViltBertContinualLearner
from feddat_tpu.peft.partition import label_params
from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
from feddat_tpu.train.forwards import make_vilt_forward

from conftest import TINY_VILT, tiny_batch


def test_viltbert_forward_and_frozen_bert():
    model = ViltBertContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    assert "text_bert" in params
    # vilt text word embeddings must NOT exist: text comes from BERT
    assert "word_embeddings" not in params["vilt"]["text_embeddings"]
    _, logits = model.apply({"params": params}, "coco", batch, adapter_mode="ensemble")
    assert logits.shape == (4, 16)

    # DAT training must leave the frozen BERT untouched
    part = Partitioner(params, "coco", PEFTMode.DAT)
    opt = OptimizerConfig(lr=1e-2)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    step = make_dat_train_step(make_vilt_forward(model, "coco"), part, opt, 100, donate=False)
    for _ in range(2):
        state, m = step(state, batch)
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    for k in f0:
        if str(k[0]) == "text_bert":
            np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f1[k]), err_msg=str(k))
    assert float(m["loss"]) > 0


def test_registry_creates_all_encoders():
    heads = {"t": TaskHeadSpec(num_labels=8)}
    for name in ("vilt", "viltbert", "albef_no_distill", "albef_distill"):
        model, cfg = create_model(name, heads, PEFTMode.DAT)
        assert model is not None
    with pytest.raises(ValueError):
        create_model("flava", heads, PEFTMode.DAT)


def test_single_task_mode():
    from feddat_tpu.configs.core import FederatedConfig, TrainConfig
    from feddat_tpu.data.synthetic import SyntheticVQAClient
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import ViltContinualLearner

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
        federated=FederatedConfig(comm_rounds=2, local_epochs=1),
        num_epochs=2,
        single_task=True,
    )
    trainer = FederatedTrainer(model, params, clients, cfg)
    params_before = jax.tree_util.tree_map(np.asarray, trainer.server_params)
    entry = trainer.run_single_task()
    assert entry["single_task"] and "c0" in entry["scores"]
    # server params restored to the initial state afterwards
    f0 = traverse_util.flatten_dict(params_before)
    f1 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, trainer.server_params))
    for k in f0:
        np.testing.assert_array_equal(f0[k], f1[k])


def test_cli_parser_reference_surface():
    from feddat_tpu.cli import build_parser, resolve_task_keys

    args = build_parser().parse_args(
        [
            "--encoder_name", "vilt", "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "domain", "--batch_size", "2", "--lr", "1e-4",
            "--adapter_reduction_factor", "16", "--adapter_config", "pfeiffer",
            "--splits", "train_small", "val", "test_small", "--seed", "1",
        ]
    )
    assert args.encoder_name == "vilt" and args.adapter_reduction_factor == 16
    assert resolve_task_keys("domain") == ("art", "abstract", "vizwiz", "toronto", "gqa")
    assert resolve_task_keys("scene") == tuple(f"clove_scene_{l}" for l in "abcdef")
    assert resolve_task_keys("art,gqa") == ("art", "gqa")


def test_full_mode_excludes_frozen_bert_from_optimizer():
    """text_bert is structurally frozen (stop_gradient): it must stay out of
    the optimizer's trainable set, or optax's decoupled weight decay would
    mutate it despite zero grads (torch AdamW skips grad-None params)."""
    from feddat_tpu.train.dat import make_plain_train_step

    model = ViltBertContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    for mode in (PEFTMode.FULL, PEFTMode.FREEZE_BOTTOM_K):
        part = Partitioner(params, "coco", mode, layers_to_freeze=1)
        assert not any(str(k[0]) == "text_bert" for k in part.shared_paths), mode

    part = Partitioner(params, "coco", PEFTMode.FULL)
    opt = OptimizerConfig(lr=1e-2, weight_decay=0.1, warmup_ratio=0.0)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    step = make_plain_train_step(
        make_vilt_forward(model, "coco"), part, opt, 100, "none", donate=False
    )
    state, _ = step(state, batch)
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    changed = 0
    for k in f0:
        if str(k[0]) == "text_bert":
            np.testing.assert_array_equal(
                np.asarray(f0[k]), np.asarray(f1[k]), err_msg=str(k)
            )
        else:
            changed += int(not np.array_equal(np.asarray(f0[k]), np.asarray(f1[k])))
    assert changed > 0
