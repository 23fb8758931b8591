"""ALBEF momentum-distillation through the engine (albef_distill path:
aux twins seeded per client, alpha ramp, plain-step training)."""

import jax
import numpy as np
from flax import traverse_util

from feddat_tpu.configs.core import (
    FederatedConfig,
    OptimizerConfig,
    PEFTMode,
    TrainConfig,
)
from feddat_tpu.data.synthetic import SyntheticAlbefClient
from feddat_tpu.federated.engine import FederatedTrainer
from feddat_tpu.models.albef import AlbefModel, init_albef_params
from feddat_tpu.train.trainers import albef_hooks, resolve_trainer, vilt_hooks

from test_albef import TINY_ALBEF


def test_trainer_registry():
    h = resolve_trainer("vilt", "vqa_cross")
    assert h.metric == "vqa_score" and h.aux_init is None
    h = resolve_trainer("vilt", "nlvr2")
    assert h.metric == "accuracy"
    banks = {"c0": (np.zeros((4, 3), np.int32), np.ones((4, 3), np.int32))}
    h = resolve_trainer("albef_distill", "vqa_cross", answer_banks=banks)
    assert h.aux_forward and h.batch_transform is not None


def test_albef_distill_adapter_mode_round():
    import dataclasses

    from feddat_tpu.configs.core import AdapterSpec

    cfg_model = dataclasses.replace(
        TINY_ALBEF, adapter=AdapterSpec(names=("adapter",), reduction_factor=4), distill=True
    )
    clients = {
        "c0": SyntheticAlbefClient(
            task_key="c0", num_train=8, num_eval=4, num_answers=8,
            vocab_size=64, question_len=6, answer_len=4, image_size=(32, 32),
            batch_size=4, seed=0,
        )
    }
    model = AlbefModel(cfg_model)
    batch = next(clients["c0"].train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    banks = {"c0": (clients["c0"].answer_ids, clients["c0"].answer_mask)}
    hooks = albef_hooks(banks, distill=True, rank_k=4)
    cfg = TrainConfig(
        encoder_name="albef_distill",
        peft_mode=PEFTMode.ADAPTER,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=2,
    )
    trainer = FederatedTrainer(
        model, params, clients, cfg,
        make_forward=hooks.make_forward,
        make_eval=hooks.make_eval,
        aux_init=hooks.aux_init,
        batch_transform=hooks.batch_transform,
        aux_forward=hooks.aux_forward,
    )
    history = trainer.run()
    assert history and "c0" in history[-1]["scores"]
    # adapter moved, backbone did not
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(trainer.server_params)
    moved = [k for k in f0 if not np.allclose(np.asarray(f0[k]), np.asarray(f1[k]))]
    assert moved and all("adapter" in "/".join(map(str, k)) for k in moved)
