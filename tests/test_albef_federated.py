"""Federated DAT round with ALBEF clients through the sequential engine
(the reference's ``train_albef.sh`` path: albef_no_distill + dat)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from feddat_tpu.configs.core import (
    FederatedConfig,
    OptimizerConfig,
    PEFTMode,
    TrainConfig,
)
from feddat_tpu.data.synthetic import SyntheticAlbefClient
from feddat_tpu.federated.engine import FederatedTrainer
from feddat_tpu.models.albef import AlbefModel, init_albef_params
from feddat_tpu.train.evaluation import make_albef_eval_step
from feddat_tpu.train.forwards import make_albef_forward

from test_albef import TINY_ALBEF


def test_albef_federated_round_runs_and_improves():
    clients = {
        f"c{i}": SyntheticAlbefClient(
            task_key=f"c{i}", num_train=8, num_eval=4, num_answers=8,
            vocab_size=64, question_len=6, answer_len=4, image_size=(32, 32),
            batch_size=4, seed=i,
        )
        for i in range(2)
    }
    model = AlbefModel(TINY_ALBEF)
    sample = next(iter(clients.values()))
    batch = next(sample.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    cfg = TrainConfig(
        encoder_name="albef_no_distill",
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=2, local_epochs=1, eval_every=2),
        num_epochs=4,
        seed=0,
    )

    def make_forward(mdl, task_key):
        return make_albef_forward(mdl)

    def make_eval(mdl, task_key):
        c = clients[task_key]
        return make_albef_eval_step(mdl, c.answer_ids, c.answer_mask, k=4)

    trainer = FederatedTrainer(
        model, params, clients, cfg, make_forward=make_forward, make_eval=make_eval
    )

    client0 = trainer.clients[0]
    probe = next(client0.data.train_batches(epoch=0))

    def probe_loss():
        p = trainer._client_params(client0)
        loss, _ = client0.forward(p, probe, "ensemble", jax.random.PRNGKey(0))
        return float(loss)

    before = probe_loss()
    history = trainer.run()
    after = probe_loss()
    assert after < before, (before, after)
    assert history and all(len(v) == 3 for v in history[-1]["scores"].values())
