"""Golden-value regression: fixed seeds -> exact DAT loss trajectory.

Guards the full stack (init, adapter math, losses, optimizer, schedule)
against silent numerical drift during refactors.  Values recorded on CPU
fp32 with jax 0.9.0 / flax 0.12.3; loosen (and re-record) only with an
understood cause.
"""

import numpy as np

import jax
import pytest

pytestmark = pytest.mark.slow

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
from feddat_tpu.train.forwards import make_vilt_forward

from conftest import TINY_VILT, tiny_batch

GOLDEN_LOSSES = [5.457779, 4.974963, 4.288163]

# Fixed-seed ALBEF DAT trajectory (same stack as the ViLT pin, plus the ViT
# tower, xBERT fusion encoder, LM decoder and the weighted shifted-CE loss).
# Pins the family independently of the engine-vs-engine equivalence tests,
# which could drift together.  Recorded on CPU fp32, jax 0.9.0 / flax 0.12.3.
GOLDEN_ALBEF_LOSSES = [2.089964, 2.001037, 1.932801]


def test_dat_loss_trajectory_golden():
    model = ViltContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(42))
    params = init_vilt_params(model, jax.random.PRNGKey(123), batch)
    part = Partitioner(params, "coco", PEFTMode.DAT)
    opt = OptimizerConfig(lr=1e-2)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(7))
    step = make_dat_train_step(
        make_vilt_forward(model, "coco"), part, opt, max_steps=100, donate=False
    )
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=1e-4, err_msg=str(losses))


def test_albef_dat_loss_trajectory_golden():
    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.forwards import make_albef_forward

    from test_albef import TINY_ALBEF

    client = SyntheticAlbefClient(
        task_key="golden", num_train=16, num_eval=8, num_answers=8, vocab_size=64,
        question_len=6, answer_len=4, image_size=(32, 32), batch_size=4, seed=11,
    )
    model = AlbefModel(TINY_ALBEF)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(123), batch)
    part = Partitioner(params, "golden", PEFTMode.DAT)
    opt = OptimizerConfig(lr=1e-2)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(7))
    step = make_dat_train_step(
        make_albef_forward(model), part, opt, max_steps=100, donate=False
    )
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(
        losses, GOLDEN_ALBEF_LOSSES, rtol=1e-4, err_msg=str(losses)
    )
