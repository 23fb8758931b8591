"""Integrated DAT+MKD parity: our jitted step vs a torch replica of the
reference's training sequence (``task_trainer.py:280-330``) on a small
model with identical weights.

This composes everything the component parity tests cover individually:
adapter math, BCE*C + temperature-3 KL, stop-gradient placement, the two
masked AdamW updates with a shared polynomial-schedule clock, the frozen
teacher, and head updates in both halves.  Five steps, exact trajectories.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

pytestmark = pytest.mark.slow

import flax.linen as nn
import jax
import jax.numpy as jnp

from feddat_tpu.configs.core import AdapterSpec, OptimizerConfig, PEFTMode
from feddat_tpu.models.adapters import AdapterCell
from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
from feddat_tpu.train.losses import bce_with_logits_vqa, kd_kl_loss

D, R, C = 16, 4, 6  # feature dim, bottleneck, classes
SPEC = AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=D // R)
OPT = OptimizerConfig(lr=1e-2, weight_decay=1e-2)
MAX_STEPS = 40


class TinyModel(nn.Module):
    """frozen backbone linear -> adapter site -> task head."""

    @nn.compact
    def __call__(self, x, adapter_mode="none"):
        h = nn.Dense(D, use_bias=False, name="backbone")(x)
        cell = AdapterCell(SPEC, D, name="adapter")
        h = h + cell.delta(h, adapter_mode)
        return nn.Dense(C, name="task_t")(h)


class TorchTiny(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = torch.nn.Linear(D, D, bias=False)
        for name in ("adapter_0", "adapter_1", "adapter_2"):
            setattr(self, f"{name}_down", torch.nn.Linear(D, R))
            setattr(self, f"{name}_up", torch.nn.Linear(R, D))
        self.head = torch.nn.Linear(D, C)

    def branch(self, name, h):
        down = getattr(self, f"{name}_down")
        up = getattr(self, f"{name}_up")
        return up(torch.relu(down(h)))

    def forward(self, x, mode):
        h = self.backbone(x)
        if mode == "ensemble":
            h = h + 0.5 * self.branch("adapter_0", h) + 0.5 * self.branch("adapter_2", h)
        else:
            h = h + self.branch(mode, h)
        return self.head(h)


def _sync_torch_from_flax(tmodel, params):
    with torch.no_grad():
        tmodel.backbone.weight.copy_(torch.tensor(np.asarray(params["backbone"]["kernel"]).T))
        for name in ("adapter_0", "adapter_1", "adapter_2"):
            a = params["adapter"]
            getattr(tmodel, f"{name}_down").weight.copy_(torch.tensor(np.asarray(a[f"{name}_down"]["kernel"]).T))
            getattr(tmodel, f"{name}_down").bias.copy_(torch.tensor(np.asarray(a[f"{name}_down"]["bias"])))
            getattr(tmodel, f"{name}_up").weight.copy_(torch.tensor(np.asarray(a[f"{name}_up"]["kernel"]).T))
            getattr(tmodel, f"{name}_up").bias.copy_(torch.tensor(np.asarray(a[f"{name}_up"]["bias"])))
        tmodel.head.weight.copy_(torch.tensor(np.asarray(params["task_t"]["kernel"]).T))
        tmodel.head.bias.copy_(torch.tensor(np.asarray(params["task_t"]["bias"])))


def _torch_kl(output, target, temp=3):
    p = F.log_softmax(output / temp, dim=1)
    q = F.softmax(target / temp, dim=1)
    return F.kl_div(p, q, reduction="batchmean") * temp**2


def _torch_dat_steps(tmodel, xs, targets, num_steps):
    """The reference's DAT sequence with torch AdamW + poly schedule."""
    from transformers import get_polynomial_decay_schedule_with_warmup

    params = []
    no_decay = []
    for n, p in tmodel.named_parameters():
        if n == "backbone.weight" or "adapter_2" in n:
            p.requires_grad = False
            continue
        (no_decay if n.endswith("bias") else params).append(p)
    opt = torch.optim.AdamW(
        [
            {"params": params, "weight_decay": OPT.weight_decay},
            {"params": no_decay, "weight_decay": 0.0},
        ],
        lr=OPT.lr,
        eps=OPT.adam_eps,
        betas=(OPT.beta1, OPT.beta2),
    )
    sched = get_polynomial_decay_schedule_with_warmup(
        opt, num_warmup_steps=int(MAX_STEPS * OPT.warmup_ratio),
        num_training_steps=MAX_STEPS, lr_end=0, power=1,
    )
    crit = torch.nn.BCEWithLogitsLoss(reduction="mean")

    def set_trainable(active, frozen):
        for n, p in tmodel.named_parameters():
            if active in n:
                p.requires_grad = True
            if frozen in n:
                p.requires_grad = False

    for step in range(num_steps):
        x = torch.tensor(xs[step])
        target = torch.tensor(targets[step])
        with torch.no_grad():
            logits_all = tmodel(x, "ensemble")
        # ② shared update
        set_trainable("adapter_1", "adapter_0")
        logits_1 = tmodel(x, "adapter_1")
        l1 = (crit(logits_1, target) * C + _torch_kl(logits_1, logits_all.detach())) / 2
        l1.backward()
        opt.step(); sched.step(); opt.zero_grad()
        # ③ local update through the ensemble
        set_trainable("adapter_0", "adapter_1")
        logits_0 = tmodel(x, "ensemble")
        l0 = (crit(logits_0, target) * C + _torch_kl(logits_0, logits_1.detach())) / 2
        l0.backward()
        opt.step(); sched.step(); opt.zero_grad()


@pytest.mark.parametrize("num_steps", [5])
def test_dat_trajectory_matches_torch(num_steps):
    rng = np.random.RandomState(0)
    xs = [rng.randn(4, D).astype(np.float32) for _ in range(num_steps)]
    targets = [
        np.eye(C, dtype=np.float32)[rng.randint(0, C, size=4)] for _ in range(num_steps)
    ]

    model = TinyModel()
    params = jax.jit(lambda r, x: model.init(r, x, adapter_mode="init_all"))(
        jax.random.PRNGKey(0), jnp.asarray(xs[0])
    )["params"]
    # DAT precondition: the teacher starts as a copy of the shared adapter
    from feddat_tpu.peft.partition import teacher_refresh

    params = teacher_refresh(params)

    tmodel = TorchTiny()
    _sync_torch_from_flax(tmodel, params)

    def forward(p, batch, mode, dropout_rng):
        logits = model.apply({"params": p}, batch["x"], adapter_mode=mode)
        return bce_with_logits_vqa(logits, batch["target_scores"]), logits

    part = Partitioner(params, "t", PEFTMode.DAT)
    assert part.head_paths and part.shared_paths and part.local_paths
    state = init_train_state(params, part, OPT, jax.random.PRNGKey(0))
    step = make_dat_train_step(forward, part, OPT, max_steps=MAX_STEPS, donate=False)
    for i in range(num_steps):
        state, _ = step(state, {"x": jnp.asarray(xs[i]), "target_scores": jnp.asarray(targets[i])})

    _torch_dat_steps(tmodel, xs, targets, num_steps)

    final = state.params
    np.testing.assert_allclose(
        np.asarray(final["task_t"]["kernel"]).T, tmodel.head.weight.detach().numpy(),
        rtol=1e-4, atol=1e-6, err_msg="head kernel diverged",
    )
    for name in ("adapter_0", "adapter_1"):
        np.testing.assert_allclose(
            np.asarray(final["adapter"][f"{name}_down"]["kernel"]).T,
            getattr(tmodel, f"{name}_down").weight.detach().numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"{name} down kernel diverged",
        )
        np.testing.assert_allclose(
            np.asarray(final["adapter"][f"{name}_up"]["bias"]),
            getattr(tmodel, f"{name}_up").bias.detach().numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"{name} up bias diverged",
        )
    # teacher untouched on both sides
    np.testing.assert_allclose(
        np.asarray(final["adapter"]["adapter_2_down"]["kernel"]).T,
        tmodel.adapter_2_down.weight.detach().numpy(),
        rtol=1e-6, atol=1e-8,
    )
