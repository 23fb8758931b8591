"""Optimizer/schedule parity vs torch AdamW +
``get_polynomial_decay_schedule_with_warmup`` (reference
``task_trainer.py:53-59, 477-504``)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from feddat_tpu.configs.core import OptimizerConfig
from feddat_tpu.train.optim import adamw_direction, apply_direction, polynomial_schedule


def test_schedule_matches_transformers():
    from transformers import get_polynomial_decay_schedule_with_warmup

    cfg = OptimizerConfig(lr=1e-3, warmup_ratio=0.1)
    max_steps = 50
    sched = polynomial_schedule(cfg, max_steps)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=cfg.lr)
    tsched = get_polynomial_decay_schedule_with_warmup(
        opt, num_warmup_steps=int(max_steps * 0.1), num_training_steps=max_steps, lr_end=0, power=1
    )
    for k in range(60):
        torch_lr = tsched.get_last_lr()[0]
        ours = float(sched(k))
        np.testing.assert_allclose(ours, torch_lr, rtol=1e-6, atol=1e-9)
        opt.step()
        tsched.step()


def test_adamw_trajectory_matches_torch():
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)
    b0 = rng.randn(3).astype(np.float32)
    cfg = OptimizerConfig(lr=1e-2, weight_decay=1e-2, adam_eps=1e-8)

    # torch side: weight decays, bias does not (reference no-decay group).
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    tb = torch.nn.Parameter(torch.tensor(b0.copy()))
    opt = torch.optim.AdamW(
        [
            {"params": [tw], "weight_decay": cfg.weight_decay},
            {"params": [tb], "weight_decay": 0.0},
        ],
        lr=cfg.lr,
        eps=cfg.adam_eps,
        betas=(cfg.beta1, cfg.beta2),
    )

    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = adamw_direction(cfg)
    state = tx.init(params)

    for step in range(5):
        g_w = rng.randn(5, 3).astype(np.float32)
        g_b = rng.randn(3).astype(np.float32)
        tw.grad = torch.tensor(g_w)
        tb.grad = torch.tensor(g_b)
        opt.step()
        grads = {"layer": {"kernel": jnp.asarray(g_w), "bias": jnp.asarray(g_b)}}
        params, state = apply_direction(tx, grads, state, params, jnp.float32(cfg.lr))

    np.testing.assert_allclose(np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layer"]["bias"]), tb.detach().numpy(), rtol=2e-5, atol=1e-6)


def test_decay_mask_reference_no_decay_groups():
    """Reference no-decay = names containing 'bias' or 'LayerNorm.weight'
    (``task_trainer.py:496-503``).  BERT-lineage LN scales (torch module
    literally named LayerNorm) skip decay; HF-ViLT/timm norms (lowercase
    torch names) and the clf head LN are decayed."""
    from feddat_tpu.train.optim import _decay_mask

    z = lambda: 0.0  # leaf values are irrelevant
    params = {
        "text_embeddings": {"norm": {"scale": z(), "bias": z()}},
        "layers": {"layer": {
            "norm_before": {"scale": z(), "bias": z()},
            "attention_norm": {"scale": z(), "bias": z()},
            "output_norm": {"scale": z(), "bias": z()},
            "mlp": {"intermediate": {"kernel": z(), "bias": z()}},
        }},
        "final_norm": {"scale": z(), "bias": z()},
        "task_x": {"clf_norm0": {"scale": z(), "bias": z()}},
        "cls": {"transform_norm": {"scale": z(), "bias": z()}},
    }
    m = _decay_mask(params)
    # biases never decay
    assert not m["layers"]["layer"]["mlp"]["intermediate"]["bias"]
    assert not m["final_norm"]["bias"]
    # kernels decay
    assert m["layers"]["layer"]["mlp"]["intermediate"]["kernel"]
    # torch-'LayerNorm' scales skip decay
    assert not m["text_embeddings"]["norm"]["scale"]
    assert not m["layers"]["layer"]["attention_norm"]["scale"]
    assert not m["layers"]["layer"]["output_norm"]["scale"]
    assert not m["cls"]["transform_norm"]["scale"]
    # lowercase-torch-named norms DO decay (reference substring quirk)
    assert m["layers"]["layer"]["norm_before"]["scale"]
    assert m["final_norm"]["scale"]
    assert m["task_x"]["clf_norm0"]["scale"]
