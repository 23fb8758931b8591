"""Loss parity against torch implementations of the reference's formulas
(``task_trainer.py:299, 506-515``)."""

import numpy as np
import torch
import torch.nn.functional as F

from feddat_tpu.train.losses import bce_with_logits_vqa, cross_entropy, kd_kl_loss


def test_bce_vqa_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 100).astype(np.float32)
    target = (rng.rand(4, 100) < 0.05).astype(np.float32) * rng.rand(4, 100).astype(np.float32)
    ours = float(bce_with_logits_vqa(logits, target))
    ref = float(
        torch.nn.BCEWithLogitsLoss(reduction="mean")(
            torch.tensor(logits), torch.tensor(target)
        )
        * target.shape[1]
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _torch_kl(output, target, temp=3):
    output, target = torch.tensor(output), torch.tensor(target)
    if output.shape[-1] > 3000:
        p = F.log_softmax(output / temp, dim=-1)
        q = F.softmax(target / temp, dim=-1)
    else:
        p = F.log_softmax(output / temp, dim=1)
        q = F.softmax(target / temp, dim=1)
    return float(F.kl_div(p, q, reduction="batchmean") * temp**2)


def test_kd_kl_matches_torch_small_vocab():
    rng = np.random.RandomState(1)
    a = rng.randn(4, 100).astype(np.float32)
    b = rng.randn(4, 100).astype(np.float32)
    np.testing.assert_allclose(float(kd_kl_loss(a, b)), _torch_kl(a, b), rtol=1e-4)


def test_kd_kl_matches_torch_large_vocab():
    rng = np.random.RandomState(2)
    a = rng.randn(2, 5, 30522).astype(np.float32)
    b = rng.randn(2, 5, 30522).astype(np.float32)
    np.testing.assert_allclose(float(kd_kl_loss(a, b)), _torch_kl(a, b), rtol=1e-4)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(3)
    logits = rng.randn(6, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(6,))
    ours = float(cross_entropy(logits, labels))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
