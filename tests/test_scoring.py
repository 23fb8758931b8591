"""VQA-score parity with the reference's torch implementation
(``train_vqa_crossvqa.py:241-257``, ``vqa_utils.py:21-67``)."""

import numpy as np
import torch

from feddat_tpu.data.vqa_scoring import (
    compute_score_with_logits,
    get_score,
    target_tensor,
)


def _torch_compute_score(logits, labels):
    logits = torch.tensor(logits)
    labels = torch.tensor(labels)
    idx = torch.max(logits, 1)[1].data
    one_hots = torch.zeros(*labels.size())
    one_hots.scatter_(1, idx.view(-1, 1), 1)
    return (one_hots * labels).sum(1).numpy()


def test_compute_score_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 100).astype(np.float32)
    target = rng.rand(8, 100).astype(np.float32)
    ours = np.asarray(compute_score_with_logits(logits, target))
    np.testing.assert_allclose(ours, _torch_compute_score(logits, target), rtol=1e-6)


def test_get_score_table():
    assert [get_score(i) for i in range(6)] == [0.0, 0.3, 0.6, 0.9, 1.0, 1.0]


def test_target_tensor():
    t = target_tensor(10, [2, 5], [0.3, 1.0])
    assert t[2] == np.float32(0.3) and t[5] == 1.0 and t.sum() == np.float32(1.3)
    assert target_tensor(4, [], []).sum() == 0
