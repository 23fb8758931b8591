"""Smoke tests for the synthetic heterogeneous-federation accuracy study
(feddat_tpu/study.py; the TPU-scale artifact is ACCURACY.md)."""

import numpy as np

from feddat_tpu.study import (
    K_SHARED,
    NUM_LABELS,
    PERSONAL_Q_TOKEN,
    HeterogeneousVQAClient,
    format_study,
    run_study,
)


def _tiny_client(idx=0, seed=0):
    return HeterogeneousVQAClient(
        task_key=f"client_{idx}", client_idx=idx, seed=seed,
        num_train=32, num_eval=16, vocab_size=64, text_len=8,
        image_size=(32, 32), batch_size=8, val_batch_size=8,
    )


def test_client_concepts_are_well_formed():
    c = _tiny_client()
    personal = c.input_ids[:, 0] == PERSONAL_Q_TOKEN
    # personal answers live in [K_SHARED, K_SHARED+3), shared in [0, K_SHARED)
    assert np.all(c.answers[personal] >= K_SHARED)
    assert np.all(c.answers[personal] < K_SHARED + 3)
    assert np.all(c.answers[~personal] < K_SHARED)
    assert personal.any() and (~personal).any()
    # one-hot targets
    assert c.target_scores.shape == (48, NUM_LABELS)
    np.testing.assert_array_equal(c.target_scores.sum(-1), 1.0)
    # brightness thresholds differ per client (the heterogeneity)
    assert _tiny_client(0).brightness_threshold != _tiny_client(3).brightness_threshold


def test_client_batches_match_pipeline_schema():
    c = _tiny_client()
    b = next(c.train_batches(0))
    assert b["pixel_values"].dtype == np.float32
    assert b["input_ids"].shape == (8, 8)
    ev = list(c.eval_batches())
    assert sum(int(e["valid"].sum()) for e in ev) == c.num_eval_examples


def test_run_study_smoke_dat():
    results = run_study(
        modes=("dat",), seeds=(0,), num_clients=2, comm_rounds=2,
        full_scale=False, lr=5e-3,
    )
    table = results["dat"]["table"]
    assert set(table) == {"client_0", "client_1", "average"}
    # DAT evals report [ensemble, local, shared]
    hist = results["dat"]["histories"][0]
    assert len(hist[-1]["scores"]["client_0"]) == 3
    assert format_study(results).count("|") > 0


def test_albef_client_concepts_and_run_smoke():
    from feddat_tpu.study import HeterogeneousAlbefClient

    c = HeterogeneousAlbefClient(
        task_key="c0", client_idx=0, seed=0, num_train=16, num_eval=8,
        vocab_size=64, question_len=8, answer_len=6, image_size=(32, 32),
        batch_size=4, val_batch_size=4,
    )
    assert c.answer_ids.shape == (K_SHARED + 3, 6)
    b = next(c.train_batches(0))
    assert b["answer_ids"].shape == (4, 1, 6)
    assert b["pixel_values"].dtype == np.float32
    ev = list(c.eval_batches())
    assert sum(int(e["valid"].sum()) for e in ev) == 8

    results = run_study(
        modes=("dat",), seeds=(0,), num_clients=2, comm_rounds=2,
        full_scale=False, lr=5e-3, family="albef",
    )
    hist = results["dat"]["histories"][0]
    assert len(hist[-1]["scores"]["client_0"]) == 3


def test_run_study_smoke_peft_zoo():
    """The PEFT baseline zoo (lora / bias / prompt) runs through the study
    harness end-to-end at tiny shapes — the reference's experiment grid
    covers these modes too (``main.py:132-245``); the TPU-scale rows live in
    ACCURACY.md."""
    results = run_study(
        modes=("lora", "bias", "prompt"), seeds=(0,), num_clients=2,
        comm_rounds=2, full_scale=False, lr=5e-3,
    )
    for mode in ("lora", "bias", "prompt"):
        table = results[mode]["table"]
        assert set(table) == {"client_0", "client_1", "average"}
        hist = results[mode]["histories"][0]
        # non-DAT modes report a single scalar eval score per task
        score = hist[-1]["scores"]["client_0"]
        assert isinstance(score, float)
        assert 0.0 <= score <= 100.0
