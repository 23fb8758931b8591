"""Serving surface: fixed-shape jitted predictors for both families."""

import jax
import numpy as np
import pytest
from PIL import Image

from feddat_tpu.data.tokenizer import WordPieceTokenizer
from feddat_tpu.serving import AlbefVqaPredictor, ViltVqaPredictor

from conftest import TINY_VILT


def _images(n, rng, hw=(40, 56)):
    return [
        Image.fromarray(rng.randint(0, 255, (*hw, 3), dtype=np.uint8)) for _ in range(n)
    ]


def test_vilt_predictor_structure_and_padding_invariance():
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    rng = np.random.RandomState(0)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "color"])
    label2ans = [f"ans{i}" for i in range(16)]
    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    imgs = _images(5, rng)
    questions = [f"what is the color {i}" for i in range(5)]

    def make(batch_size):
        p = ViltVqaPredictor(
            model, None, "t", tok, label2ans, batch_size=batch_size,
            canvas=TINY_VILT.image_size, max_text_len=TINY_VILT.max_text_len,
        )
        batch = p._preprocess(imgs[:2], questions[:2])
        params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
        p._params = params
        return p

    pred8 = make(8).predict(imgs, questions, top_k=3)
    assert len(pred8) == 5 and all(len(r) == 3 for r in pred8)
    for row in pred8:
        probs = [p for _, p in row]
        assert probs == sorted(probs, reverse=True)
        assert all(a in label2ans for a, _ in row)
    # chunked (2 batches of 4, zero-padded) must equal the one-batch result
    pred4 = make(4).predict(imgs, questions, top_k=3)
    for r8, r4 in zip(pred8, pred4):
        assert [a for a, _ in r8] == [a for a, _ in r4]
        np.testing.assert_allclose(
            [p for _, p in r8], [p for _, p in r4], rtol=1e-5, atol=1e-6
        )


def test_albef_predictor_structure():
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from test_albef import TINY_ALBEF

    rng = np.random.RandomState(1)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "a", "red", "blue"])
    answers = ["red", "blue", "a red", "the blue", "a", "the"]
    model = AlbefModel(TINY_ALBEF)
    imgs = _images(3, rng)
    questions = ["what is the a", "what is red", "is the blue a"]

    p = AlbefVqaPredictor(
        model, None, tok, answers, batch_size=4, k=4,
        max_question_len=6, max_answer_len=4,
    )
    batch = p._preprocess(imgs, questions)
    batch["answer_ids"] = np.zeros((3, 2, 4), np.int32)
    batch["answer_mask"] = np.zeros((3, 2, 4), np.int32)
    batch["answer_weights"] = np.zeros((3, 2), np.float32)
    p._params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    out = p.predict(imgs, questions, top_k=2)
    assert len(out) == 3 and all(len(r) == 2 for r in out)
    for row in out:
        assert all(a in answers for a, _ in row)
        assert all(np.isfinite(pr) for _, pr in row)
    # deterministic
    out2 = p.predict(imgs, questions, top_k=2)
    assert out == out2


def test_from_checkpoint_sequential_roundtrip(tmp_path):
    """Train -> checkpoint -> serve: the predictor loads the latest round's
    personalized params (server + personal partition merged, both engine
    layouts) and the run recipe picks head key + adapter mode."""
    import dataclasses

    from flax import traverse_util

    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.utils.checkpointing import write_meta

    rng = np.random.RandomState(0)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "color"])
    from conftest import tiny_batch

    batch = tiny_batch(rng, 2)

    class OneBatchData:
        steps_per_epoch = 1
        num_train_examples = 2
        num_eval_examples = 2
        batch_size = 2

        def train_batches(self, epoch=0):
            yield dict(batch)

        def eval_batches(self):
            b = dict(batch)
            b["valid"] = np.ones(2, np.float32)
            yield b

    head = TaskHeadSpec(num_labels=16)
    model = ViltContinualLearner(TINY_VILT, {"t": head})
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        encoder_name="vilt", peft_mode=PEFTMode.DAT, tasks=("t",),
        batch_size=2, optimizer=OptimizerConfig(lr=1e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1, dtype="float32",
    )
    ckpt = tmp_path / "ckpt"
    tr = FederatedTrainer(model, params, {"t": OneBatchData()}, cfg,
                          checkpoint_dir=str(ckpt))
    tr.run(resume=False)
    write_meta(str(ckpt), {
        "encoder_name": "vilt", "optimizer_mode": "dat",
        "adapter_reduction_factor": 4, "dtype": "float32",
        "engine": "sequential", "tasks": ["t"], "smoke": False,
        "image_size": list(TINY_VILT.image_size),
        "attention_logits_dtype": "float32",
        "heads": {"t": dataclasses.asdict(head)},
    })
    pred = ViltVqaPredictor.from_checkpoint(
        str(ckpt), tok, [f"a{i}" for i in range(16)], model=model,
        batch_size=4, canvas=TINY_VILT.image_size,
        max_text_len=TINY_VILT.max_text_len,
    )
    assert pred.adapter_mode == "ensemble"  # DAT eval default
    # the served params are exactly the engine's personalized client tree
    expect = tr._client_params(tr.clients[0], refresh=False)
    got = traverse_util.flatten_dict(pred._params)
    want = traverse_util.flatten_dict(expect)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=0, atol=0, err_msg=str(k))
    imgs = _images(2, rng, hw=TINY_VILT.image_size)
    out = pred.predict(imgs, ["what is the color", "what is the color"], top_k=2)
    assert len(out) == 2 and all(len(r) == 2 for r in out)


def test_from_checkpoint_spmd_layout_row_selection(tmp_path):
    """The SPMD stacked-client-bank layout: from_checkpoint slices the
    requested client's row and merges it over the backbone."""
    import jax.numpy as jnp

    from feddat_tpu.serving import _load_checkpoint_recipe
    from feddat_tpu.utils.checkpointing import save_federated_state, write_meta

    backbone = {"enc": {"w": np.ones((2, 2), np.float32)}}
    stacked = {"task_fed": {"k": np.stack([np.full((3,), i, np.float32) for i in range(2)])}}
    save_federated_state(str(tmp_path), 0, backbone,
                         {"stacked_clients": stacked}, jnp.zeros((2,), jnp.uint32))
    write_meta(str(tmp_path), {
        "encoder_name": "vilt", "optimizer_mode": "adapter",
        "adapter_reduction_factor": 16, "dtype": "bfloat16",
        "engine": "spmd", "tasks": ["a", "b"], "smoke": False,
        "image_size": [384, 640], "attention_logits_dtype": "bfloat16",
        "heads": {"a": {"num_labels": 100}, "b": {"num_labels": 100}},
    })
    meta, task_key, params, mode = _load_checkpoint_recipe(str(tmp_path), "b")
    assert mode == "adapter"
    np.testing.assert_array_equal(np.asarray(params["task_fed"]["k"]),
                                  np.full((3,), 1.0, np.float32))
    np.testing.assert_array_equal(np.asarray(params["enc"]["w"]), np.ones((2, 2)))
    with pytest.raises(KeyError):
        _load_checkpoint_recipe(str(tmp_path), "zzz")


def test_albef_from_checkpoint_uses_recipe_answer_list(tmp_path):
    """ALBEF from_checkpoint: rebuilds the predictor from a saved round +
    recipe, defaulting the answer bank to the trained one in meta.json."""
    import jax.numpy as jnp

    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.utils.checkpointing import save_federated_state, write_meta
    from test_albef import TINY_ALBEF

    rng = np.random.RandomState(2)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "a", "red", "blue"])
    answers = ["red", "blue", "a red", "the blue"]
    model = AlbefModel(TINY_ALBEF)
    imgs = _images(2, rng)
    questions = ["what is the a", "what is red"]
    probe = AlbefVqaPredictor(model, None, tok, answers, batch_size=2, k=3,
                              max_question_len=6, max_answer_len=4)
    batch = probe._preprocess(imgs, questions)
    batch["answer_ids"] = np.zeros((2, 2, 4), np.int32)
    batch["answer_mask"] = np.zeros((2, 2, 4), np.int32)
    batch["answer_weights"] = np.zeros((2, 2), np.float32)
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    # save in the sequential-engine layout (personal keyed by task)
    from feddat_tpu.peft.partition import label_params, personal_roles, split_by_roles
    from feddat_tpu.configs.core import PEFTMode

    labels = label_params(params)
    personal, rest = split_by_roles(params, labels, personal_roles(PEFTMode.DAT))
    ckpt = tmp_path / "ck"
    save_federated_state(str(ckpt), 0, rest, {"vqa_task": personal},
                         jnp.zeros((2,), jnp.uint32))
    write_meta(str(ckpt), {
        "encoder_name": "albef_no_distill", "optimizer_mode": "dat",
        "adapter_reduction_factor": 4, "dtype": "float32",
        "engine": "sequential", "tasks": ["vqa_task"], "smoke": False,
        "image_size": None, "attention_logits_dtype": "float32",
        "heads": {"vqa_task": {"num_labels": 100}},
        "answer_lists": {"vqa_task": answers},
    })
    pred = AlbefVqaPredictor.from_checkpoint(
        str(ckpt), tok, model=model, batch_size=2, k=3,
        max_question_len=6, max_answer_len=4,
    )
    assert pred.answer_list == answers
    assert pred.adapter_mode == "ensemble"
    out = pred.predict(imgs, questions, top_k=2)
    assert len(out) == 2 and all(a in answers for r in out for a, _ in r)


def test_vilt_predictor_batch_buckets_match_full_padding():
    """batch_buckets: small chunks run at the smallest compiled bucket that
    fits, numerically identical to full-batch padding."""
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.serving import _bucket_for, _normalize_buckets

    assert _normalize_buckets((1, 4), 8) == (1, 4, 8)
    assert _normalize_buckets(None, 8) == (8,)
    assert _bucket_for(1, (1, 4, 8)) == 1
    assert _bucket_for(3, (1, 4, 8)) == 4
    assert _bucket_for(8, (1, 4, 8)) == 8
    with pytest.raises(ValueError):
        _normalize_buckets((0,), 8)

    rng = np.random.RandomState(0)
    tok = WordPieceTokenizer.toy(["what", "is", "the", "color"])
    label2ans = [f"ans{i}" for i in range(16)]
    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    imgs = _images(3, rng)
    questions = [f"what is the color {i}" for i in range(3)]

    def make(**kw):
        p = ViltVqaPredictor(
            model, None, "t", tok, label2ans, batch_size=8,
            canvas=TINY_VILT.image_size, max_text_len=TINY_VILT.max_text_len, **kw,
        )
        batch = p._preprocess(imgs[:2], questions[:2])
        p._params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
        return p

    full = make().predict(imgs, questions, top_k=3)
    bucketed = make(batch_buckets=(1, 4)).predict(imgs, questions, top_k=3)
    for rf, rb in zip(full, bucketed):
        assert [a for a, _ in rf] == [a for a, _ in rb]
        np.testing.assert_allclose(
            [p for _, p in rf], [p for _, p in rb], rtol=1e-5, atol=1e-6
        )
    # single request routes through the B=1 bucket
    one = make(batch_buckets=(1,)).predict(imgs[:1], questions[:1], top_k=2)
    assert [a for a, _ in one[0]] == [a for a, _ in full[0][:2]]
