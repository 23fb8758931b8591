"""CLI end-to-end: fake dataset on disk -> `python -m feddat_tpu.cli`
(in-process) -> history JSON written."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

from feddat_tpu.configs.tasks import TASK_CONFIGS, TaskSpec, register_task


@pytest.fixture
def fake_task(tmp_path):
    data_root = tmp_path / "data"
    task_dir = data_root / "testtask"
    (task_dir / "cached_vqa_data").mkdir(parents=True)
    img_dir = data_root / "vizwiz" / "images"
    img_dir.mkdir(parents=True)

    rng = np.random.RandomState(0)
    examples = []
    for i in range(8):
        name = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)).save(img_dir / name)
        examples.append(
            {
                "question_id": i,
                "image_id": name,
                "question": f"what is the thing {i}",
                "labels": [i % 4],
                "scores": [1.0],
                "answers": ["a"],
            }
        )
    with open(task_dir / "cached_vqa_data" / "vqa_train_small_fed.pkl", "wb") as f:
        pickle.dump(examples, f)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "what", "is", "the", "thing"] + [
        str(i) for i in range(10)
    ]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))

    key = "testtask"
    if key not in TASK_CONFIGS:
        register_task(
            TaskSpec(
                task_key=key,
                task_name=key,
                data_dir=str(task_dir),
                images_source="vizwiz",
                splits=("train_small", "val"),
                num_labels=100,
            )
        )
    else:
        TASK_CONFIGS[key] = TaskSpec(
            task_key=key, task_name=key, data_dir=str(task_dir),
            images_source="vizwiz", splits=("train_small", "val"), num_labels=100,
        )
    return data_root, vocab_file, tmp_path


def test_cli_smoke_end_to_end(fake_task):
    data_root, vocab_file, tmp_path = fake_task
    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "testtask",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
            "--use_fused_dat",
        ]
    )
    assert rc == 0
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    assert histories, os.listdir(out_dir)
    history = json.load(open(out_dir / histories[0]))
    assert history and "testtask" in history[-1]["scores"]
    assert len(history[-1]["scores"]["testtask"]) == 3  # DAT 3-mode eval


@pytest.mark.parametrize("attn_impl", ["auto", "block", "layer"])
def test_cli_spmd_engine_smoke(fake_task, attn_impl):
    """--engine spmd from the CLI (the flagship TPU path): model built with
    the shared task_fed head, 2 clients over a (2, 2) mesh slice of the 8
    virtual CPU devices.  Parametrized over the attention impl so the Pallas
    attention-block AND whole-layer kernels (interpret mode on CPU) are
    exercised through the full engine."""
    data_root, vocab_file, tmp_path = fake_task
    # second client reusing the same on-disk data
    key2 = "testtask2"
    spec = TASK_CONFIGS["testtask"]
    TASK_CONFIGS[key2] = TaskSpec(
        task_key=key2, task_name=key2, data_dir=spec.data_dir,
        images_source="vizwiz", splits=("train_small", "val"), num_labels=100,
    )
    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs_spmd"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", "dat",
            "--engine", "spmd",
            "--mesh_data", "2",
            "--ordered_cl_tasks", "testtask,testtask2",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--attn_impl", attn_impl,
            "--smoke",
        ]
    )
    assert rc == 0
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    history = json.load(open(out_dir / histories[0]))
    assert history and set(history[-1]["scores"]) == {"testtask", "testtask2"}
    assert len(history[-1]["scores"]["testtask"]) == 3  # DAT 3-mode eval


@pytest.fixture
def fake_nlvr2(tmp_path):
    """On-disk NLVR2 fixture: jsonl annotations + image pairs."""
    data_root = tmp_path / "data"
    task_dir = data_root / "nlvr2"
    (task_dir / "data").mkdir(parents=True)
    img_dir = task_dir / "images" / "train"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        base = f"train-{i}-0"
        for j in (0, 1):
            Image.fromarray(rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)).save(
                img_dir / f"{base}-img{j}.png"
            )
        lines.append(
            json.dumps(
                {
                    "identifier": base + "-x",
                    "sentence": f"the images {i} match",
                    "label": "True" if i % 2 else "False",
                }
            )
        )
    (task_dir / "data" / "train.json").write_text("\n".join(lines))
    # val split: reuse the same images via dev annotations
    dev_img = task_dir / "images" / "dev"
    dev_img.mkdir(parents=True)
    for i in range(4):
        base = f"dev-{i}-0"
        for j in (0, 1):
            Image.fromarray(rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)).save(
                dev_img / f"{base}-img{j}.png"
            )
    dev_lines = [
        json.dumps(
            {
                "identifier": f"dev-{i}-0-x",
                "sentence": f"the images {i} differ",
                "label": "False" if i % 2 else "True",
            }
        )
        for i in range(4)
    ]
    (task_dir / "data" / "dev.json").write_text("\n".join(dev_lines))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "images", "match",
             "differ"] + [str(i) for i in range(10)]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    return data_root, vocab_file, tmp_path


def test_cli_nlvr2_smoke_end_to_end(fake_nlvr2):
    """The non-VQA task families are reachable from the CLI
    (reference ``main.py:482-483`` dynamic trainer dispatch)."""
    data_root, vocab_file, tmp_path = fake_nlvr2
    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs_nlvr2"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", "adapter",
            "--ordered_cl_tasks", "nlvr2",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--do_single",
            "--smoke",
        ]
    )
    assert rc == 0
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    history = json.load(open(out_dir / histories[0]))
    assert history and "nlvr2" in history[-1]["scores"]


def _write_vocab(tmp_path, extra=()):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "a", "is",
             "what", "man", "dog", "gray", "person"] + list(extra) + [
        str(i) for i in range(10)
    ]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(dict.fromkeys(vocab)))
    return vocab_file


def _run_single_task_cli(task_key, data_root, vocab_file, out_dir, mode="adapter",
                         batch_size=4):
    from feddat_tpu.cli import main

    return main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", mode,
            "--ordered_cl_tasks", task_key,
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", str(batch_size),
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--do_single",
            "--smoke",
        ]
    )


def _assert_history(out_dir, task_key):
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    history = json.load(open(out_dir / histories[0]))
    assert history and task_key in history[-1]["scores"]


def test_cli_snli_ve_smoke_end_to_end(tmp_path):
    data_root = tmp_path / "data"
    task_dir = data_root / "snli-ve"
    task_dir.mkdir(parents=True)
    img_dir = data_root / "flickr30k" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    cats = ["entailment", "contradiction", "neutral"]
    for split, n in (("train", 9), ("dev", 3)):
        lines = []
        for i in range(n):
            Image.fromarray(rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)).save(
                img_dir / f"{1000 + i}.jpg"
            )
            lines.append(
                json.dumps(
                    {
                        "Flickr30K_ID": str(1000 + i),
                        "sentence2": f"a man is {i}",
                        "gold_label": cats[i % 3],
                    }
                )
            )
        (task_dir / f"snli_ve_{split}.jsonl").write_text("\n".join(lines))
    vocab_file = _write_vocab(tmp_path)
    out_dir = tmp_path / "logs"
    assert _run_single_task_cli("snli-ve", data_root, vocab_file, out_dir) == 0
    _assert_history(out_dir, "snli-ve")


def test_cli_vcr_smoke_end_to_end(tmp_path):
    data_root = tmp_path / "data"
    task_dir = data_root / "vcr"
    (task_dir / "annotation").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        img_dir = task_dir / "drawn_images" / split / "qa"
        img_dir.mkdir(parents=True)
        lines = []
        # 5% low-shot (reference train_vcr.py:94-95) must leave >= 1 example
        for i in range(20 if split == "val" else 40):
            annot_id = f"{split}-{i}"
            Image.fromarray(rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)).save(
                img_dir / f"{annot_id}.jpg"
            )
            lines.append(
                json.dumps(
                    {
                        "annot_id": annot_id,
                        "objects": ["person", "dog"],
                        "question": ["what", "is", [0], "doing"],
                        "answer_choices": [["the", "dog", [1]], ["a"], ["is"], ["what"]],
                        "answer_label": i % 4,
                        "rationale_choices": [["a"], ["is"], ["the"], ["dog"]],
                        "rationale_label": 0,
                    }
                )
            )
        (task_dir / "annotation" / f"{split}.jsonl").write_text("\n".join(lines))
    vocab_file = _write_vocab(tmp_path, extra=["doing", "casey", "riley"])
    out_dir = tmp_path / "logs"
    assert _run_single_task_cli("vcr", data_root, vocab_file, out_dir, batch_size=1) == 0
    _assert_history(out_dir, "vcr")


def test_cli_vqav2_smoke_end_to_end(tmp_path):
    data_root = tmp_path / "data"
    task_dir = data_root / "vqav2"
    task_dir.mkdir(parents=True)
    coco = data_root / "mscoco"
    rng = np.random.RandomState(0)
    ans2label = {"yes": 0, "no": 1, "red": 2}
    with open(task_dir / "ans2label.pkl", "wb") as f:
        pickle.dump(ans2label, f)
    # 5% low-shot (reference train_vqa.py:70-71) must leave >= 1 example
    for split, n in (("train", 40), ("val", 20)):
        d = coco / f"{split}2014"
        d.mkdir(parents=True)
        questions, annotations = [], []
        for i in range(n):
            img_id = i + (0 if split == "train" else 100)
            Image.fromarray(rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)).save(
                d / f"COCO_{split}2014_{img_id:012d}.jpg"
            )
            questions.append(
                {"question_id": img_id, "question": f"is the {i} red"}
            )
            annotations.append(
                {
                    "question_id": img_id,
                    "image_id": img_id,
                    "answers": [{"answer": "yes"}] * 7 + [{"answer": "no"}] * 3,
                }
            )
        with open(task_dir / f"v2_OpenEnded_mscoco_{split}2014_questions.json", "w") as f:
            json.dump({"questions": questions}, f)
        with open(task_dir / f"v2_mscoco_{split}2014_annotations.json", "w") as f:
            json.dump({"annotations": annotations}, f)
    vocab_file = _write_vocab(tmp_path, extra=["red", "yes", "no"])
    out_dir = tmp_path / "logs"
    assert _run_single_task_cli("vqa", data_root, vocab_file, out_dir, batch_size=1) == 0
    _assert_history(out_dir, "vqa")


@pytest.mark.parametrize("mode", ["lora", "prompt", "bias"])
def test_cli_peft_mode_smoke(fake_task, mode):
    """Baseline PEFT modes are launchable end-to-end (the reference's
    --optimizer_mode routing, main.py:132-245); smoke configs must actually
    materialize the mode's parameters (LoRA/prompt)."""
    data_root, vocab_file, tmp_path = fake_task
    from feddat_tpu.cli import main

    out_dir = tmp_path / f"logs_{mode}"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", mode,
            "--ordered_cl_tasks", "testtask",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
        ]
    )
    assert rc == 0
    _assert_history(out_dir, "testtask")


def test_cli_viltbert_smoke(fake_task):
    """viltbert end-to-end incl. the frozen-BERT weight load
    (--bert_model_path, reference viltbert.py:115-120)."""
    data_root, vocab_file, tmp_path = fake_task
    import torch
    from transformers import BertConfig, BertModel

    # tiny HF BertModel matching the smoke config dims (hidden 32, 2 layers)
    # vocab/positions must match the smoke ViltModelConfig's text_bert dims
    hf_cfg = BertConfig(
        vocab_size=30522, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=512,
    )
    bert_path = tmp_path / "bert.bin"
    torch.save(BertModel(hf_cfg, add_pooling_layer=False).state_dict(), bert_path)

    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs_viltbert"
    rc = main(
        [
            "--encoder_name", "viltbert",
            "--bert_model_path", str(bert_path),
            "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "testtask",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
            "--use_fused_dat",
        ]
    )
    assert rc == 0
    _assert_history(out_dir, "testtask")


def test_cli_nlvr2_spmd_smoke(fake_nlvr2):
    """Classification family through --engine spmd: CE forward + accuracy
    eval inside the shard_map (the VQA BCE default would KeyError on these
    batches — regression guard for the loss-routing fix)."""
    data_root, vocab_file, tmp_path = fake_nlvr2
    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs_nlvr2_spmd"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", "dat",
            "--engine", "spmd",
            "--mesh_clients", "1",
            "--mesh_data", "1",
            "--ordered_cl_tasks", "nlvr2",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
        ]
    )
    assert rc == 0
    _assert_history(out_dir, "nlvr2")


def test_cli_albef_spmd_smoke_end_to_end(fake_task):
    """ALBEF family through --engine spmd: LM-loss DAT core + rank-answer
    eval with the stacked per-client answer banks."""
    data_root, vocab_file, tmp_path = fake_task
    task_dir = data_root / "testtask"
    with open(task_dir / "ans2label.pkl", "wb") as f:
        pickle.dump({c: i for i, c in enumerate("abcdefgh")}, f)
    key2 = "testtask_b"
    spec = TASK_CONFIGS["testtask"]
    TASK_CONFIGS[key2] = TaskSpec(
        task_key=key2, task_name=key2, data_dir=spec.data_dir,
        images_source="vizwiz", splits=("train_small", "val"), num_labels=100,
    )
    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs_albef_spmd"
    rc = main(
        [
            "--encoder_name", "albef_no_distill",
            "--optimizer_mode", "dat",
            "--engine", "spmd",
            "--mesh_data", "2",
            "--ordered_cl_tasks", "testtask,testtask_b",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
        ]
    )
    assert rc == 0
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    history = json.load(open(out_dir / histories[0]))
    assert set(history[-1]["scores"]) == {"testtask", "testtask_b"}
    assert len(history[-1]["scores"]["testtask"]) == 3


def test_cli_albef_smoke_end_to_end(fake_task):
    data_root, vocab_file, tmp_path = fake_task
    # the ALBEF path additionally needs the task's ans2label pickle
    task_dir = data_root / "testtask"
    with open(task_dir / "ans2label.pkl", "wb") as f:
        pickle.dump({c: i for i, c in enumerate("abcdefgh")}, f)

    from feddat_tpu.cli import main

    out_dir = tmp_path / "logs_albef"
    rc = main(
        [
            "--encoder_name", "albef_no_distill",
            "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "testtask",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
        ]
    )
    assert rc == 0
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    history = json.load(open(out_dir / histories[0]))
    assert history and "testtask" in history[-1]["scores"]


def test_cli_rejects_block_kernel_for_backbone_training_modes():
    """--attn_impl block has a frozen-projection backward; modes that train
    the projections must be rejected up front (silent zero grads otherwise)."""
    import pytest

    from feddat_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main([
            "--encoder_name", "vilt", "--optimizer_mode", "full",
            "--attn_impl", "block", "--ordered_cl_tasks", "clove_scene_a",
            "--do_train", "--smoke",
        ])
    assert "assumes a frozen backbone" in str(e.value)


def test_create_model_rejects_block_kernel_for_backbone_training_modes():
    """The guard must live in the library, not only the CLI: a programmatic
    caller building a FULL/BIAS/FREEZE_BOTTOM_K/LORA model with
    attn_impl='block' would silently train with zero projection grads."""
    import pytest

    from feddat_tpu.configs.core import PEFTMode
    from feddat_tpu.models import create_model
    from feddat_tpu.models.vilt import TaskHeadSpec

    heads = {"t": TaskHeadSpec(num_labels=4)}
    for mode in (PEFTMode.FULL, PEFTMode.BIAS, PEFTMode.LORA,
                 PEFTMode.FREEZE_BOTTOM_K):
        with pytest.raises(ValueError, match="frozen attention projections"):
            create_model("vilt", heads, mode, attn_impl="block")
    # frozen-backbone modes still build
    model, _ = create_model("vilt", heads, PEFTMode.DAT, attn_impl="block")
    assert model is not None


def test_cli_cache_and_device_normalize_smoke(fake_task):
    """--cache_images + --device_normalize through the full CLI path (u8
    pixels + compact dims masks into the jitted step)."""
    from feddat_tpu.cli import main

    data_root, vocab_file, tmp_path = fake_task
    out_dir = tmp_path / "logs_u8"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "testtask",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(out_dir),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
            "--cache_images",
            "--device_normalize",
        ]
    )
    assert rc == 0
    histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
    history = json.load(open(out_dir / histories[0]))
    assert history and "testtask" in history[-1]["scores"]


def test_cli_writes_serving_meta_with_checkpoints(fake_task):
    """--checkpoint_dir runs record the serving recipe (meta.json) next to
    the round checkpoints; smoke recipes are refused by from_checkpoint."""
    import pytest as _pytest

    from feddat_tpu.cli import main
    from feddat_tpu.serving import _load_checkpoint_recipe
    from feddat_tpu.utils.checkpointing import load_meta

    data_root, vocab_file, tmp_path = fake_task
    ckpt = tmp_path / "ckpt_meta"
    rc = main(
        [
            "--encoder_name", "vilt",
            "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "testtask",
            "--climb_data_dir", str(data_root),
            "--vocab_file", str(vocab_file),
            "--output_dir", str(tmp_path / "logs_meta"),
            "--checkpoint_dir", str(ckpt),
            "--batch_size", "4",
            "--comm_rounds", "1",
            "--local_epochs", "1",
            "--eval_every", "1",
            "--num_epochs", "1",
            "--dtype", "float32",
            "--smoke",
        ]
    )
    assert rc == 0
    meta = load_meta(str(ckpt))
    assert meta is not None
    assert meta["tasks"] == ["testtask"]
    assert meta["engine"] == "sequential"
    assert meta["heads"]["testtask"]["num_labels"] == 100
    assert meta["smoke"] is True
    with _pytest.raises(ValueError, match="smoke"):
        _load_checkpoint_recipe(str(ckpt), "testtask")


def test_cli_eval_beats_chance_on_learnable_fixture(tmp_path):
    """Guard the EVAL protocol, not just its plumbing: on a fixture whose
    val split reuses the train split's input->label mapping (unseen images/
    question ids), a trained run's 3-mode DAT eval must clear 4-label chance
    (25) by a wide margin.  A regression that scored garbage through the
    eval path would land at chance and fail here (the reference protocol
    this guards: ``main.py:520-558``).  Shares the driver dryrun's fixture
    (``__graft_entry__._write_cli_fixture``) and its measured expectation
    ([ensemble, local, shared] ~= [75, 62.5, 75] at this config)."""
    import __graft_entry__ as ge

    from feddat_tpu.cli import main

    data_root, vocab_file, keys = ge._write_cli_fixture(str(tmp_path), 1)
    try:
        out_dir = tmp_path / "logs"
        rc = main(
            [
                "--encoder_name", "vilt",
                "--optimizer_mode", "dat",
                "--ordered_cl_tasks", ",".join(keys),
                "--climb_data_dir", data_root,
                "--vocab_file", vocab_file,
                "--output_dir", str(out_dir),
                "--batch_size", "4",
                "--lr", "5e-2",
                "--comm_rounds", "96",
                "--local_epochs", "1",
                "--eval_every", "96",
                "--num_epochs", "96",
                "--dtype", "float32",
                "--smoke",
                "--use_fused_dat",
            ]
        )
        assert rc == 0
        histories = [p for p in os.listdir(out_dir) if p.endswith(".history.json")]
        history = json.load(open(out_dir / histories[0]))
        scores = history[-1]["scores"][keys[0]]
        assert scores[0] >= 60.0 and min(scores) >= 40.0, (
            f"eval at/near chance on a learnable fixture: {scores} (chance=25)"
        )
    finally:
        for k in keys:
            TASK_CONFIGS.pop(k, None)
