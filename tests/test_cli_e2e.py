"""CLI end-to-end: fake dataset on disk -> `python -m feddat_tpu.cli`
(in-process) -> history JSON written."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

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
