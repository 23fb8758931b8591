"""Data layer: tokenizer, normalization, ingestion, pipeline shapes."""

import json
import os
import pickle

import numpy as np
import pytest

from feddat_tpu.data.datasets import (
    VQAExample,
    build_examples_from_json,
    load_examples,
)
from feddat_tpu.data.text import normalize_word, pre_question
from feddat_tpu.data.tokenizer import WordPieceTokenizer


def test_pre_question_reference_behavior():
    # lowercase, punctuation stripped, dash/slash to space, truncation
    assert pre_question("What IS the man's dog-color?", 30) == "what is the mans dog color"
    assert pre_question("a b c d e", 3) == "a b c"


def test_normalize_word_vqa_eval_rules():
    assert normalize_word("The dog.") == "dog"
    assert normalize_word("two") == "2"
    assert normalize_word("dont") == "don't"
    assert normalize_word("a cat, a hat") == "cat hat"


def test_wordpiece_tokenizer_roundtrip():
    tok = WordPieceTokenizer.toy(["what", "is", "the", "dog", "color"])
    ids = tok.encode("What is the dog color", max_length=16)
    assert ids[0] == tok.cls_token_id and ids[-1] == tok.sep_token_id
    assert tok.decode(ids) == "what is the dog color"
    # unknown word decomposes into char pieces, not UNK, if chars present
    pieces = tok.tokenize("dogs")
    assert pieces[0] == "dog" and pieces[1] == "##s"


def test_wordpiece_batch_encode_fixed_shapes():
    tok = WordPieceTokenizer.toy(["what", "is", "this"])
    ids, mask = tok.batch_encode(["what is this", "what"], max_length=8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert mask[0].sum() == 5 and mask[1].sum() == 3  # CLS + toks + SEP


def test_wordpiece_tiny_max_length_and_unk_decode():
    tok = WordPieceTokenizer.toy(["what", "is"])
    # max_length < 2 must not go negative on the special-token budget
    assert tok.encode("what is", max_length=2) == [tok.cls_token_id, tok.sep_token_id]
    assert len(tok.encode("what is", max_length=1)) <= 2  # CLS/SEP only
    ids, mask = tok.batch_encode(["what is"], max_length=2)
    assert ids.shape == (1, 2) and mask[0].sum() == 2
    # decode(skip_special=True) drops [UNK] like HF (UNK is a special token)
    ids = [tok.cls_token_id, tok.vocab["what"], tok.unk_token_id, tok.sep_token_id]
    assert tok.decode(ids) == "what"
    assert "[UNK]" in tok.decode(ids, skip_special=False)


def _write_raw_json(tmpdir, task_key="toronto"):
    questions = [
        {"question_id": 1, "question": "what color", "image": "imgs/pic_7.jpg"},
        {"question_id": 2, "question": "how many", "image": "imgs/pic_8.jpg"},
    ]
    annos = [
        {"question_id": 1, "image": "imgs/pic_7.jpg", "answer": ["red", "red", "blue"]},
        {"question_id": 2, "image": "imgs/pic_8.jpg", "answer": ["2"]},
    ]
    qf = os.path.join(tmpdir, "q.json")
    af = os.path.join(tmpdir, "a.json")
    json.dump(questions, open(qf, "w"))
    json.dump(annos, open(af, "w"))
    return qf, af


def test_build_examples_from_json_scores(tmp_path):
    qf, af = _write_raw_json(str(tmp_path))
    ans2label = {"red": 0, "blue": 1, "2": 2}
    # toronto uses uniform 1/count scores (reference rule)
    ex = build_examples_from_json(qf, af, ans2label, "toronto")
    assert len(ex) == 2
    e1 = ex[0]
    assert e1.image_id == "pic_7"
    assert set(zip(e1.labels, e1.scores)) == {(0, 0.5), (1, 1.0)}
    # other tasks use the VQA occurrence table
    ex2 = build_examples_from_json(qf, af, ans2label, "vizwiz_like")
    assert set(zip(ex2[0].labels, ex2[0].scores)) == {(0, 0.6), (1, 0.3)}


def test_load_examples_cached_pickle(tmp_path):
    data = [
        {
            "question_id": 5,
            "image_id": "x",
            "question": "q?",
            "labels": [3],
            "scores": [1.0],
            "answers": ["yes"],
        }
    ]
    cache_dir = tmp_path / "cached_vqa_data"
    cache_dir.mkdir()
    with open(cache_dir / "vqa_train_fed.pkl", "wb") as f:
        pickle.dump(data, f)
    ex = load_examples("abstract", str(tmp_path), "train", data_root=str(tmp_path))
    assert len(ex) == 1 and ex[0].labels == [3]


def test_local_build_never_masquerades_as_fed_cache(tmp_path):
    """A local raw-JSON build caches under the non-``_fed`` base name; an
    externally-provided ``_fed`` subsample pickle always wins (regression:
    the full build was dumped to the fed filename, so later runs silently
    trained on the full dataset believing it was the subsample)."""
    combined = [
        {"question_id": 1, "question": "what color", "image": "imgs/pic_7.jpg",
         "answer": ["red", "red", "blue"]},
        {"question_id": 2, "question": "how many", "image": "imgs/pic_8.jpg",
         "answer": ["2"]},
    ]
    with open(os.path.join(str(tmp_path), "toronto_train.json"), "w") as f:
        json.dump(combined, f)
    a2l_dir = tmp_path / "toronto"
    a2l_dir.mkdir()
    with open(a2l_dir / "ans2label.pkl", "wb") as f:
        pickle.dump({"red": 0, "blue": 1, "2": 2}, f)
    ex = load_examples("toronto", str(tmp_path), "train", data_root=str(tmp_path))
    assert len(ex) == 2
    cache_dir = os.path.join(str(tmp_path), "cached_vqa_data")
    assert os.path.isfile(os.path.join(cache_dir, "vqa_train.pkl"))
    assert not os.path.isfile(os.path.join(cache_dir, "vqa_train_fed.pkl"))
    # second run loads the built cache
    ex2 = load_examples("toronto", str(tmp_path), "train", data_root=str(tmp_path))
    assert len(ex2) == 2
    # an external fed subsample takes priority over the built cache
    with open(os.path.join(cache_dir, "vqa_train_fed.pkl"), "wb") as f:
        pickle.dump([{"question_id": 9, "image_id": "z", "question": "q",
                      "labels": [0], "scores": [1.0], "answers": ["a"]}], f)
    ex3 = load_examples("toronto", str(tmp_path), "train", data_root=str(tmp_path))
    assert len(ex3) == 1 and ex3[0].question_id == 9


def test_vizwiz_build_keeps_filename_image_ids(tmp_path):
    """VizwizBackend treats image_id as the literal filename, so the
    raw-JSON build must not strip the extension for vizwiz tasks."""
    qf, af = _write_raw_json(str(tmp_path))
    ex = build_examples_from_json(qf, af, {"red": 0, "blue": 1, "2": 2}, "vizwiz")
    assert ex[0].image_id == "pic_7.jpg"


def test_low_shot_draw_matches_reference_algorithm():
    """convert_to_low_shot must be draw-exact with the reference's
    ``random.Random(1).sample`` (``vqa_dataset.py:172-183``) so the same
    5% subset is selected."""
    import random as _random

    from feddat_tpu.data.datasets import convert_to_low_shot

    items = list(range(200))
    ours = convert_to_low_shot(items, 0.05, seed=1)
    ref = _random.Random(1).sample(items, int(0.05 * 200))
    assert ours == ref


def test_vilt_pipeline_shapes(tmp_path):
    from PIL import Image

    from feddat_tpu.data.images import VizwizBackend
    from feddat_tpu.data.pipeline import ViltVQAPipeline

    root = tmp_path / "imgs"
    root.mkdir()
    for i in range(5):
        Image.new("RGB", (100 + i * 30, 80), (i * 20, 0, 0)).save(root / f"im{i}.jpg")

    examples = [
        VQAExample(i, f"im{i}.jpg", f"question {i}", [i % 3], [1.0], ["a"])
        for i in range(5)
    ]
    tok = WordPieceTokenizer.toy(["question", "0", "1", "2", "3", "4"])
    pipe = ViltVQAPipeline(
        examples,
        VizwizBackend(str(root)),
        tok,
        num_labels=4,
        max_text_len=8,
        canvas=(64, 96),
        batch_size=2,
        num_workers=2,
    )
    batches = list(pipe.train_batches(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["pixel_values"].shape == (2, 64, 96, 3)
    assert b["pixel_mask"].shape == (2, 64, 96)
    assert b["input_ids"].shape == (2, 8)
    assert b["target_scores"].shape == (2, 4)
    evals = list(pipe.eval_batches())
    assert len(evals) == 3
    assert evals[-1]["valid"].sum() == 1  # 5 examples, last batch has 1 valid


def test_load_vqav2_examples(tmp_path):
    import pickle

    from feddat_tpu.data.datasets import convert_to_low_shot, load_vqav2_examples

    with open(tmp_path / "ans2label.pkl", "wb") as f:
        pickle.dump({"red": 0, "blue": 1}, f)
    questions = {"questions": [
        {"question_id": 1, "image_id": 42, "question": "what color?"},
    ]}
    annos = {"annotations": [
        {"question_id": 1, "image_id": 42, "multiple_choice_answer": "red",
         "answers": [{"answer": "red"}] * 4 + [{"answer": "blue"}] * 2},
    ]}
    json.dump(questions, open(tmp_path / "v2_OpenEnded_mscoco_train2014_questions.json", "w"))
    json.dump(annos, open(tmp_path / "v2_mscoco_train2014_annotations.json", "w"))
    ex = load_vqav2_examples(str(tmp_path), "train")
    assert len(ex) == 1 and ex[0].image_id == 42
    # 4 occurrences -> 1.0, 2 -> 0.6 (VQA table)
    assert set(zip(ex[0].labels, ex[0].scores)) == {(0, 1.0), (1, 0.6)}
    # cached reload path
    ex2 = load_vqav2_examples(str(tmp_path), "train")
    assert ex2[0].labels == ex[0].labels
    # low-shot
    many = ex * 100
    assert len(convert_to_low_shot(many, 0.05)) == 5


def test_create_vqa_labels(tmp_path):
    """The offline ans2label builder (reference vqa_utils.py:34-48): count
    normalized answers over BOTH annotation files, keep >= threshold,
    first-occurrence label order, pickle consumable by load_ans2label."""
    import pickle
    import subprocess
    import sys

    from feddat_tpu.data.make_labels import VQAV2_ANNOTATION_FILES, create_vqa_labels

    def annos(answers):
        return {"annotations": [{"question_id": i, "multiple_choice_answer": a}
                                for i, a in enumerate(answers)]}

    # "Two" normalizes to "2"; "a red" drops the article -> merges with "red".
    train = ["red"] * 5 + ["Two"] * 9 + ["rare"] + ["a red"] * 3
    val = ["red"] * 1 + ["Two"] * 2
    json.dump(annos(train), open(tmp_path / VQAV2_ANNOTATION_FILES[0], "w"))
    json.dump(annos(val), open(tmp_path / VQAV2_ANNOTATION_FILES[1], "w"))

    a2l = create_vqa_labels([str(tmp_path / n) for n in VQAV2_ANNOTATION_FILES])
    # red: 5+3+1 = 9 kept; 2: 9+2 = 11 kept; rare: 1 dropped.
    assert a2l == {"red": 0, "2": 1}  # first-occurrence order

    # CLI entry writes a pickle that the dataset layer's loader can read.
    rc = subprocess.run(
        [sys.executable, "-m", "feddat_tpu.data.make_labels", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    with open(tmp_path / "ans2label.pkl", "rb") as f:
        assert pickle.load(f) == a2l

    # threshold override
    assert create_vqa_labels(
        [str(tmp_path / VQAV2_ANNOTATION_FILES[0])], min_occurrences=1
    ) == {"red": 0, "2": 1, "rare": 2}


def test_prefetch_to_device_propagates_producer_errors():
    """A failure inside the staging thread (bad sharding, device error) must
    surface in the consumer — not masquerade as a cleanly-exhausted epoch
    (which would silently train zero steps)."""
    from feddat_tpu.data.pipeline import prefetch_to_device

    def bad_iter():
        yield {"x": np.zeros((4, 2), np.float32)}
        raise RuntimeError("boom in producer")

    it = prefetch_to_device(bad_iter(), size=2)
    first = next(it)
    assert first["x"].shape == (4, 2)
    with pytest.raises(RuntimeError, match="boom in producer"):
        next(it)


def test_prefetch_to_device_abandonment_stops_producer():
    """Dropping the generator early (``--debug N`` truncation) must release
    the staging thread instead of leaving it blocked in ``q.put`` pinning
    device-resident batches for the life of the process."""
    import threading
    import time

    from feddat_tpu.data.pipeline import prefetch_to_device

    produced = []

    def slow_iter():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2,), i, np.float32)}

    before = threading.active_count()
    it = prefetch_to_device(slow_iter(), size=2)
    assert next(it)["x"][0] == 0
    it.close()  # consumer abandons mid-epoch
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "staging thread leaked"
    assert len(produced) < 100  # producer stopped early, not drained


def test_directory_scan_backend_resolves_annotation_stems(tmp_path):
    """Annotation-side image ids arrive as full filename stems on the
    raw-JSON build path; the backend must resolve them with the same
    per-task parse rule it applies to scanned filenames (regression: every
    abstract/toronto/art lookup fell to the black-image fallback)."""
    from PIL import Image

    from feddat_tpu.data.images import DirectoryScanBackend

    d = tmp_path / "train2015"
    d.mkdir()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(
        d / "abstract_v002_train2015_000000000020.png"
    )
    b = DirectoryScanBackend([str(d)], "abstract")
    # int id (cached-pickle path) and full stem (raw-JSON path) both resolve
    assert b.path_for(20).endswith("000000000020.png")
    assert b.path_for("abstract_v002_train2015_000000000020").endswith(".png")
    img = b.load("abstract_v002_train2015_000000000020")
    assert np.asarray(img)[0, 0, 0] == 255  # the real image, not black

    art = tmp_path / "art"
    art.mkdir()
    Image.new("RGB", (8, 8), (0, 255, 0)).save(art / "123-some_painting.jpg")
    ba = DirectoryScanBackend([str(art)], "art")
    assert ba.path_for("123-some_painting").endswith("123-some_painting.jpg")
    assert ba.path_for(123) == ba.path_for("123-some_painting")
