"""WordPiece parity vs HuggingFace ``BertTokenizer`` (the reference vendors
HF's tokenizer verbatim, ``src/modeling/models/tokenization_bert.py:1-537``;
accuracy parity with reference checkpoints rides on identical tokenization).

transformers is installed in the image; the tokenizer is constructed from a
local vocab file (no network)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")

from feddat_tpu.data.tokenizer import WordPieceTokenizer

# A realistic mini-vocab: specials, whole words, subword pieces, punctuation,
# digits — enough to exercise every wordpiece branch.
VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + list("abcdefghijklmnopqrstuvwxyz")
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    + list("0123456789")
    + ["##" + c for c in "0123456789"]
    + list(",.?!;:'\"-()[]{}/@#$%&*+=<>~`_\\|^")
    + [
        "what", "is", "the", "a", "an", "of", "in", "on", "to", "and", "or",
        "this", "that", "there", "here", "how", "many", "much", "color",
        "colour", "man", "woman", "person", "people", "dog", "cat", "picture",
        "image", "photo", "doing", "wearing", "holding", "standing", "sitting",
        "play", "##ing", "##ed", "##s", "##er", "##est", "##ly", "##tion",
        "##n", "##t", "##re", "un", "##able", "walk", "run", "jump", "eat",
        "drink", "red", "blue", "green", "yellow", "white", "black", "left",
        "right", "table", "chair", "room", "street", "sky", "water", "tree",
        "can", "you", "see", "it", "they", "are", "was", "were", "be", "been",
    ]
)
VOCAB = list(dict.fromkeys(VOCAB))  # dedupe, keep order (ids must be dense)

QUESTIONS = [
    "What is the color of the dog?",
    "How many people are in the picture?",
    "Is the man wearing a red shirt?",
    "what   is    this?",  # repeated whitespace
    "What're they doing??!",  # contraction + repeated punctuation
    "Héllo wörld, café naïve",  # accents (stripped by BERT-uncased)
    "THE DOG IS RUNNING",  # case folding
    "a" * 120,  # > max_input_chars_per_word -> [UNK]
    "un-believable, isn't it?",
    "what is 2+2? 1234567",
    "tab\tseparated\nnewline\rtext",  # whitespace variants
    "  leading and trailing  ",
    "",  # empty string
    "???",
    "the cat sat on the [MASK]",  # special token text (treated literally)
    "emoji \U0001F600 test",  # emoji (unknown char)
    "mixed123words456",  # alnum runs (BERT does NOT split digit/letter)
    "hyphen-ated words work-ing",
    "quote \"quoted\" 'single'",
    "ZERO​WIDTH",  # zero-width space (Cf category -> control: removed)
    "null\x00char",  # \x00 is removed by HF clean_text
    "chinese 中文 characters",  # CJK: HF wraps each char in spaces
    "walk walked walking walks walker",
    "unable unbelievable",
    "what color is the sky ?",
    "xqzjk vvvv unknownword",
]


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    hf = transformers.BertTokenizer(str(p), do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(str(p))
    return hf, ours, str(p)


def test_tokenize_parity(tokenizers):
    hf, ours, _ = tokenizers
    for q in QUESTIONS:
        assert ours.tokenize(q) == hf.tokenize(q), q


def test_ids_parity(tokenizers):
    hf, ours, _ = tokenizers
    for q in QUESTIONS:
        got = ours.convert_tokens_to_ids(ours.tokenize(q))
        want = hf.convert_tokens_to_ids(hf.tokenize(q))
        assert got == want, q


def test_encode_parity_with_specials_and_truncation(tokenizers):
    hf, ours, _ = tokenizers
    for q in QUESTIONS:
        for max_len in (8, 16, 40):
            want = hf.encode(q, max_length=max_len, truncation=True)
            got = ours.encode(q, max_length=max_len)
            assert got == want, (q, max_len)


def test_batch_encode_matches_hf_padding(tokenizers):
    hf, ours, _ = tokenizers
    enc = hf(QUESTIONS, max_length=24, truncation=True, padding="max_length")
    ids, mask = ours.batch_encode(QUESTIONS, max_length=24)
    np.testing.assert_array_equal(ids, np.asarray(enc["input_ids"], np.int32))
    np.testing.assert_array_equal(mask, np.asarray(enc["attention_mask"], np.int32))


def test_fuzz_parity(tokenizers):
    """Random word soup drawn from vocab fragments + noise."""
    hf, ours, _ = tokenizers
    rng = np.random.RandomState(0)
    frags = [v.replace("##", "") for v in VOCAB[5:]] + ["zzz", "qqq", "éclair"]
    for _ in range(300):
        n = rng.randint(1, 12)
        text = " ".join(frags[i] for i in rng.randint(0, len(frags), n))
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_native_tokenizer_full_surface(tokenizers):
    """NativeWordPiece must be a drop-in for the ingestion path
    (``datasets.py`` calls tokenize/convert_tokens_to_ids on cache misses)."""
    _, ours, path = tokenizers
    native = pytest.importorskip("feddat_tpu.native")
    if not native.available():
        pytest.skip("no native toolchain")
    nat = native.NativeWordPiece(ours.vocab)
    for q in QUESTIONS:
        assert nat.tokenize(q) == ours.tokenize(q), q
        assert nat.convert_tokens_to_ids(nat.tokenize(q)) == ours.convert_tokens_to_ids(
            ours.tokenize(q)
        ), q
        assert nat.encode(q, max_length=16) == ours.encode(q, max_length=16), q
    ids_n, mask_n = nat.batch_encode(QUESTIONS, 24)
    ids_p, mask_p = ours.batch_encode(QUESTIONS, 24)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


# ---------------------------------------------------------------------------
# Real-vocab-scale parity: 30,522-entry WordPiece (tests/fixtures/vocab30k.txt,
# built by scripts/make_test_vocab.py — same size/'##'-density class as
# bert-base-uncased, where greedy longest-match interacts with a vastly
# denser piece space than the mini-vocab above).
# ---------------------------------------------------------------------------

import os

VOCAB30K = os.path.join(os.path.dirname(__file__), "fixtures", "vocab30k.txt")


@pytest.fixture(scope="module")
def tokenizers_30k():
    if not os.path.isfile(VOCAB30K):
        pytest.skip("run scripts/make_test_vocab.py to build the 30k vocab")
    hf = transformers.BertTokenizer(VOCAB30K, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(VOCAB30K)
    return hf, ours


def _sentence_pool(vocab, rng, n_sentences):
    """Several thousand mixed sentences: real-ish word soup from the dense
    vocab, raw multi-piece words, CJK, accents, digits, punctuation noise."""
    whole = [v for v in vocab if not v.startswith("##") and v.isalpha() and len(v) > 2]
    subs = [v[2:] for v in vocab if v.startswith("##") and v[2:].isalpha()]
    cjk = [v for v in vocab if any("一" <= ch <= "鿿" for ch in v)]
    punct = list(",.?!;:'\"-()[]/&")
    sentences = []
    for _ in range(n_sentences):
        n = rng.randint(3, 14)
        words = []
        for _ in range(n):
            r = rng.rand()
            if r < 0.55:
                words.append(whole[rng.randint(len(whole))])
            elif r < 0.75:
                # glued multi-piece word: forces longest-match backtracking
                k = rng.randint(2, 4)
                words.append(
                    whole[rng.randint(len(whole))]
                    + "".join(subs[rng.randint(len(subs))] for _ in range(k))
                )
            elif r < 0.85:
                words.append(str(rng.randint(0, 10 ** rng.randint(1, 8))))
            elif r < 0.92 and cjk:
                words.append("".join(cjk[rng.randint(len(cjk))] for _ in range(rng.randint(1, 4))))
            else:
                words.append(
                    whole[rng.randint(len(whole))] + punct[rng.randint(len(punct))]
                )
        sentences.append(" ".join(words))
    # plus hand-picked hard cases at real-vocab scale
    sentences += [
        "The counterintuitive internationalization of tokenization pipelines",
        "unbelievable disestablishmentarianism reimplementation",
        "naïve café résumé coöperate",
        "训练 数据 中文分词 的 测试",
        "mixed中文and english 字符",
        "hyphen-ated e-mail state-of-the-art",
        "2+2=4, 100% of $5.99!",
        "x" * 150,  # > max_input_chars_per_word
    ]
    return sentences


def test_30k_vocab_parity_python(tokenizers_30k):
    hf, ours = tokenizers_30k
    rng = np.random.RandomState(42)
    sentences = _sentence_pool(list(ours.vocab), rng, 3000)
    for s in sentences:
        assert ours.tokenize(s) == hf.tokenize(s), s
        got = ours.encode(s, max_length=40)
        want = hf.encode(s, max_length=40, truncation=True)
        assert got == want, s


def test_30k_vocab_parity_native(tokenizers_30k):
    hf, ours = tokenizers_30k
    native = pytest.importorskip("feddat_tpu.native")
    if not native.available():
        pytest.skip("no native toolchain")
    nat = native.NativeWordPiece(ours.vocab)
    rng = np.random.RandomState(7)
    sentences = _sentence_pool(list(ours.vocab), rng, 3000)
    for s in sentences:
        assert nat.tokenize(s) == hf.tokenize(s), s
    ids_n, mask_n = nat.batch_encode(sentences[:512], 40)
    enc = hf(sentences[:512], max_length=40, truncation=True, padding="max_length")
    np.testing.assert_array_equal(ids_n, np.asarray(enc["input_ids"], np.int32))
    np.testing.assert_array_equal(mask_n, np.asarray(enc["attention_mask"], np.int32))
