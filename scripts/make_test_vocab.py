"""Build a realistic ~30k-entry BERT WordPiece vocab OFFLINE for the
tokenizer parity suite (tests/fixtures/vocab30k.txt).

The reference ships HF's verbatim tokenizer over the 30,522-entry
bert-base-uncased vocab (``src/modeling/models/tokenization_bert.py:1-537``);
that file is unobtainable in this zero-egress image, so we train a WordPiece
of the same size and character (dense ``##``-piece space, CJK singles,
punctuation, digits) from text present on the system.  What matters for the
parity suite is the *density* of the piece space — greedy longest-match
behaves very differently over 30k pieces than over a toy vocab — not the
exact piece inventory.

Deterministic given the same system corpus: re-run to regenerate.

Usage: python scripts/make_test_vocab.py [out_path]
"""

import glob
import os
import sys
import tempfile


def build_corpus(out_path: str) -> None:
    roots_exts = [
        ("/root/repo", ("*.md", "*.py")),
        ("/root/reference", ("*.py", "*.md")),
        ("/usr/lib/python3.12", ("*.rst", "*.txt", "*.py")),
        ("/usr/share/doc", ("*.txt", "*.md")),
        ("/opt/venv/lib/python3.12/site-packages", ("*.txt", "*.md", "*.rst")),
    ]
    budget = 40_000_000  # chars
    written = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for root, exts in roots_exts:
            for ext in exts:
                for p in sorted(glob.glob(os.path.join(root, "**", ext), recursive=True)):
                    if not os.path.isfile(p) or written > budget:
                        continue
                    try:
                        s = open(p, encoding="utf-8", errors="ignore").read()
                    except OSError:
                        continue
                    out.write(s + "\n")
                    written += len(s)
        # CJK density: a slice of jieba's dictionary if present
        for jp in (
            "/opt/venv/lib/python3.12/site-packages/jieba/dict.txt",
        ):
            if os.path.isfile(jp):
                with open(jp, encoding="utf-8", errors="ignore") as f:
                    for i, line in enumerate(f):
                        if i >= 50_000:
                            break
                        out.write(line.split(" ")[0] + "\n")
    print(f"corpus: {written / 1e6:.1f}M chars -> {out_path}")


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "vocab30k.txt"
    )
    from tokenizers import BertWordPieceTokenizer

    with tempfile.TemporaryDirectory() as tmp:
        corpus = os.path.join(tmp, "corpus.txt")
        build_corpus(corpus)
        tok = BertWordPieceTokenizer(lowercase=True)
        tok.train([corpus], vocab_size=30522, min_frequency=2)
    vocab = tok.get_vocab()
    pieces = sorted(vocab.items(), key=lambda kv: kv[1])
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(k for k, _ in pieces))
    n_sub = sum(1 for k, _ in pieces if k.startswith("##"))
    print(f"vocab: {len(pieces)} entries, {n_sub} '##' pieces -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
