"""ctypes bindings for the native host-pipeline core.

Builds ``libfeddat_native.so`` from the vendored C++ on first use (g++ is in
the image; no pybind11 — plain C ABI) and exposes:

  * :func:`resize_normalize_batch` — GIL-free multithreaded bilinear resize
    + normalization into the batch buffer;
  * :class:`NativeWordPiece` — C++ WordPiece batch tokenizer.

Everything degrades gracefully: ``available()`` is False when the toolchain
or build is missing and callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "feddat_native.cpp")
_SO = os.path.join(_HERE, "libfeddat_native.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile to a process-unique temp name, then atomically rename.

    Multiple OS processes (the real-multihost mode) can hit a stale .so at
    the same instant; two g++ invocations writing the SAME output file would
    interleave and CDLL would load a corrupt library.  rename() on one
    filesystem is atomic, so every process ends up loading a complete build.
    """
    tmp = f"{_SO}.build.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, _SO)
        return None
    except Exception as e:  # toolchain missing / compile error
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None and not os.path.exists(_SO):
                _build_error = err
                return None
            # a rebuild failed but an existing .so is on disk (git checkout
            # does not preserve mtimes, so a shipped prebuilt library can
            # look "stale" in an image without g++): load it — it matched
            # the source when it was committed
        try:
            lib = ctypes.CDLL(_SO)
            # binding an argtype touches the symbol: an outdated fallback
            # binary missing a newer export raises AttributeError here —
            # degrade to the Python paths, never crash available()
            lib.resize_normalize_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.finalize_canvas_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [ctypes.c_char_p] + [ctypes.c_int32] * 4
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
            ]
        except (OSError, AttributeError) as e:  # corrupt/stale binary: degrade
            _build_error = str(e)
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize_batch(
    images: np.ndarray,
    out_hw: Tuple[int, int],
    mean: Sequence[float],
    std: Sequence[float],
    num_threads: int = 8,
) -> np.ndarray:
    """[N, H, W, 3] uint8 -> [N, oh, ow, 3] float32 normalized (bilinear)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    oh, ow = out_hw
    out = np.empty((n, oh, ow, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.resize_normalize_batch(
        images.ctypes.data, n, h, w,
        out.ctypes.data, oh, ow,
        mean_a.ctypes.data, std_a.ctypes.data, num_threads,
    )
    return out


def finalize_canvas_batch(
    images: Sequence[np.ndarray],
    canvas: Tuple[int, int],
    mean: Sequence[float],
    std: Sequence[float],
    num_threads: int = 8,
    with_mask: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Variable-size [h_i, w_i, 3] uint8 images -> zero-padded normalized
    float32 [N, H, W, 3] batch (+ int32 pixel mask), in one fused GIL-free
    pass.  Bitwise-equal to the numpy path ((x/255 - mean)/std in f32).

    The per-epoch hot path of the cached image pipeline
    (``data/pipeline.py``): decode+resize runs once, this runs every epoch."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    n = len(images)
    H, W = canvas
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    for im in images:
        # the kernel reads h*w*3 bytes per image: a grayscale/RGBA array
        # slipping through would be an out-of-bounds read (segfault), not a
        # Python error — validate here like resize_normalize_batch does
        if im.ndim != 3 or im.shape[2] != 3:
            raise ValueError(
                f"finalize_canvas_batch needs [h, w, 3] uint8 images; got "
                f"shape {im.shape}"
            )
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in images])
    hw = np.asarray([[im.shape[0], im.shape[1]] for im in images], np.int64)
    out = np.empty((n, H, W, 3), np.float32)
    mask = np.empty((n, H, W), np.int32) if with_mask else None
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.finalize_canvas_batch(
        ptrs, hw.ctypes.data, n,
        out.ctypes.data, mask.ctypes.data if with_mask else None, H, W,
        mean_a.ctypes.data, std_a.ctypes.data, num_threads,
    )
    return out, mask


class NativeWordPiece:
    """C++ WordPiece over a vocab mapping (token -> id by line order).

    Interface-compatible with :class:`WordPieceTokenizer`: the GIL-free
    batch path is native; the per-string methods (``tokenize``,
    ``convert_tokens_to_ids``, ``encode`` — used by the cache-miss ingestion
    path in ``data/datasets.py``) delegate to the pure-Python tokenizer,
    which is parity-tested against both (``tests/test_tokenizer_hf_parity.py``).
    """

    def __init__(self, vocab: dict, unk="[UNK]", cls="[CLS]", sep="[SEP]", pad="[PAD]"):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_build_error}")
        self._lib = lib
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        assert [i for _, i in ordered] == list(range(len(ordered))), "vocab ids must be dense"
        blob = "\n".join(t for t, _ in ordered).encode("utf-8")
        self._handle = lib.wp_create(
            blob, vocab[unk], vocab[cls], vocab[sep], vocab[pad]
        )
        self.vocab = vocab
        self.pad_token_id = vocab[pad]
        self.cls_token_id = vocab[cls]
        self.sep_token_id = vocab[sep]
        from feddat_tpu.data.tokenizer import WordPieceTokenizer

        self._py = WordPieceTokenizer(vocab)

    def tokenize(self, text):
        return self._py.tokenize(text)

    def convert_tokens_to_ids(self, tokens):
        return self._py.convert_tokens_to_ids(tokens)

    def encode(self, text, max_length=None, add_special_tokens=True):
        return self._py.encode(text, max_length=max_length, add_special_tokens=add_special_tokens)

    def decode(self, ids, skip_special=True):
        return self._py.decode(ids, skip_special=skip_special)

    def batch_encode(self, texts: Sequence[str], max_length: int, num_threads: int = 8):
        """HF-parity batch encode.  The C++ path implements the ASCII subset
        of BERT basic-tokenization exactly; the rare non-ASCII string (VQA
        questions are overwhelmingly ASCII) goes through the parity-tested
        Python tokenizer so results are identical either way."""
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        non_ascii = [i for i, t in enumerate(texts) if not t.isascii()]
        # NUL is the blob separator; HF's clean_text removes NULs anyway.
        blob = b"\x00".join(
            (t.replace("\x00", "") if t.isascii() else "").encode("utf-8")
            for t in texts
        ) + b"\x00"
        self._lib.wp_encode_batch(
            self._handle, blob, n, ids.ctypes.data, mask.ctypes.data,
            max_length, num_threads,
        )
        for i in non_ascii:
            enc = self._py.encode(texts[i], max_length=max_length)
            ids[i] = self.pad_token_id
            mask[i] = 0
            ids[i, : len(enc)] = enc
            mask[i, : len(enc)] = 1
        return ids, mask

    def __del__(self):
        try:
            self._lib.wp_destroy(self._handle)
        except Exception:
            pass
