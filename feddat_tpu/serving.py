"""Batch inference / serving surface.

The reference stops at evaluation loops (``task_trainer.py:113-246``); a
deployed model needs a prediction API.  This module packages the two
families' inference paths behind fixed-shape jitted programs (pad to the
compiled batch size, mask, never retrace):

  * :class:`ViltVqaPredictor` — classification VQA: images + questions ->
    top-k (answer, probability) from the task's ans2label vocabulary
    (the reference's eval argmax, ``train_vqa_crossvqa.py:241-257``,
    generalized to top-k serving output);
  * :class:`AlbefVqaPredictor` — answer-ranking VQA: the two-stage
    ``rank_answer`` protocol (``albef_model.py:171-228``) over a fixed
    answer bank, returning answer strings + probabilities.

Host preprocessing reuses the training pipelines' exact functions
(``vilt_resized_u8`` / ``albef_resized_u8`` + tokenizer), so serving
numerics match training/eval bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _pad_batch(arrs: Dict[str, np.ndarray], batch_size: int) -> Tuple[Dict[str, np.ndarray], int]:
    """Zero-pad every leading dim to ``batch_size``; returns (batch, n_real)."""
    n = next(iter(arrs.values())).shape[0]
    if n > batch_size:
        raise ValueError(f"{n} examples > compiled batch size {batch_size}")
    out = {}
    for k, v in arrs.items():
        pad = batch_size - n
        out[k] = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)]) if pad else v
    return out, n


class ViltVqaPredictor:
    """Serving wrapper for a trained ViLT(-family) continual learner.

    ``label2ans`` maps class index -> answer string (the inverse of the
    task's ans2label pickle).  ``adapter_mode`` follows eval semantics:
    'ensemble' (DAT), a named adapter, or 'none'.
    """

    def __init__(
        self,
        model,
        params,
        task_key: str,
        tokenizer,
        label2ans: Sequence[str],
        batch_size: int = 16,
        canvas: Tuple[int, int] = (384, 640),
        max_text_len: int = 40,
        adapter_mode: str = "ensemble",
    ):
        import jax
        import jax.numpy as jnp
        from functools import partial

        self.tokenizer = tokenizer
        self.label2ans = list(label2ans)
        self.batch_size = batch_size
        self.canvas = canvas
        self.max_text_len = max_text_len
        self.adapter_mode = adapter_mode
        self._params = params

        @partial(jax.jit, static_argnames=("mode",))
        def _forward(p, batch, mode):
            _, logits = model.apply(
                {"params": p}, task_key, batch, adapter_mode=mode, deterministic=True
            )
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._forward = _forward

    def _preprocess(self, images, questions) -> Dict[str, np.ndarray]:
        from feddat_tpu.data.images import pack_u8_canvas, vilt_resized_u8

        u8s = []
        for img in images:
            if not hasattr(img, "convert"):
                from PIL import Image

                img = Image.open(img)
            u8s.append(vilt_resized_u8(img, self.canvas))
        # same canvas-pack as the training pipeline's --device_normalize path
        pixels, dims = pack_u8_canvas(u8s, self.canvas)
        ids, mask = self.tokenizer.batch_encode(list(questions), self.max_text_len)
        return {
            "input_ids": ids,
            "attention_mask": mask,
            "pixel_values": pixels,  # u8: the model normalizes on-chip
            "pixel_mask": dims,      # compact [B, 2] rectangle mask
        }

    def predict(
        self, images: Sequence[Any], questions: Sequence[str], top_k: int = 5
    ) -> List[List[Tuple[str, float]]]:
        """-> per example, top-k (answer, probability), descending."""
        assert len(images) == len(questions)
        results: List[List[Tuple[str, float]]] = []
        for s in range(0, len(images), self.batch_size):
            chunk_imgs = images[s : s + self.batch_size]
            chunk_qs = questions[s : s + self.batch_size]
            batch, n = _pad_batch(self._preprocess(chunk_imgs, chunk_qs), self.batch_size)
            probs = np.asarray(self._forward(self._params, batch, self.adapter_mode))[:n]
            order = np.argsort(-probs, axis=-1)[:, :top_k]
            for i in range(n):
                results.append(
                    [(self.label2ans[j], float(probs[i, j])) for j in order[i]]
                )
        return results


class AlbefVqaPredictor:
    """Serving wrapper for a trained ALBEF model: two-stage answer ranking
    over a fixed answer list (``rank_answer``, ``albef_model.py:171-228``)."""

    def __init__(
        self,
        model,
        params,
        tokenizer,
        answer_list: Sequence[str],
        batch_size: int = 16,
        k: int = 64,
        max_question_len: int = 25,
        max_answer_len: int = 10,
        adapter_mode: str = "ensemble",
        pad_token_id: int = 0,
    ):
        import jax
        from functools import partial

        from feddat_tpu.data.albef_pipeline import encode_answer_bank
        from feddat_tpu.models.albef import AlbefModel

        self.tokenizer = tokenizer
        self.answer_list = list(answer_list)
        self.batch_size = batch_size
        self.max_question_len = max_question_len
        self.image_size = model.cfg.image_res
        self.adapter_mode = adapter_mode
        self._params = params
        import jax.numpy as jnp

        answer_ids, answer_mask = encode_answer_bank(
            tokenizer, self.answer_list, max_answer_len
        )
        self._bank = (jnp.asarray(answer_ids), jnp.asarray(answer_mask))
        # the compiled rerank produces exactly k candidates: predict()'s
        # top_k is bounded by it (exposed for callers to size requests)
        self.k = k = min(k, len(self.answer_list))

        @partial(jax.jit, static_argnames=("mode",))
        def _rank(p, batch, mode):
            return model.apply(
                {"params": p}, batch, self._bank[0], self._bank[1], k, mode,
                pad_token_id, method=AlbefModel.rank_answer,
            )

        self._rank = _rank

    def _preprocess(self, images, questions) -> Dict[str, np.ndarray]:
        from feddat_tpu.data.images import albef_resized_u8
        from feddat_tpu.data.text import pre_question

        n = len(images)
        pixels = np.zeros((n, self.image_size, self.image_size, 3), np.uint8)
        for i, img in enumerate(images):
            if not hasattr(img, "convert"):
                from PIL import Image

                img = Image.open(img)
            pixels[i] = albef_resized_u8(img, self.image_size)
        qs = [pre_question(q, 50) for q in questions]
        ids, mask = self.tokenizer.batch_encode(qs, self.max_question_len)
        return {
            "pixel_values": pixels,  # u8: the ViT CLIP-normalizes on-chip
            "question_ids": ids,
            "question_mask": mask,
        }

    def predict(
        self, images: Sequence[Any], questions: Sequence[str], top_k: int = 5
    ) -> List[List[Tuple[str, float]]]:
        """-> per example, top-k (answer, rerank probability), descending.

        ``top_k`` is capped by the compiled rerank width ``self.k`` (the
        two-stage protocol scores only k candidates per question)."""
        assert len(images) == len(questions)
        if top_k > self.k:
            raise ValueError(
                f"top_k={top_k} exceeds the compiled rerank width k={self.k}; "
                "construct the predictor with a larger k"
            )
        results: List[List[Tuple[str, float]]] = []
        for s in range(0, len(images), self.batch_size):
            batch, n = _pad_batch(
                self._preprocess(images[s : s + self.batch_size], questions[s : s + self.batch_size]),
                self.batch_size,
            )
            topk_ids, topk_probs = self._rank(self._params, batch, self.adapter_mode)
            topk_ids = np.asarray(topk_ids)[:n]
            topk_probs = np.asarray(topk_probs)[:n]
            for i in range(n):
                row = [
                    (self.answer_list[int(j)], float(p))
                    for j, p in zip(topk_ids[i][:top_k], topk_probs[i][:top_k])
                ]
                results.append(row)
        return results
