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


def _load_checkpoint_recipe(checkpoint_dir: str, task_key: Optional[str]):
    """-> (meta, resolved task_key, personalized params, default adapter_mode).

    Reads the run recipe (``meta.json``, written by the CLI next to the
    round checkpoints) and the latest round's params, and merges the
    requested client's personal partition over the server tree — the same
    personalization the engines evaluate with.  Handles both engines'
    layouts: the sequential store (``personal[task_key]``) and the SPMD
    stacked client bank (row ``tasks.index(task_key)``)."""
    from feddat_tpu.peft.partition import merge
    from feddat_tpu.utils.checkpointing import load_meta, restore_federated_state

    meta = load_meta(checkpoint_dir)
    if meta is None:
        raise FileNotFoundError(
            f"no meta.json in {checkpoint_dir!r} — serving needs the run "
            "recipe the CLI writes next to its round checkpoints"
        )
    if meta.get("smoke"):
        raise ValueError(
            "this checkpoint was written by a --smoke run (tiny dev model); "
            "smoke models are not reconstructible for serving"
        )
    if task_key is None:
        if len(meta["tasks"]) != 1:
            raise ValueError(
                f"checkpoint holds {len(meta['tasks'])} clients "
                f"({meta['tasks']}); pass task_key="
            )
        task_key = meta["tasks"][0]
    if task_key not in meta["tasks"]:
        raise KeyError(f"task {task_key!r} not in checkpoint tasks {meta['tasks']}")
    restored = restore_federated_state(checkpoint_dir)
    if restored is None:
        raise FileNotFoundError(f"no round checkpoints in {checkpoint_dir!r}")
    _, server, personal, _ = restored
    if "stacked_clients" in personal:  # SPMD engine: [C]-leading client bank
        import jax

        i = meta["tasks"].index(task_key)
        client = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[i], personal["stacked_clients"]
        )
        params = merge(server, client)
    else:
        params = merge(server, personal[task_key])
    mode = meta["optimizer_mode"]
    adapter_mode = {"dat": "ensemble", "adapter": "adapter"}.get(mode, "none")
    return meta, task_key, params, adapter_mode


def _model_from_meta(meta) -> Tuple[Any, Any]:
    """Rebuild the training-time model from the checkpoint recipe."""
    from feddat_tpu.configs.core import PEFTMode
    from feddat_tpu.models import create_model
    from feddat_tpu.models.vilt import TaskHeadSpec

    if meta["engine"] == "spmd":
        # the SPMD engine trains ONE shared head module named task_fed
        from feddat_tpu.federated.spmd import FED_HEAD_KEY

        any_head = next(iter(meta["heads"].values()))
        heads = {FED_HEAD_KEY: TaskHeadSpec(**any_head)}
    else:
        heads = {k: TaskHeadSpec(**v) for k, v in meta["heads"].items()}
    return create_model(
        meta["encoder_name"],
        heads,
        PEFTMode(meta["optimizer_mode"]),
        meta["adapter_reduction_factor"],
        meta["dtype"],
        image_size=tuple(meta["image_size"]) if meta.get("image_size") else None,
        attention_logits_dtype=meta.get("attention_logits_dtype") or "float32",
    )


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


def _normalize_buckets(batch_buckets: Optional[Sequence[int]], batch_size: int) -> Tuple[int, ...]:
    """Ascending unique bucket sizes, always including ``batch_size``."""
    buckets = sorted(set(batch_buckets or ()) | {batch_size})
    if any(b <= 0 for b in buckets):
        raise ValueError(f"batch buckets must be positive: {buckets}")
    return tuple(buckets)


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    """Smallest compiled bucket that fits ``n`` examples."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


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
        batch_buckets: Optional[Sequence[int]] = None,
    ):
        """``batch_buckets``: extra compiled batch sizes for latency-sensitive
        serving — each request chunk runs at the smallest bucket that fits,
        so a single question doesn't pay ``batch_size``-worth of padded
        pixels over the host->device link (one extra compile per bucket,
        e.g. ``batch_buckets=(1,)``).  ``batch_size`` is always a bucket."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        self.tokenizer = tokenizer
        self.label2ans = list(label2ans)
        self.batch_size = batch_size
        self.buckets = _normalize_buckets(batch_buckets, batch_size)
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

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        tokenizer,
        label2ans: Sequence[str],
        task_key: Optional[str] = None,
        model=None,
        adapter_mode: Optional[str] = None,
        **kw,
    ) -> "ViltVqaPredictor":
        """Train -> serve in one call: rebuild the model from the run recipe
        (``meta.json``) and load the latest round's personalized params for
        ``task_key`` (omit it when the checkpoint holds one client).

        ``model`` overrides reconstruction (the caller guarantees it matches
        the checkpoint's param tree — tests use tiny models this way);
        ``adapter_mode`` defaults per the trained PEFT mode (DAT ->
        'ensemble', the eval default)."""
        meta, task_key, params, default_mode = _load_checkpoint_recipe(
            checkpoint_dir, task_key
        )
        if model is None:
            model, _ = _model_from_meta(meta)
        if meta["engine"] == "spmd":
            from feddat_tpu.federated.spmd import FED_HEAD_KEY

            head_key = FED_HEAD_KEY
        else:
            head_key = task_key
        return cls(
            model, params, head_key, tokenizer, label2ans,
            adapter_mode=adapter_mode or default_mode, **kw,
        )

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
            bucket = _bucket_for(len(chunk_imgs), self.buckets)
            batch, n = _pad_batch(self._preprocess(chunk_imgs, chunk_qs), bucket)
            probs = np.asarray(self._forward(self._params, batch, self.adapter_mode))[:n]
            order = np.argsort(-probs, axis=-1)[:, :top_k]
            for i in range(n):
                results.append(
                    [(self.label2ans[j], float(probs[i, j])) for j in order[i]]
                )
        return results


class AlbefVqaPredictor:
    """Serving wrapper for a trained ALBEF model: two-stage answer ranking
    over a fixed answer list (``rank_answer``, ``albef_model.py:171-228``).

    ``batch_buckets`` as in :class:`ViltVqaPredictor`: extra compiled batch
    sizes so small requests skip the full-batch padding cost."""

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
        batch_buckets: Optional[Sequence[int]] = None,
    ):
        import jax
        from functools import partial

        from feddat_tpu.data.albef_pipeline import encode_answer_bank
        from feddat_tpu.models.albef import AlbefModel

        self.tokenizer = tokenizer
        self.answer_list = list(answer_list)
        self.batch_size = batch_size
        self.buckets = _normalize_buckets(batch_buckets, batch_size)
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

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        tokenizer,
        task_key: Optional[str] = None,
        answer_list: Optional[Sequence[str]] = None,
        model=None,
        adapter_mode: Optional[str] = None,
        **kw,
    ) -> "AlbefVqaPredictor":
        """Train -> serve for the ALBEF family (see
        :meth:`ViltVqaPredictor.from_checkpoint`).  ``answer_list`` defaults
        to the task's trained answer bank recorded in the run recipe."""
        meta, task_key, params, default_mode = _load_checkpoint_recipe(
            checkpoint_dir, task_key
        )
        if answer_list is None:
            lists = meta.get("answer_lists") or {}
            if task_key not in lists:
                raise ValueError(
                    "checkpoint recipe carries no answer list for "
                    f"{task_key!r}; pass answer_list="
                )
            answer_list = lists[task_key]
        if model is None:
            model, _ = _model_from_meta(meta)
        return cls(
            model, params, tokenizer, answer_list,
            adapter_mode=adapter_mode or default_mode, **kw,
        )

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
            chunk = self._preprocess(
                images[s : s + self.batch_size], questions[s : s + self.batch_size]
            )
            bucket = _bucket_for(chunk["pixel_values"].shape[0], self.buckets)
            batch, n = _pad_batch(chunk, bucket)
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
