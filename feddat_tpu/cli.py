"""Command-line launch surface.

Mirrors the reference's flag surface (``src/train/main.py:262-341`` +
``train_vilt.sh`` / ``train_albef.sh``) so a reference user can port their
launch command: ``--encoder_name``, ``--pretrained_model_name``,
``--optimizer_mode``, ``--ordered_cl_tasks`` (client-set keyword or explicit
keys), ``--comm_rounds``, ``--local_epochs``, ``--batch_size``, ``--lr``,
``--adapter_reduction_factor``, ``--splits``, ``--seed``, ``--do_single``,
``--debug`` — plus TPU-native additions: ``--engine {sequential,spmd}``,
``--dtype``, ``--checkpoint_dir``, ``--mesh_clients/--mesh_data``.

Run: ``python -m feddat_tpu.cli --encoder_name vilt --optimizer_mode dat
--ordered_cl_tasks domain --climb_data_dir ./data ...``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("feddat_tpu")
    # reference surface
    p.add_argument("--encoder_name", required=True,
                   choices=["vilt", "viltbert", "albef_distill", "albef_no_distill"])
    p.add_argument("--pretrained_model_name", default=None,
                   help="path to a torch checkpoint (HF ViltModel state dict or ALBEF .pth); omit for random init")
    p.add_argument("--climb_data_dir", default="./data")
    p.add_argument("--output_dir", default="./logs")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_single", action="store_true",
                   help="centralized single-task baseline (reference --do_single)")
    p.add_argument("--optimizer_mode", default="dat",
                   choices=["full", "adapter", "dat", "freeze_encoder",
                            "freeze_bottom_k_layers", "none", "norm", "lora", "bias", "prompt"])
    p.add_argument("--ordered_cl_tasks", default="domain",
                   help="client-set keyword (scene|function|domain) or comma-separated task keys")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--val_batch_size", type=int, default=None,
                   help="eval-loader batch size (reference flag; its launch "
                        "scripts pass 2).  Default: --batch_size — eval "
                        "batches match train batches unless explicitly set")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--comm_rounds", type=int, default=20)
    p.add_argument("--local_epochs", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--adapter_reduction_factor", type=int, default=16)
    p.add_argument("--adapter_config", default="pfeiffer",
                   help="kept for launch-command compatibility (the DAT adapter ignores it, as in the reference)")
    p.add_argument("--splits", nargs="+", default=["train_small", "val", "test_small"])
    p.add_argument("--layers_to_freeze", type=int, default=2)
    p.add_argument("--debug", type=int, default=0)
    p.add_argument("--do_wandb_logging", action="store_true")
    p.add_argument("--wandb_freq", type=int, default=100)
    # TPU-native additions
    p.add_argument("--engine", default="sequential", choices=["sequential", "spmd"])
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and build the (client, data) "
                        "mesh over every host's devices (clients on DCN-adjacent "
                        "process blocks, data-parallel riding ICI)")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port for jax.distributed on bare-metal launches "
                        "(omit on TPU pods/GKE: autodetected)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--mesh_clients", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: shard the frozen backbone "
                        "Megatron-style over a `model` mesh axis via "
                        "jax.sharding placement; trainable PEFT partitions "
                        "stay replicated (parallel/tp.py).  Sequential engine "
                        "runs over (data, model); --engine spmd over "
                        "(client, data, model) with the model axis left to "
                        "GSPMD (single-controller either way)")
    p.add_argument("--vocab_file", default=None,
                   help="bert-base-uncased vocab.txt for the WordPiece tokenizer")
    p.add_argument("--bert_model_path", default=None,
                   help="torch state dict of a BertModel for the viltbert text "
                        "half (the reference loads bert-base-uncased, "
                        "viltbert.py:115-120)")
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--use_fused_dat", action="store_true",
                   help="use the single-ensemble-pass fused DAT step (exact when encoder "
                        "dropout is off; with live dropout the masks are threaded through — "
                        "DAT stages 1/3 share the ensemble pass's draw, "
                        "distribution-level-equivalence-tested)")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing (required for large batches on TPU; "
                        "full-layer remat at per-pass B=64 is the measured v5e optimum)")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "dots", "attention", "names", "min_save",
                            "block_save", "block_save_nox", "block_save_ffn"],
                   help="remat granularity (PERF.md documents the measured trade-offs; "
                        "block_save_nox pairs with --attn_impl block: +8%% on v5e)")
    p.add_argument("--text_remat_policy", default="full",
                   choices=["full", "dots", "names"],
                   help="checkpoint policy for ALBEF's text/fusion/decoder towers "
                        "('names' saves qkv/attn_probs/attn_out/ffn_preact — incl. "
                        "the fusion layers' S=577 image K/V projections, the "
                        "dominant backward recompute: +4%% measured, PERF.md r5). "
                        "The block_save* policies are NOT offered here: their "
                        "attn_ctx/attn_lse tags are emitted only by the Pallas "
                        "attention kernels, and the text towers run XLA attention "
                        "— they would silently degrade to near-full recompute")
    p.add_argument("--dropout_rng", default="threefry",
                   choices=["threefry", "rbg"],
                   help="bit generator for dropout masks inside the train step "
                        "(rbg = TPU hardware RNG for bulk bits: +7%% on ALBEF's "
                        "24 dropout-bearing BERT layer-sites; mask streams differ "
                        "from threefry's, trajectory-stochastic like any RNG swap)")
    p.add_argument("--attn_impl", default="auto",
                   choices=["auto", "xla", "fused", "flash", "block", "layer"],
                   help="attention kernel: auto/xla (XLA fused), fused (Pallas "
                        "short-seq), flash (Pallas long-seq), block (Pallas "
                        "whole-attention-block incl. frozen q/k/v/out projections "
                        "— DAT/adapter/prompt modes only, see ops/attn_block.py), "
                        "layer (Pallas whole-LAYER backward: frozen backbone + "
                        "real adapter grads in one kernel, no remat needed — "
                        "DAT/adapter modes, see ops/layer_block.py)")
    p.add_argument("--attention_logits_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="storage dtype of attention logits; default float32 "
                        "(reference parity), bfloat16 = +14-16%% throughput; "
                        "defaults to bfloat16 when --dtype bfloat16")
    p.add_argument("--num_workers", type=int, default=8,
                   help="host-pipeline decode/resize thread-pool size "
                        "(reference: torch DataLoader workers, default 2; "
                        "threads suffice here because PIL decode and the "
                        "native normalize core release the GIL).  0 = "
                        "serial loading")
    p.add_argument("--canvas_bucket", action="store_true",
                   help="ViLT pipelines: pad train batches whose every image "
                        "resizes to width <= 384 onto a square (384, 384) "
                        "canvas (~40%% less pixel payload for portrait/square "
                        "images; per-image pixels and scores are identical — "
                        "the model slices its position grid).  Sequential "
                        "engine only (the SPMD engine stacks same-shape "
                        "client batches)")
    p.add_argument("--cache_images", action="store_true",
                   help="cache decoded+resized images (uint8) across "
                        "epochs/rounds; per-epoch normalize+pad runs fused in "
                        "the native core.  Bitwise-identical pixels; pays for "
                        "itself from round 2 (federated rounds revisit every "
                        "client's data)")
    p.add_argument("--spmd_full_epochs", action="store_true",
                   help="SPMD engine: run each round to the LARGEST client's "
                        "step count with no-op-gated updates for exhausted "
                        "clients (exact reference full-epoch semantics for "
                        "heterogeneous client sizes; default truncates to the "
                        "smallest — see README)")
    p.add_argument("--device_normalize", action="store_true",
                   help="ship pixels to the chip as RAW uint8 and normalize "
                        "on-device (4x less host->device traffic; the canvas "
                        "zero-pad is reproduced exactly via the pixel mask)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the first executed "
                        "round into this directory (view in TensorBoard/"
                        "xprof); the reference has no profiler at all "
                        "(SURVEY §5.1)")
    p.add_argument("--smoke", action="store_true",
                   help="CI smoke mode: tiny model dimensions + tiny images (functional path only)")
    return p


def resolve_task_keys(spec: str):
    from feddat_tpu.configs.tasks import resolve_clients

    if "," in spec:
        return resolve_clients([s.strip() for s in spec.split(",")])
    return resolve_clients(spec)


def _build_vqa_cross_client(args, key, spec, tokenizer, answer_banks):
    """Federated cross-VQA client (the reference's ``VQATrainerCross`` data
    path, ``train_vqa_crossvqa.py:39-230``)."""
    import logging

    from feddat_tpu.data.albef_pipeline import AlbefVQAPipeline
    from feddat_tpu.data.datasets import load_ans2label, load_examples
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import ViltVQAPipeline

    # every task path roots under --climb_data_dir (the reference joins it
    # onto the task config's data_dir, ``train_vqa_crossvqa.py:97-98``);
    # runtime-registered tasks with ABSOLUTE data_dir pass through unchanged
    data_dir = os.path.join(args.climb_data_dir, spec.data_dir)
    train_split, eval_split = args.splits[0], args.splits[-1]
    examples = load_examples(
        key, data_dir, train_split, data_root=args.climb_data_dir,
        tokenizer=tokenizer, shuffle_seed=args.seed,
    )
    eval_examples = None
    if eval_split != train_split:
        try:
            eval_examples = load_examples(
                key, data_dir, eval_split, data_root=args.climb_data_dir,
                tokenizer=tokenizer,
            )
        except (FileNotFoundError, OSError) as e:
            # dev/test fixtures without an eval split: eval on train — but
            # never silently (a missing test pickle on a real run would
            # otherwise inflate 'test' scores with train-split numbers)
            logging.getLogger("feddat_tpu").warning(
                "task %s: no %r split found (%s); evaluating on the TRAIN "
                "split", key, eval_split, e,
            )
    backend = make_backend(spec.images_source, key, args.climb_data_dir)
    if args.encoder_name.startswith("albef"):
        ans2label = load_ans2label(key, data_dir, args.climb_data_dir)
        answer_list = list(ans2label.keys())[:100]  # vqa_dataset_crossvqa.py:301
        pipe = AlbefVQAPipeline(
            examples, backend, tokenizer, answer_list,
            batch_size=args.batch_size, val_batch_size=args.val_batch_size,
            seed=args.seed, eval_examples=eval_examples,
            cache_images=args.cache_images, pixels_u8=args.device_normalize,
            num_workers=args.num_workers,
            **({"image_size": 64, "max_question_len": 12, "max_answer_len": 6}
               if args.smoke else {}),
        )
        answer_banks[key] = (pipe.answer_ids, pipe.answer_mask)
        return pipe
    return ViltVQAPipeline(
        examples, backend, tokenizer,
        num_labels=spec.num_labels, batch_size=args.batch_size,
        val_batch_size=args.val_batch_size, seed=args.seed,
        eval_examples=eval_examples, cache_images=args.cache_images,
        pixels_u8=args.device_normalize, num_workers=args.num_workers,
        canvas_bucket=args.canvas_bucket,
        **({"canvas": (64, 64), "max_text_len": 16} if args.smoke else {}),
    )


def _build_classification_client(args, key, spec, tokenizer):
    """Non-federated VL tasks through their reference trainers' data paths:
    VQAv2 5%% low-shot (``train_vqa.py:70-71``), NLVR2 2048/256-per-class +
    halved batch (``train_nlvr2.py:91-92``, ``nlvr2_dataset.py:170``),
    SNLI-VE 2048/256 per class over train/dev (``train_snli_ve.py:99-100``),
    VCR 5%% low-shot 'answer' task (``train_vcr.py:94-95``)."""
    from feddat_tpu.data.classification_datasets import (
        Nlvr2Pipeline,
        SnliVePipeline,
        VcrPipeline,
        convert_to_low_shot_per_class,
        load_nlvr2_examples,
        load_snli_ve_examples,
        load_vcr_examples,
    )
    from feddat_tpu.data.datasets import convert_to_low_shot, load_vqav2_examples
    from feddat_tpu.data.images import make_backend
    from feddat_tpu.data.pipeline import ViltVQAPipeline

    data_dir = os.path.join(args.climb_data_dir, spec.data_dir)
    if (args.cache_images or args.device_normalize or args.canvas_bucket) and spec.trainer != "vqa":
        print(
            f"[feddat_tpu] --cache_images/--device_normalize/--canvas_bucket "
            f"are not wired into the {spec.trainer!r} pipeline; task {key!r} "
            "uses the plain f32 full-canvas image path", file=sys.stderr,
        )
    smoke_kw = {"canvas": (64, 64), "max_text_len": 16} if args.smoke else {}
    canvas = smoke_kw.get("canvas", (384, 640))
    max_text_len = smoke_kw.get("max_text_len", 40)

    if spec.trainer == "vqa":
        # low-shot subsampling uses the reference's FIXED seed
        # (``random.Random(1)``, vqa_dataset.py:181), independent of --seed
        ex = convert_to_low_shot(
            load_vqav2_examples(data_dir, "train", tokenizer), 0.05, seed=1
        )
        ev = convert_to_low_shot(
            load_vqav2_examples(data_dir, "val", tokenizer), 0.05, seed=1
        )
        backend = make_backend(spec.images_source, key, args.climb_data_dir)
        return ViltVQAPipeline(
            ex, backend, tokenizer, num_labels=spec.num_labels,
            batch_size=args.batch_size, val_batch_size=args.val_batch_size,
            seed=args.seed, eval_examples=ev,
            cache_images=args.cache_images, pixels_u8=args.device_normalize,
            num_workers=args.num_workers, canvas_bucket=args.canvas_bucket,
            **smoke_kw,
        )
    if spec.trainer == "nlvr2":
        ex = convert_to_low_shot_per_class(
            load_nlvr2_examples(data_dir, "train"), spec.num_labels, 2048, seed=1
        )
        ev = convert_to_low_shot_per_class(
            load_nlvr2_examples(data_dir, "val"), spec.num_labels, 256, seed=1
        )
        return Nlvr2Pipeline(
            ex, tokenizer, max_text_len, canvas,
            batch_size=max(1, args.batch_size // 2),
            val_batch_size=(
                max(1, args.val_batch_size // 2) if args.val_batch_size else None
            ),
            seed=args.seed, eval_examples=ev,
        )
    if spec.trainer == "snli_ve":
        ex = convert_to_low_shot_per_class(
            load_snli_ve_examples(data_dir, "train"), spec.num_labels, 2048, seed=1
        )
        ev = convert_to_low_shot_per_class(
            load_snli_ve_examples(data_dir, "dev"), spec.num_labels, 256, seed=1
        )
        backend = make_backend(spec.images_source, key, args.climb_data_dir)
        return SnliVePipeline(
            ex, backend, tokenizer, max_text_len, canvas,
            batch_size=args.batch_size, val_batch_size=args.val_batch_size,
            seed=args.seed, eval_examples=ev,
        )
    if spec.trainer == "vcr":
        from feddat_tpu.data.datasets import convert_to_low_shot as low_shot_pct

        ex = low_shot_pct(load_vcr_examples(data_dir, "train", "qa"), 0.05, seed=1)
        ev = low_shot_pct(load_vcr_examples(data_dir, "val", "qa"), 0.05, seed=1)
        return VcrPipeline(
            ex, tokenizer, max_text_len, canvas, batch_size=args.batch_size,
            val_batch_size=args.val_batch_size,
            num_choices=spec.num_choices, seed=args.seed,
            image_root=data_dir, eval_examples=ev,
        )
    raise KeyError(f"unknown trainer kind {spec.trainer!r} for task {key!r}")


def build_clients(args, task_keys, tokenizer):
    """Per-client data pipelines routed by ``TaskSpec.trainer`` (the
    reference dispatches through ``task_configs[task_key]['task_trainer']``,
    ``src/train/main.py:482-483``) -> (clients, answer_banks)."""
    from feddat_tpu.configs.tasks import TASK_CONFIGS

    clients, answer_banks = {}, {}
    for key in task_keys:
        spec = TASK_CONFIGS[key]
        if spec.trainer == "vqa_cross":
            pipe = _build_vqa_cross_client(args, key, spec, tokenizer, answer_banks)
        else:
            if args.encoder_name.startswith("albef"):
                raise NotImplementedError(
                    f"task {key!r} ({spec.trainer}) is a ViLT-family task; "
                    "the reference has no ALBEF path for it either"
                )
            pipe = _build_classification_client(args, key, spec, tokenizer)
        pipe.task_key = key
        clients[key] = pipe
    return clients, answer_banks


def apply_tp_arg_guards(args) -> None:
    """Validate/normalize the ``--tp`` argument combinations (in place).

    TP composes with both engines — sequential runs over a (data, model)
    mesh (parallel/tp.py), spmd over (client, data, model) with the model
    axis left to GSPMD (federated/spmd.py, shard_map ``axis_names``) — with
    a single controller (both feed process-local batches; a multihost
    global mesh would need per-process assembly of the model axis), and
    with XLA attention (every Pallas attention kernel is a custom call that
    does not partition over the model axis)."""
    if args.tp <= 1:
        return
    if args.multihost:
        raise SystemExit(
            "--tp is single-controller: the sequential engine feeds "
            "process-local batches to the (data, model) mesh, which cannot "
            "span a multihost process group.  Drop --multihost (TP uses all "
            "of this process's devices) or use --engine spmd --multihost "
            "without --tp."
        )
    if args.attn_impl in ("block", "flash", "fused", "layer"):
        print(
            f"[feddat_tpu] --attn_impl {args.attn_impl} is a Pallas custom "
            "call and does not partition over the model axis; falling back "
            "to 'auto' for this --tp run", file=sys.stderr,
        )
        args.attn_impl = "auto"


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()  # persistent jit cache (relaunches skip compiles)

    import jax

    if args.multihost:
        from feddat_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(
            args.coordinator_address, args.num_processes, args.process_id
        )

    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.models import create_model
    from feddat_tpu.models.vilt import TaskHeadSpec
    from feddat_tpu.utils.observability import MetricsLogger, experiment_name, setup_logger

    task_keys = resolve_task_keys(args.ordered_cl_tasks)
    mode = PEFTMode(args.optimizer_mode)
    frozen_kernel_conflict = args.attn_impl in ("block", "layer") and mode in (
        PEFTMode.FULL, PEFTMode.BIAS, PEFTMode.LORA, PEFTMode.FREEZE_BOTTOM_K
    )
    # the whole-layer kernel additionally freezes the LayerNorms/FFN
    if args.attn_impl == "layer" and mode == PEFTMode.NORM:
        frozen_kernel_conflict = True
    if frozen_kernel_conflict:
        # create_model rejects this combination outright (frozen-projection
        # kernel vs a mode that trains the projections); for training runs
        # surface the conflict, for eval-only runs fall back gracefully.
        if args.do_train:
            raise SystemExit(
                f"--attn_impl {args.attn_impl} assumes a frozen backbone; "
                f"--optimizer_mode {mode.value} trains part of it (its gradients "
                "would silently be zero).  Use --attn_impl auto for this mode."
            )
        print(
            f"[feddat_tpu] --attn_impl {args.attn_impl} is incompatible with "
            f"--optimizer_mode {mode.value}; falling back to 'auto' for this "
            "eval-only run", file=sys.stderr,
        )
        args.attn_impl = "auto"
    if args.attn_impl == "layer" and args.remat:
        print(
            "[feddat_tpu] --attn_impl layer: the pre-LN layer stacks save "
            "their own minimal residual set (--remat is ignored for them)",
            file=sys.stderr,
        )
    apply_tp_arg_guards(args)
    if args.engine == "spmd" and args.canvas_bucket:
        # fail BEFORE model creation / dataset ingestion — this is pure
        # arg validation and those stages can take minutes on real data
        raise SystemExit(
            "--canvas_bucket emits per-batch canvases; the spmd engine "
            "stacks same-shape batches across the client axis.  Use "
            "--engine sequential with --canvas_bucket."
        )
    config = TrainConfig(
        encoder_name=args.encoder_name,
        peft_mode=mode,
        tasks=tuple(task_keys),
        batch_size=args.batch_size,
        val_batch_size=args.val_batch_size or args.batch_size,
        seed=args.seed,
        optimizer=OptimizerConfig(lr=args.lr),
        federated=FederatedConfig(
            comm_rounds=args.comm_rounds,
            local_epochs=args.local_epochs,
            eval_every=args.eval_every,
        ),
        num_epochs=args.num_epochs,
        layers_to_freeze=args.layers_to_freeze,
        dtype=args.dtype,
        single_task=args.do_single,
        debug_steps=args.debug,
        dropout_rng=args.dropout_rng,
    )
    run_name = experiment_name(config)
    logger = setup_logger(args.output_dir, run_name=run_name)
    logger.info("tasks: %s", task_keys)

    from feddat_tpu.data.tokenizer import WordPieceTokenizer

    if args.vocab_file:
        tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab_file)
        try:  # prefer the GIL-free C++ batch tokenizer when the toolchain exists
            from feddat_tpu import native

            if native.available():
                tokenizer = native.NativeWordPiece(tokenizer.vocab)
                logger.info("using native C++ WordPiece tokenizer")
        except Exception:
            pass
    else:
        logger.warning("no --vocab_file given; using a toy tokenizer (tests/dev only)")
        tokenizer = WordPieceTokenizer.toy(["what", "is", "the", "a"])

    from feddat_tpu.configs.tasks import TASK_CONFIGS

    def head_spec(key):
        spec = TASK_CONFIGS[key]
        return TaskHeadSpec(
            num_labels=spec.num_labels, num_images=spec.num_images,
            model_type=spec.model_type, num_choices=spec.num_choices,
        )

    if args.engine == "spmd":
        # The SPMD engine stacks all clients' heads into one sharded bank, so
        # the model carries a single shared head module named task_<FED_HEAD_KEY>
        # (every federated VQA client has num_labels=100, task_configs_fed.py:44).
        from feddat_tpu.federated.spmd import FED_HEAD_KEY

        specs = {head_spec(k) for k in task_keys}
        if len(specs) != 1:
            raise ValueError(
                f"--engine spmd needs a uniform head shape across clients; got {specs}"
            )
        heads = {FED_HEAD_KEY: next(iter(specs))}
    else:
        heads = {k: head_spec(k) for k in task_keys}
    from feddat_tpu.configs.core import LoraSpec, PromptSpec

    smoke_lora = LoraSpec(rank=2, enabled=(mode == PEFTMode.LORA))
    smoke_prompt = PromptSpec(length=2, bottleneck=8, enabled=(mode == PEFTMode.PROMPT))
    if args.smoke and args.encoder_name.startswith("albef"):
        from feddat_tpu.configs.core import (
            AlbefBertConfig,
            AlbefModelConfig,
            adapter_spec_for_mode,
        )
        from feddat_tpu.models.albef import AlbefModel

        smoke_bert = AlbefBertConfig(
            hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
            hidden_dropout=0.0, attention_dropout=0.0, fusion_layer=2,
        )
        smoke_cfg = AlbefModelConfig(
            image_res=64, patch_size=32, vision_width=32, vision_layers=2,
            vision_heads=4, bert=smoke_bert, decoder_layers=2,
            adapter=adapter_spec_for_mode(mode, 4),
            lora=smoke_lora, prompt=smoke_prompt,
            distill=(args.encoder_name == "albef_distill"),
        )
        model, model_cfg = AlbefModel(smoke_cfg), smoke_cfg
    elif args.smoke:
        from feddat_tpu.configs.core import ViltModelConfig, adapter_spec_for_mode
        from feddat_tpu.models.vilt import ViltContinualLearner

        smoke_cfg = ViltModelConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            max_text_len=16, image_size=(64, 64), patch_size=32,
            adapter=adapter_spec_for_mode(mode, 4),
            lora=smoke_lora, prompt=smoke_prompt,
        )
        if args.encoder_name == "viltbert":
            from feddat_tpu.models.viltbert import ViltBertContinualLearner

            model, model_cfg = ViltBertContinualLearner(smoke_cfg, heads), smoke_cfg
        else:
            model, model_cfg = ViltContinualLearner(smoke_cfg, heads), smoke_cfg
    else:
        logits_dtype = args.attention_logits_dtype or (
            "bfloat16" if args.dtype == "bfloat16" else "float32"
        )
        # ViLT-family models must match the host pipeline's fixed canvas
        # (ViltVQAPipeline default (384, 640): the reference's
        # shorter-side-384 / longer<=640 resize envelope as one static shape)
        model, model_cfg = create_model(
            args.encoder_name, heads, mode, args.adapter_reduction_factor, args.dtype,
            image_size=(384, 640) if args.encoder_name in ("vilt", "viltbert") else None,
            remat=args.remat, remat_policy=args.remat_policy,
            attn_impl=args.attn_impl, attention_logits_dtype=logits_dtype,
            text_remat_policy=args.text_remat_policy,
        )

    clients, answer_banks = build_clients(args, task_keys, tokenizer)
    sample_batch = next(iter(clients.values())).train_batches(0).__next__()

    if args.encoder_name in ("vilt", "viltbert"):
        from feddat_tpu.models.vilt import init_vilt_params

        params = init_vilt_params(model, jax.random.PRNGKey(args.seed), sample_batch)
        if args.pretrained_model_name:
            import torch

            from feddat_tpu.utils.checkpoint_convert import convert_hf_vilt, merge_pretrained

            sd = torch.load(args.pretrained_model_name, map_location="cpu")
            grid = (model_cfg.image_size[0] // model_cfg.patch_size,
                    model_cfg.image_size[1] // model_cfg.patch_size)
            pretrained = convert_hf_vilt(sd, num_layers=model_cfg.num_layers,
                                         num_patches_new=grid)
            params = merge_pretrained(params, {"vilt": pretrained})
        if args.encoder_name == "viltbert" and args.bert_model_path:
            import torch

            from feddat_tpu.utils.checkpoint_convert import (
                convert_bert_to_xbert,
                merge_pretrained,
            )

            bert_sd = torch.load(args.bert_model_path, map_location="cpu")
            text_bert = convert_bert_to_xbert(
                bert_sd, num_layers=model_cfg.num_layers,
                fusion_layer=model_cfg.num_layers,
            )
            params = merge_pretrained(params, {"text_bert": text_bert})
    else:
        from feddat_tpu.models.albef import init_albef_params

        params = init_albef_params(model, jax.random.PRNGKey(args.seed), sample_batch)
        if args.pretrained_model_name:
            import torch

            from feddat_tpu.utils.checkpoint_convert import (
                convert_albef_checkpoint,
                merge_pretrained,
            )

            raw = torch.load(args.pretrained_model_name, map_location="cpu")
            sd = raw.get("model", raw)
            n_patches = (model_cfg.image_res // model_cfg.patch_size) ** 2
            pretrained = convert_albef_checkpoint(sd, num_patches_new=n_patches)
            params = merge_pretrained(params, pretrained)

    # single-writer metrics: only process 0 writes the JSONL / W&B stream
    # (the reference's rank-0 logging, ``main.py:67-99``)
    is_p0 = jax.process_index() == 0
    metrics = MetricsLogger(
        os.path.join(args.output_dir, f"{run_name}.metrics.jsonl") if is_p0 else None,
        log_every=args.wandb_freq,
        wandb_project="feddat_tpu" if (args.do_wandb_logging and is_p0) else None,
        wandb_run_name=run_name,
    )

    if args.checkpoint_dir and is_p0:
        # persist the run's model recipe next to the round checkpoints so
        # serving.*.from_checkpoint can rebuild the model without the
        # original launch command
        import dataclasses as _dc2

        from feddat_tpu.utils.checkpointing import write_meta

        meta = {
            "encoder_name": args.encoder_name,
            "optimizer_mode": args.optimizer_mode,
            "adapter_reduction_factor": args.adapter_reduction_factor,
            "dtype": args.dtype,
            "engine": args.engine,
            "tasks": list(task_keys),
            "smoke": bool(args.smoke),
            "image_size": (
                [384, 640] if args.encoder_name in ("vilt", "viltbert") else None
            ),
            "attention_logits_dtype": (
                None if args.smoke else logits_dtype
            ),
            "heads": {k: _dc2.asdict(head_spec(k)) for k in task_keys},
        }
        if args.encoder_name.startswith("albef"):
            meta["answer_lists"] = {
                k: list(clients[k].answer_list) for k in task_keys
            }
        write_meta(args.checkpoint_dir, meta)

    from feddat_tpu.train.trainers import resolve_trainer

    # Non-federated tasks take lr/wd/eps/warmup from the task config
    # (``train_nlvr2.py:88-97``); the federated cross-VQA path uses --lr.
    opt_overrides = {
        k: OptimizerConfig(
            lr=TASK_CONFIGS[k].lr,
            weight_decay=TASK_CONFIGS[k].weight_decay,
            adam_eps=TASK_CONFIGS[k].adam_epsilon,
            warmup_ratio=TASK_CONFIGS[k].warmup_ratio,
        )
        for k in task_keys
        if TASK_CONFIGS[k].trainer != "vqa_cross"
    }
    # ... and their LR-schedule horizon (``train_nlvr2.py:85-93`` computes
    # max_steps from the task config's num_epochs, not the CLI flag)
    epoch_overrides = {
        k: TASK_CONFIGS[k].num_epochs
        for k in task_keys
        if TASK_CONFIGS[k].trainer != "vqa_cross"
    }

    if args.engine == "spmd":
        if args.do_single:
            raise ValueError(
                "--do_single is a per-task centralized baseline with no client "
                "axis; use --engine sequential for it"
            )
        from feddat_tpu.federated.spmd import SPMDFederatedTrainer
        from feddat_tpu.parallel.mesh import make_mesh, make_multihost_mesh

        if args.multihost:
            mesh = make_multihost_mesh(
                num_clients=args.mesh_clients or len(task_keys),
                data_parallel=args.mesh_data,
            )
        else:
            mesh = make_mesh(
                num_clients=args.mesh_clients or len(task_keys),
                data_parallel=args.mesh_data,
                model_parallel=args.tp,
            )
        is_albef = args.encoder_name.startswith("albef")
        if args.encoder_name == "albef_distill":
            raise NotImplementedError(
                "--engine spmd supports albef_no_distill; momentum-distillation "
                "aux state is sequential-engine only (as is the reference's live "
                "DAT path, train_albef.sh)"
            )
        kinds = {TASK_CONFIGS[k].trainer for k in task_keys}
        is_classification = bool(kinds & {"nlvr2", "snli_ve", "vcr"})
        use_fused = args.use_fused_dat
        if use_fused and is_classification:
            logger.warning(
                "--use_fused_dat covers the VQA-family losses; classification "
                "tasks use the standard DAT step"
            )
            use_fused = False
        make_forward = None
        if is_classification and not is_albef:
            from feddat_tpu.train.forwards import make_vilt_forward

            make_forward = lambda m, k: make_vilt_forward(m, k, loss="ce")
        # The SPMD engine compiles ONE step for all stacked clients, so it
        # takes a single optimizer config: apply the task-config override
        # when every client agrees on it (the common case — one task kind
        # per spmd run), reject silently-divergent hyperparameters.
        if opt_overrides:
            if set(opt_overrides) != set(task_keys) or len({
                (o.lr, o.weight_decay, o.adam_eps, o.warmup_ratio)
                for o in opt_overrides.values()
            }) != 1 or len(set(epoch_overrides.values())) != 1:
                raise SystemExit(
                    "--engine spmd compiles one optimizer for all clients, but "
                    "the selected tasks carry different per-task optimizer "
                    "configs; use --engine sequential for mixed task kinds"
                )
            import dataclasses as _dc

            config = _dc.replace(
                config,
                optimizer=next(iter(opt_overrides.values())),
                num_epochs=next(iter(epoch_overrides.values())),
            )
        profile_dir = args.profile_dir
        if profile_dir and jax.process_count() > 1:
            # one trace subtree per process (concurrent writers clash)
            profile_dir = os.path.join(profile_dir, f"proc{jax.process_index()}")
        trainer = SPMDFederatedTrainer(
            model, params, list(clients.values()), config, mesh,
            make_forward=make_forward,
            use_fused=use_fused,
            profile_dir=profile_dir,
            checkpoint_dir=args.checkpoint_dir, metrics_logger=metrics,
            family="albef" if is_albef else "vilt",
            answer_banks=answer_banks if is_albef else None,
            metric="accuracy" if is_classification else "vqa_score",
            full_epochs=args.spmd_full_epochs,
        )
        history = trainer.run()
    else:
        from feddat_tpu.federated.engine import FederatedTrainer

        # Hooks dispatch per task kind, so a mixed client set (the reference's
        # ``task_configs[task_key]['task_trainer']`` dynamic routing,
        # main.py:482-483) works in one run.
        def hooks_for(task_key):
            return resolve_trainer(
                args.encoder_name, TASK_CONFIGS[task_key].trainer,
                answer_banks=answer_banks,
            )

        def make_forward(model_, task_key):
            return hooks_for(task_key).make_forward(model_, task_key)

        def make_eval(model_, task_key):
            h = hooks_for(task_key)
            if h.make_eval is not None:
                return h.make_eval(model_, task_key)
            from feddat_tpu.train.evaluation import make_eval_step

            return make_eval_step(model_, task_key, h.metric)

        first_hooks = hooks_for(task_keys[0])
        use_fused = args.use_fused_dat
        if use_fused and {TASK_CONFIGS[k].trainer for k in task_keys} - {"vqa_cross", "vqa"}:
            logger.warning(
                "--use_fused_dat covers the VQA-family losses (BCE single-image); "
                "classification tasks use the standard DAT step"
            )
            use_fused = False
        tp_mesh = None
        if args.tp > 1:
            from feddat_tpu.parallel.tp import make_tp_mesh

            tp_mesh = make_tp_mesh(model_parallel=args.tp)
            dp = tp_mesh.shape["data"]
            if config.batch_size % dp != 0:
                raise SystemExit(
                    f"--batch_size {config.batch_size} is not divisible by the "
                    f"TP mesh's data axis ({dp} = {dp * args.tp} devices / "
                    f"--tp {args.tp}); batches are sharded over that axis"
                )
            logger.info(
                "tensor parallel: mesh (data=%d, model=%d)",
                tp_mesh.shape["data"], tp_mesh.shape["model"],
            )
        trainer = FederatedTrainer(
            model, params, clients, config,
            make_forward=make_forward,
            make_eval=make_eval,
            metric=first_hooks.metric,
            aux_init=first_hooks.aux_init,
            batch_transform=first_hooks.batch_transform,
            aux_forward=first_hooks.aux_forward,
            use_fused_dat=use_fused,
            optimizer_overrides=opt_overrides,
            num_epochs_overrides=epoch_overrides,
            checkpoint_dir=args.checkpoint_dir, metrics_logger=metrics,
            tp_mesh=tp_mesh,
            profile_dir=args.profile_dir,
        )
        if args.do_single:
            history = [trainer.run_single_task()]
        else:
            history = trainer.run()

    metrics.close()
    if is_p0:  # single writer on shared filesystems
        out = os.path.join(args.output_dir, f"{run_name}.history.json")
        os.makedirs(args.output_dir, exist_ok=True)
        with open(out, "w") as f:
            json.dump(history, f, indent=2, default=float)
        logger.info("history written to %s", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
