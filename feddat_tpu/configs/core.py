"""Typed configuration tree for the framework.

Replaces the reference's three-tier config system (argparse flags in
``src/train/main.py:262-322``, dict registries in ``src/configs/*.py``, and the
accelerate YAML) with one frozen-dataclass tree.  All hyperparameter defaults
below are taken from the reference (citations per field group).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class PEFTMode(str, enum.Enum):
    """Parameter-efficient fine-tuning modes.

    Mirrors the reference's ``--optimizer_mode`` routing
    (``src/train/main.py:132-245``): each mode decides which parameter
    partitions are trainable, which subset is communicated in FedAvg, and
    which stays client-personal.
    """

    FULL = "full"
    ADAPTER = "adapter"
    DAT = "dat"
    FREEZE_ENCODER = "freeze_encoder"
    FREEZE_BOTTOM_K = "freeze_bottom_k_layers"
    NONE = "none"
    NORM = "norm"
    LORA = "lora"
    BIAS = "bias"
    PROMPT = "prompt"


@dataclasses.dataclass(frozen=True)
class AdapterSpec:
    """Bottleneck-adapter configuration (reference: ``src/modeling/models/adapter.py:16-58``).

    ``names``: which named adapters exist at every adapter site.  DAT uses
    ``('adapter_0', 'adapter_1', 'adapter_2')`` (local / shared / frozen
    teacher, ``src/train/main.py:105-112``); plain adapter mode uses
    ``('adapter',)``.
    """

    names: Tuple[str, ...] = ()
    reduction_factor: int = 16
    scaling: float = 1.0
    # Fixed ensemble weight used by the gated forward.  The reference's
    # learned gate is dead code; the live path mixes adapters 0/2 with fixed
    # 0.5/0.5 weights (``adapter.py:144,160``).
    ensemble_weight: float = 0.5
    # Route the ensemble mode through the fused Pallas epilogue on TPU.
    fused: bool = False

    @property
    def enabled(self) -> bool:
        return len(self.names) > 0

    @property
    def is_dat(self) -> bool:
        return "adapter_2" in self.names


@dataclasses.dataclass(frozen=True)
class LoraSpec:
    """LoRA on attention query/value projections (reference:
    ``src/modeling/adaptered_output.py:28-53``, loralib ``r=16``)."""

    rank: int = 16
    # The reference calls ``lora.Linear(d, d, r=16)`` with no ``lora_alpha``;
    # loralib's default is 1, so the effective LoRA scaling is alpha/r = 1/16.
    alpha: float = 1.0
    enabled: bool = False


@dataclasses.dataclass(frozen=True)
class PromptSpec:
    """Reparameterized prompt tuning (reference: ``src/train/main.py:214-229``):
    ``Embedding(len, d) -> Linear(d, d//4) -> Tanh -> Linear(d//4, d)``,
    prompt length 5, spliced into text and image token streams."""

    length: int = 5
    bottleneck: int = 192
    enabled: bool = False


@dataclasses.dataclass(frozen=True)
class ViltModelConfig:
    """ViLT-B/32 (reference wraps HF ``ViltModel``; ``src/modeling/vilt.py:26-151``).

    TPU-first deviation: images are resized to a fixed ``image_size`` canvas
    instead of the ViltProcessor's variable shorter-side-384/max-640 resize,
    so every jitted program has static shapes.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_text_len: int = 40
    image_size: Tuple[int, int] = (384, 384)
    patch_size: int = 32
    # Pretrained grid the positional embeddings were trained at (384/32 = 12).
    pretrained_image_size: Tuple[int, int] = (384, 384)
    type_vocab_size: int = 2
    # Expanded 2 -> 3 for NLVR2's second image (``vilt.py:102-113``).
    modality_type_vocab_size: int = 3
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    adapter: AdapterSpec = AdapterSpec()
    lora: LoraSpec = LoraSpec()
    prompt: PromptSpec = PromptSpec()
    remat: bool = False
    # Rematerialization policy: "full" recomputes everything in the backward;
    # "dots" saves matmul outputs and recomputes only elementwise chains
    # (less recompute, more memory).
    remat_policy: str = "full"
    # Storage dtype of attention logits/cotangents: "float32" (reference
    # parity) or "bfloat16" (+14% DAT throughput on v5e; softmax still
    # accumulates fp32).
    attention_logits_dtype: str = "float32"
    # lax.scan unroll factor for the layer stack: >1 lets XLA fuse/schedule
    # across layer boundaries at the cost of a bigger program.
    scan_unroll: int = 1
    # With attn_impl='block': fold norm_before into the kernel.  The fused
    # LN has a FROZEN backward (zero scale/bias cotangents), so this is an
    # explicit opt-in (default False): create_model enables it for every
    # PEFT mode except 'norm' (which trains the LayerNorms); direct config
    # constructors must opt in themselves (+2% measured, PERF.md).
    fuse_ln: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size[0] // self.patch_size) * (
            self.image_size[1] // self.patch_size
        )


@dataclasses.dataclass(frozen=True)
class AlbefBertConfig:
    """xBERT config (reference: ``src/configs/model_configs.py:40-60``):
    a BERT-base whose layers ``>= fusion_layer`` cross-attend to image states."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    fusion_layer: int = 6
    encoder_width: int = 768
    pad_token_id: int = 0


@dataclasses.dataclass(frozen=True)
class AlbefModelConfig:
    """ALBEF = ViT-B/16 @ 384 + xBERT encoder + 6-layer LM decoder
    (reference: ``src/modeling/models/albef_model.py:12-57``)."""

    image_res: int = 384
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp_ratio: float = 4.0
    vision_layer_norm_eps: float = 1e-6
    bert: AlbefBertConfig = AlbefBertConfig()
    decoder_layers: int = 6
    distill: bool = False
    momentum: float = 0.995
    max_question_len: int = 25
    max_answer_len: int = 10
    adapter: AdapterSpec = AdapterSpec()
    lora: LoraSpec = LoraSpec()
    prompt: PromptSpec = PromptSpec()
    remat: bool = False
    # Remat policy for the ViT tower (the FLOP-dominant stack): "full", or
    # "block_save_nox" to pair with the attn-block kernel (see
    # ViltModelConfig.remat_policy / ops/attn_block.py).
    remat_policy: str = "full"
    # See ViltModelConfig.fuse_ln (applies to the ViT tower's blocks;
    # opt-in — frozen-LN backward).
    fuse_ln: bool = False
    # Remat for the text/fusion/decoder towers only (None = follow
    # ``remat``).  Their activations are tiny (Lq<=25, La<=10), so
    # recomputing them buys no memory — False skips that overhead while the
    # ViT keeps checkpointing.
    text_remat: Optional[bool] = None
    # Checkpoint policy for the text/fusion/decoder towers' remat ("full" =
    # recompute everything; "names" saves qkv/attn_probs/attn_out/ffn_preact
    # — on the fusion layers qkv includes the S=577 image K/V projections,
    # the dominant backward recompute).  Only meaningful when the towers
    # remat at all (see ``text_remat``).
    text_remat_policy: str = "full"
    # Storage dtype of attention logits/cotangents (see ViltModelConfig):
    # "bfloat16" halves the dominant HBM traffic of the attention backward
    # (+14%% measured on ViLT; same trick, same fp32 softmax accumulation).
    attention_logits_dtype: str = "float32"
    # Candidates packed per row in rank_answer's stage-2 rerank decode
    # (ops/attention.packed_self_bias): the k=64 candidate sequences are
    # La=10 rows each — packing g of them per self-attention row lifts MXU
    # occupancy at a negligible g^2 score-FLOP overhead.  Numerically EXACT
    # vs the unpacked layout (the -10000 mask fill underflows exp to 0.0).
    # Applied when it divides k; 1 = the reference's layout.
    eval_pack_group: int = 8
    # NOTE: the TRAIN decode is deliberately NOT packed: fully-padded answer
    # slots (dense-bank padding, weight 0) lose their own softmax support
    # under the block-diagonal bias (every key ~-10000, so the softmax
    # spreads over the whole packed row), and the fused DAT step's KD term
    # (train/losses.kd_kl_loss) sums over ALL positions incl. those rows —
    # packing would change the KD loss on padded-slot batches.  rank_answer
    # candidates are BOS-prefixed (never fully masked), so eval packing is
    # exact.


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + polynomial (linear) decay with warmup
    (reference: ``task_trainer.py:477-504``, ``53-59``;
    hparams from ``src/configs/task_configs_fed.py:48-51``)."""

    lr: float = 1e-4
    weight_decay: float = 1e-2
    adam_eps: float = 1e-8
    beta1: float = 0.9
    beta2: float = 0.98
    warmup_ratio: float = 0.1
    # Polynomial decay power (reference uses power=1, i.e. linear).
    power: float = 1.0
    lr_end: float = 0.0


@dataclasses.dataclass(frozen=True)
class FederatedConfig:
    """Communication-round loop parameters (reference: ``src/train/main.py:300-303, 453-558``)."""

    comm_rounds: int = 20
    local_epochs: int = 1
    eval_every: int = 5
    # Per-client FedAvg weights; the reference hardcodes uniform weights
    # (``main.py:455``).  ``None`` means uniform.
    client_weights: Optional[Tuple[float, ...]] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level experiment config (the argparse surface of ``main.py:262-322``)."""

    encoder_name: str = "vilt"  # vilt | viltbert | albef_distill | albef_no_distill
    peft_mode: PEFTMode = PEFTMode.DAT
    tasks: Tuple[str, ...] = ()
    batch_size: int = 2
    val_batch_size: int = 2
    seed: int = 1
    optimizer: OptimizerConfig = OptimizerConfig()
    federated: FederatedConfig = FederatedConfig()
    # Scheduler horizon epochs (reference: ``--num_epochs`` feeds
    # ``max_steps = len(loader) * num_epochs``, ``train_vqa_crossvqa.py:234``).
    num_epochs: int = 1
    layers_to_freeze: int = 2
    # Compute dtype for matmuls; params always live in fp32.
    dtype: str = "bfloat16"
    single_task: bool = False
    debug_steps: int = 0
    # Bit generator for dropout MASKS inside the train steps ("threefry" =
    # jax default, reference-style counter RNG on the VPU; "rbg" = the TPU
    # hardware RNG via XLA RngBitGenerator for bulk bits — +7% measured on
    # the ALBEF fused DAT step, PERF.md round 5).  The state rng chain and
    # checkpoints stay threefry either way (utils.seeding.dropout_key).
    dropout_rng: str = "threefry"


def adapter_spec_for_mode(mode: PEFTMode, reduction_factor: int = 16) -> AdapterSpec:
    """Adapter names per PEFT mode (reference: ``main.py:105-118``)."""
    if mode == PEFTMode.DAT:
        return AdapterSpec(
            names=("adapter_0", "adapter_1", "adapter_2"),
            reduction_factor=reduction_factor,
        )
    if mode == PEFTMode.ADAPTER:
        return AdapterSpec(names=("adapter",), reduction_factor=reduction_factor)
    return AdapterSpec()
