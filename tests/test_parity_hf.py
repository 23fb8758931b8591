"""Golden parity: our flax models vs HuggingFace torch implementations with
identical (converted) weights — the strongest correctness evidence available
offline (the reference wraps exactly these HF models: ``ViltModel``
(``vilt.py:26-129``) and BERT (xbert is a modified HF BERT)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from feddat_tpu.configs.core import AlbefBertConfig, ViltModelConfig
from feddat_tpu.models.vilt import ViltEncoder
from feddat_tpu.models.xbert import XBertLMHead, XBertModel
from feddat_tpu.utils.checkpoint_convert import (
    convert_bert_lm_head,
    convert_bert_to_xbert,
    convert_hf_vilt,
)

HIDDEN, HEADS, LAYERS, INTER = 32, 4, 3, 64


def _vilt_pair():
    from transformers import ViltConfig, ViltModel

    tcfg = ViltConfig(
        vocab_size=99,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        max_position_embeddings=12,
        image_size=48,
        patch_size=16,
        modality_type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    tmodel = ViltModel(tcfg).eval()

    ours_cfg = ViltModelConfig(
        vocab_size=99,
        hidden_size=HIDDEN,
        num_layers=LAYERS,
        num_heads=HEADS,
        intermediate_size=INTER,
        max_text_len=12,
        image_size=(48, 48),
        patch_size=16,
        modality_type_vocab_size=3,
    )
    params = convert_hf_vilt(tmodel.state_dict(), num_layers=LAYERS)
    return tmodel, ours_cfg, params


def test_vilt_forward_parity():
    tmodel, cfg, params = _vilt_pair()
    rng = np.random.RandomState(0)
    B, L = 2, 12
    input_ids = rng.randint(1, 99, size=(B, L)).astype(np.int64)
    attn = np.ones((B, L), np.int64)
    pixel = rng.randn(B, 3, 48, 48).astype(np.float32)

    with torch.no_grad():
        tout = tmodel(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(pixel),
            pixel_mask=torch.ones(B, 48, 48, dtype=torch.long),
        )
    model = ViltEncoder(cfg)
    seq, pooled = model.apply(
        {"params": params},
        input_ids=jnp.asarray(input_ids, jnp.int32),
        attention_mask=jnp.asarray(attn, jnp.int32),
        pixel_values=jnp.asarray(pixel.transpose(0, 2, 3, 1)),
        deterministic=True,
    )
    # HF's visual_embed randomly permutes patch tokens (multinomial select),
    # so compare the permutation-invariant pooled (CLS) output.
    np.testing.assert_allclose(
        np.asarray(pooled), tout.pooler_output.numpy(), rtol=2e-4, atol=2e-5
    )


def _bert_cfg():
    from transformers import BertConfig

    return BertConfig(
        vocab_size=99,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        max_position_embeddings=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        is_decoder=False,
    )


def test_xbert_text_mode_matches_hf_bert():
    from transformers import BertModel

    torch.manual_seed(1)
    tmodel = BertModel(_bert_cfg(), add_pooling_layer=False).eval()
    ours = AlbefBertConfig(
        vocab_size=99,
        hidden_size=HIDDEN,
        num_layers=LAYERS,
        num_heads=HEADS,
        intermediate_size=INTER,
        max_position_embeddings=16,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        fusion_layer=LAYERS,  # pure text stack
    )
    params = convert_bert_to_xbert(
        tmodel.state_dict(), num_layers=LAYERS, fusion_layer=LAYERS
    )
    rng = np.random.RandomState(1)
    B, L = 2, 10
    ids = rng.randint(1, 99, size=(B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        tout = tmodel(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state
    out = XBertModel(ours).apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        mode="multi_modal",
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), rtol=2e-4, atol=2e-5)


def test_xbert_decoder_matches_hf_bert_lm_head():
    """Our 6-layer cross-attending causal decoder vs HF BertLMHeadModel with
    is_decoder + add_cross_attention (the structure xbert's decoder modifies)."""
    from transformers import BertConfig, BertLMHeadModel

    cfg = BertConfig(
        vocab_size=99,
        hidden_size=HIDDEN,
        num_hidden_layers=2,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        max_position_embeddings=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        is_decoder=True,
        add_cross_attention=True,
    )
    torch.manual_seed(2)
    tmodel = BertLMHeadModel(cfg).eval()
    sd = {k[len("bert."):] if k.startswith("bert.") else k: v for k, v in tmodel.state_dict().items()}

    ours = AlbefBertConfig(
        vocab_size=99,
        hidden_size=HIDDEN,
        num_layers=2,
        num_heads=HEADS,
        intermediate_size=INTER,
        max_position_embeddings=16,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        fusion_layer=0,  # decoder: cross everywhere
    )
    params = {
        "bert": convert_bert_to_xbert(sd, num_layers=2, fusion_layer=0),
        "cls": convert_bert_lm_head(sd),
    }
    rng = np.random.RandomState(2)
    B, L, Lk = 2, 6, 5
    ids = rng.randint(1, 99, size=(B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    enc = rng.randn(B, Lk, HIDDEN).astype(np.float32)
    enc_mask = np.ones((B, Lk), np.int64)
    with torch.no_grad():
        tlogits = tmodel(
            torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).logits
    logits = XBertLMHead(ours).apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask, jnp.int32),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(), rtol=2e-4, atol=2e-4)
