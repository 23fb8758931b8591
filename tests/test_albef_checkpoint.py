"""ALBEF checkpoint surgery (``utils/checkpoint_convert.py``): a fabricated
reference-style ``.pth`` state dict (timm-ViT names + xbert-BERT names, no
trained decoder) converts, splits encoder layers >= fusion_layer into the
decoder, interpolates position embeddings, and loads into the flax model."""

import numpy as np
import pytest

import jax

from feddat_tpu.configs.core import AdapterSpec, AlbefBertConfig, AlbefModelConfig
from feddat_tpu.data.synthetic import SyntheticAlbefClient
from feddat_tpu.models.albef import AlbefModel, init_albef_params
from feddat_tpu.utils.checkpoint_convert import (
    convert_albef_checkpoint,
    interpolate_pos_embed,
    merge_pretrained,
)

H, HEADS, INTER, L_TEXT, FUSION, L_DEC = 32, 4, 64, 4, 2, 2
VOCAB, PATCH, IMG = 64, 16, 32


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _fake_albef_state_dict(rng, ckpt_grid=4):
    """Shapes mimic the reference checkpoint layout (``albef.py:204-241``)."""
    sd = {}
    n_ckpt = ckpt_grid * ckpt_grid
    sd["visual_encoder.cls_token"] = _rand(rng, 1, 1, H)
    sd["visual_encoder.pos_embed"] = _rand(rng, 1, n_ckpt + 1, H)
    sd["visual_encoder.patch_embed.proj.weight"] = _rand(rng, H, 3, PATCH, PATCH)
    sd["visual_encoder.patch_embed.proj.bias"] = _rand(rng, H)
    for i in range(2):
        b = f"visual_encoder.blocks.{i}"
        sd[f"{b}.norm1.weight"] = _rand(rng, H)
        sd[f"{b}.norm1.bias"] = _rand(rng, H)
        sd[f"{b}.norm2.weight"] = _rand(rng, H)
        sd[f"{b}.norm2.bias"] = _rand(rng, H)
        sd[f"{b}.attn.qkv.weight"] = _rand(rng, 3 * H, H)
        sd[f"{b}.attn.qkv.bias"] = _rand(rng, 3 * H)
        sd[f"{b}.attn.proj.weight"] = _rand(rng, H, H)
        sd[f"{b}.attn.proj.bias"] = _rand(rng, H)
        vit_inter = 4 * H  # the model uses vision_mlp_ratio=4
        sd[f"{b}.mlp.fc1.weight"] = _rand(rng, vit_inter, H)
        sd[f"{b}.mlp.fc1.bias"] = _rand(rng, vit_inter)
        sd[f"{b}.mlp.fc2.weight"] = _rand(rng, H, vit_inter)
        sd[f"{b}.mlp.fc2.bias"] = _rand(rng, H)
    sd["visual_encoder.norm.weight"] = _rand(rng, H)
    sd["visual_encoder.norm.bias"] = _rand(rng, H)

    e = "text_encoder.bert.embeddings"
    sd[f"{e}.word_embeddings.weight"] = _rand(rng, VOCAB, H)
    sd[f"{e}.position_embeddings.weight"] = _rand(rng, 16, H)
    sd[f"{e}.token_type_embeddings.weight"] = _rand(rng, 2, H)
    sd[f"{e}.LayerNorm.weight"] = _rand(rng, H)
    sd[f"{e}.LayerNorm.bias"] = _rand(rng, H)
    for i in range(L_TEXT):
        b = f"text_encoder.bert.encoder.layer.{i}"
        for part in ("query", "key", "value"):
            sd[f"{b}.attention.self.{part}.weight"] = _rand(rng, H, H)
            sd[f"{b}.attention.self.{part}.bias"] = _rand(rng, H)
        sd[f"{b}.attention.output.dense.weight"] = _rand(rng, H, H)
        sd[f"{b}.attention.output.dense.bias"] = _rand(rng, H)
        sd[f"{b}.attention.output.LayerNorm.weight"] = _rand(rng, H)
        sd[f"{b}.attention.output.LayerNorm.bias"] = _rand(rng, H)
        if i >= FUSION:
            for part in ("query", "key", "value"):
                sd[f"{b}.crossattention.self.{part}.weight"] = _rand(rng, H, H)
                sd[f"{b}.crossattention.self.{part}.bias"] = _rand(rng, H)
            sd[f"{b}.crossattention.output.dense.weight"] = _rand(rng, H, H)
            sd[f"{b}.crossattention.output.dense.bias"] = _rand(rng, H)
            sd[f"{b}.crossattention.output.LayerNorm.weight"] = _rand(rng, H)
            sd[f"{b}.crossattention.output.LayerNorm.bias"] = _rand(rng, H)
        sd[f"{b}.intermediate.dense.weight"] = _rand(rng, INTER, H)
        sd[f"{b}.intermediate.dense.bias"] = _rand(rng, INTER)
        sd[f"{b}.output.dense.weight"] = _rand(rng, H, INTER)
        sd[f"{b}.output.dense.bias"] = _rand(rng, H)
        sd[f"{b}.output.LayerNorm.weight"] = _rand(rng, H)
        sd[f"{b}.output.LayerNorm.bias"] = _rand(rng, H)
    # pretrain checkpoints carry the text encoder's BertForMaskedLM head
    # (no 'bert.' inside, no decoder.bias — HF ties it to cls.predictions.bias)
    c = "text_encoder.cls.predictions"
    sd[f"{c}.transform.dense.weight"] = _rand(rng, H, H)
    sd[f"{c}.transform.dense.bias"] = _rand(rng, H)
    sd[f"{c}.transform.LayerNorm.weight"] = _rand(rng, H)
    sd[f"{c}.transform.LayerNorm.bias"] = _rand(rng, H)
    sd[f"{c}.decoder.weight"] = _rand(rng, VOCAB, H)
    sd[f"{c}.bias"] = _rand(rng, VOCAB)
    return sd


def test_albef_surgery_and_load():
    rng = np.random.RandomState(0)
    sd = _fake_albef_state_dict(rng)
    n_patches = (IMG // PATCH) ** 2  # 4 != checkpoint's 16 -> interpolation
    converted = convert_albef_checkpoint(
        sd, num_patches_new=n_patches, fusion_layer=FUSION,
        num_text_layers=L_TEXT, decoder_layers=L_DEC, vision_layers=2,
    )
    # decoder layers came from encoder layers >= fusion_layer
    assert "text_decoder" in converted and "bert" in converted["text_decoder"]
    dec_q = converted["text_decoder"]["bert"]["encoder"]["fusion_layers"]["layer"]["attention"]["query"]["dense"]["kernel"]
    enc_q_src = sd[f"text_encoder.bert.encoder.layer.{FUSION}.attention.self.query.weight"]
    np.testing.assert_allclose(dec_q[0], enc_q_src.T, rtol=1e-6)

    # pos-embed interpolated 16+1 -> 4+1
    assert converted["visual_encoder"]["pos_embed"].shape == (1, n_patches + 1, H)

    # the encoder's MLM head moved into the decoder (reference surgery moves
    # every non-layer text_encoder key to text_decoder, ``albef.py:224-239``)
    assert "cls" in converted["text_decoder"], "decoder LM head dropped by surgery"
    # the vocab-projection kernel is TIED to the word embeddings (HF
    # tie_weights, xbert.py:1197-1202) — only the bias is converted
    assert "kernel" not in converted["text_decoder"]["cls"]["decoder"]
    np.testing.assert_allclose(
        converted["text_decoder"]["cls"]["decoder"]["bias"],
        sd["text_encoder.cls.predictions.bias"], rtol=1e-6,
    )

    bert = AlbefBertConfig(
        vocab_size=VOCAB, hidden_size=H, num_layers=L_TEXT, num_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=16,
        hidden_dropout=0.0, attention_dropout=0.0, fusion_layer=FUSION,
    )
    cfg = AlbefModelConfig(
        image_res=IMG, patch_size=PATCH, vision_width=H, vision_layers=2,
        vision_heads=HEADS, bert=bert, decoder_layers=L_DEC,
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
    )
    client = SyntheticAlbefClient(
        task_key="c", num_train=4, num_eval=4, num_answers=8, vocab_size=VOCAB,
        question_len=6, answer_len=4, image_size=(IMG, IMG), batch_size=4,
    )
    model = AlbefModel(cfg)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    loaded = merge_pretrained(params, converted)
    # the loaded backbone leaves equal the converted tensors
    got = np.asarray(
        loaded["text_encoder"]["embeddings"]["word_embeddings"]["embedding"]
    )
    np.testing.assert_allclose(got, sd["text_encoder.bert.embeddings.word_embeddings.weight"], rtol=1e-6)
    # tied vocab projection: the decoder's word embeddings (copied from the
    # text encoder by the no-decoder surgery) ARE the LM projection kernel
    got_dec_embed = np.asarray(
        loaded["text_decoder"]["bert"]["embeddings"]["word_embeddings"]["embedding"]
    )
    np.testing.assert_allclose(
        got_dec_embed, sd["text_encoder.bert.embeddings.word_embeddings.weight"], rtol=1e-6
    )
    got_cls_bias = np.asarray(loaded["text_decoder"]["cls"]["decoder"]["bias"])
    np.testing.assert_allclose(
        got_cls_bias, sd["text_encoder.cls.predictions.bias"], rtol=1e-6
    )
    # and the model still runs
    loss, _ = model.apply({"params": loaded}, batch, adapter_mode="ensemble", deterministic=True)
    assert np.isfinite(float(loss))


def test_interpolate_pos_embed_identity_and_resize():
    rng = np.random.RandomState(1)
    pos = rng.randn(1, 17, 8).astype(np.float32)
    same = interpolate_pos_embed(pos, 16)
    np.testing.assert_array_equal(same, pos)
    up = interpolate_pos_embed(pos, 64)
    assert up.shape == (1, 65, 8)
    np.testing.assert_array_equal(up[:, 0], pos[:, 0])  # CLS slot untouched


def test_interpolate_pos_embed_noop_at_nonsquare_target():
    """A source already at the (non-square) target patch count is a no-op
    instead of tripping the square-source assert (regression: re-converting
    weights saved after a full-size 384x640 run crashed)."""
    rng = np.random.RandomState(2)
    pos = rng.randn(1, 1 + 240, 8).astype(np.float32)  # already 12x20
    np.testing.assert_array_equal(interpolate_pos_embed(pos, (12, 20)), pos)


def test_half_precision_checkpoint_tensors():
    """fp16/bf16 .pth checkpoints convert: torch ``.numpy()`` raises on
    bfloat16 and CPU bicubic interpolate rejects fp16, so ``_t`` upcasts."""
    torch = pytest.importorskip("torch")
    from feddat_tpu.utils.checkpoint_convert import _t

    for dtype in (torch.bfloat16, torch.float16):
        w = torch.randn(4, 3, dtype=torch.float32).to(dtype)
        out = _t(w)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, w.float().numpy())
    # and the full pos-embed path resizes a half-precision tensor
    pos = torch.randn(1, 17, 8, dtype=torch.float32).to(torch.bfloat16)
    up = interpolate_pos_embed(_t(pos), 64)
    assert up.shape == (1, 65, 8) and np.isfinite(up).all()


def test_interpolate_pos_embed_non_square():
    """ViLT's (384, 640) canvas is a 12x20 patch grid; the converter must
    resize square checkpoint grids onto non-square targets (regression:
    full-size CLI runs crashed on pos-embed shape mismatch)."""
    rng = np.random.RandomState(0)
    pos = rng.randn(1, 1 + 144, 8).astype(np.float32)  # 12x12 source
    out = interpolate_pos_embed(pos, (12, 20))
    assert out.shape == (1, 1 + 240, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # CLS slot untouched
    with np.testing.assert_raises(AssertionError):
        interpolate_pos_embed(pos, 240)  # non-square int target rejected
