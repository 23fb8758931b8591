"""ALBEF model family: forward, DAT step, rank_answer, momentum distill
(reference ``src/modeling/models/albef_model.py``)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from feddat_tpu.configs.core import (
    AdapterSpec,
    AlbefBertConfig,
    AlbefModelConfig,
    OptimizerConfig,
    PEFTMode,
)
from feddat_tpu.data.synthetic import SyntheticAlbefClient
from feddat_tpu.models.albef import AlbefModel, init_albef_params, momentum_update
from feddat_tpu.peft.partition import label_params
from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
from feddat_tpu.train.forwards import make_albef_forward

TINY_BERT = AlbefBertConfig(
    vocab_size=64,
    hidden_size=32,
    num_layers=4,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=16,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    fusion_layer=2,
)
TINY_ALBEF = AlbefModelConfig(
    image_res=32,
    patch_size=16,
    vision_width=32,
    vision_layers=2,
    vision_heads=4,
    bert=TINY_BERT,
    decoder_layers=2,
    adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
)


@pytest.fixture(scope="module")
def albef_setup():
    client = SyntheticAlbefClient(
        task_key="c0", num_train=16, num_eval=8, num_answers=8, vocab_size=64,
        question_len=6, answer_len=4, image_size=(32, 32), batch_size=4, seed=0,
    )
    model = AlbefModel(TINY_ALBEF)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    return model, params, client


def test_train_forward_shapes_and_loss(albef_setup):
    model, params, client = albef_setup
    batch = next(client.train_batches(0))
    loss, logits = jax.jit(
        lambda p, b: model.apply({"params": p}, b, adapter_mode="ensemble", deterministic=True)
    )(params, batch)
    B, A, La = batch["answer_ids"].shape
    assert logits.shape == (B * A, La - 1, TINY_BERT.vocab_size)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_albef_dat_step_decreases_loss_and_partitions(albef_setup):
    model, params, client = albef_setup
    batch = next(client.train_batches(0))
    forward = make_albef_forward(model)
    part = Partitioner(params, "fed", PEFTMode.DAT)
    assert part.head_paths, "decoder cls head must be in the head partition"
    opt = OptimizerConfig(lr=5e-3)
    state = init_train_state(params, part, opt, jax.random.PRNGKey(0))
    step = make_dat_train_step(forward, part, opt, max_steps=200, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(state.params)
    fl = traverse_util.flatten_dict(label_params(params))
    changed = collections.Counter()
    for k in f0:
        if not np.allclose(np.asarray(f0[k]), np.asarray(f1[k])):
            changed[fl[k]] += 1
    assert set(changed) == {"shared", "local", "head"}, dict(changed)


def test_rank_answer_contract(albef_setup):
    model, params, client = albef_setup
    batch = next(client.eval_batches())
    k = 4
    ids, probs = jax.jit(
        lambda p, b: model.apply(
            {"params": p},
            b,
            jnp.asarray(client.answer_ids),
            jnp.asarray(client.answer_mask),
            k,
            "ensemble",
            0,
            method=AlbefModel.rank_answer,
        )
    )(params, batch)
    B = batch["question_ids"].shape[0]
    assert ids.shape == (B, k) and probs.shape == (B, k)
    assert np.all((np.asarray(ids) >= 0) & (np.asarray(ids) < client.num_answers))
    p = np.asarray(probs)
    assert np.all(np.diff(p, axis=1) <= 1e-6), "rerank probs must be sorted desc"
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-3)


def test_albef_eval_step_counts_hits(albef_setup):
    from feddat_tpu.train.evaluation import make_albef_eval_step

    model, params, client = albef_setup
    step = make_albef_eval_step(model, client.answer_ids, client.answer_mask, k=4)
    total = 0.0
    for batch in client.eval_batches():
        total += float(step(params, batch, adapter_mode="ensemble"))
    assert 0.0 <= total <= client.num_eval


def test_momentum_distill_forward(albef_setup):
    from feddat_tpu.train.forwards import make_albef_distill_forward

    model, params, client = albef_setup
    batch = next(client.train_batches(0))
    batch = dict(batch, alpha=0.4)
    fwd = make_albef_distill_forward(model)
    aux0 = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), params)
    loss, logits, aux1 = jax.jit(lambda p, b, a: fwd(p, b, "ensemble", jax.random.PRNGKey(0), a))(
        params, batch, aux0
    )
    assert np.isfinite(float(loss))
    # EMA moved the zero twin toward the params
    leaf0 = traverse_util.flatten_dict(aux1)
    leafp = traverse_util.flatten_dict(params)
    key = next(iter(leafp))
    np.testing.assert_allclose(
        np.asarray(leaf0[key]), np.asarray(leafp[key]) * (1 - TINY_ALBEF.momentum), rtol=1e-5
    )


def test_decode_logits_grouped_cross_attention_matches_repeat(albef_setup):
    """cross_group=k (rank_answer/train layout) must equal the explicit
    per-candidate repeat of the question states."""
    model, params, client = albef_setup
    batch = next(client.train_batches(0))
    B, A, La = batch["answer_ids"].shape
    q = model.apply({"params": params}, batch["pixel_values"], batch["question_ids"],
                    batch["question_mask"], "ensemble", True,
                    method=AlbefModel.encode_question)
    ans_ids = batch["answer_ids"].reshape(B * A, La)
    ans_mask = batch["answer_mask"].reshape(B * A, La)
    q_rep = jnp.repeat(q, A, axis=0)
    q_att = jnp.repeat(jnp.asarray(batch["question_mask"]), A, axis=0)
    lo_rep = model.apply({"params": params}, ans_ids, ans_mask, q_rep, q_att,
                         "ensemble", True, method=AlbefModel.decode_logits)
    lo_grp = model.apply({"params": params}, ans_ids, ans_mask, q,
                         batch["question_mask"], "ensemble", True, cross_group=A,
                         method=AlbefModel.decode_logits)
    np.testing.assert_allclose(np.asarray(lo_grp), np.asarray(lo_rep), rtol=1e-5, atol=1e-6)


def test_xbert_masked_lm_smoke():
    """XBertMaskedLM (the reference's BertForMaskedLM port) — forward with
    and without labels/cross-attention; regression guard for signature
    drift (it has no other in-repo caller)."""
    from feddat_tpu.models.xbert import XBertMaskedLM

    cfg = AlbefBertConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, hidden_dropout=0.0, attention_dropout=0.0,
        fusion_layer=1,
    )
    m = XBertMaskedLM(cfg, AdapterSpec())
    rng = np.random.RandomState(5)
    ids = rng.randint(1, 100, size=(2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    v = m.init(jax.random.PRNGKey(0), ids, mask)
    logits = m.apply(v, ids, mask)
    assert logits.shape == (2, 8, 100)
    labels = np.where(rng.rand(2, 8) < 0.3, ids, -100).astype(np.int32)
    out = m.apply(v, ids, mask, labels=labels)
    loss = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(float(loss))
    # multimodal: cross-attend to encoder states from fusion_layer on
    enc = rng.randn(2, 5, 32).astype(np.float32)
    logits_mm = m.apply(v, ids, mask, encoder_hidden_states=enc)
    assert logits_mm.shape == (2, 8, 100)


def test_freeze_bottom_k_covers_all_towers(albef_setup):
    """FREEZE_BOTTOM_K on ALBEF: vision embeddings (patch_embed/pos_embed/
    cls_token) frozen; every stacked tower carries a leading-axis grad mask;
    fusion stacks (encoder AND decoder — the original BERT layers >=
    fusion_layer, per the checkpoint surgery) index from the text depth.
    The reference's ALBEF freeze helper is vestigial and crashes
    (``src/modeling/albef.py:82-92``); here the mode is well-defined."""
    model, params, client = albef_setup
    part = Partitioner(params, "fed", PEFTMode.FREEZE_BOTTOM_K, layers_to_freeze=3)
    trainable_joined = ["/".join(str(s) for s in p) for p in part.shared_paths]
    for name in ("patch_embed", "pos_embed", "cls_token", "embeddings"):
        assert not any(name in j for j in trainable_joined), name

    def masks(pred):
        sel = [p for p in part.shared_paths if pred(p)]
        assert sel, "tower missing from trainable set"
        out = set()
        for p in sel:
            assert p in part.grad_mask, p
            out.add(tuple(np.asarray(part.grad_mask[p]).reshape(-1).tolist()))
        assert len(out) == 1, out
        return next(iter(out))

    # vision: 2 blocks at global idx 0,1 -> all frozen under k=3
    assert masks(lambda p: "blocks" in p) == (0.0, 0.0)
    # text stack: layers 0,1 -> frozen
    assert masks(lambda p: "text_layers" in p) == (0.0, 0.0)
    # fusion stacks: global idx 2,3 -> [frozen, trainable], same for the
    # decoder (original layers >= fusion_layer)
    assert masks(lambda p: "fusion_layers" in p and p[0] == "text_encoder") == (0.0, 1.0)
    assert masks(lambda p: "fusion_layers" in p and p[0] == "text_decoder") == (0.0, 1.0)


def test_text_remat_policy_names_exact_grads(albef_setup):
    """``text_remat_policy='names'`` is a pure checkpointing change: loss and
    every gradient match the full-recompute default exactly (round-5 lever,
    PERF.md; the tags save qkv/attn_probs/attn_out/ffn_preact incl. the
    fusion layers' image K/V projections)."""
    import dataclasses

    model, params, client = albef_setup
    batch = next(client.train_batches(0))

    def grads_for(policy):
        cfg = dataclasses.replace(
            TINY_ALBEF, remat=True, text_remat_policy=policy
        )
        m = AlbefModel(cfg)

        def loss_fn(p):
            loss, _ = m.apply(
                {"params": p}, batch, adapter_mode="ensemble", deterministic=True
            )
            return loss

        return jax.jit(jax.value_and_grad(loss_fn))(params)

    l_full, g_full = grads_for("full")
    l_names, g_names = grads_for("names")
    assert float(l_full) == float(l_names)
    for a, b in zip(jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_names)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_dropout_rng_rbg_trains(albef_setup):
    """``dropout_rng='rbg'`` (TPU hardware RNG for mask bits) runs the fused
    DAT step with live dropout to finite decreasing loss; the state rng
    chain stays a plain threefry key (checkpoint/gating compatible)."""
    import dataclasses

    from feddat_tpu.train.trainers import make_albef_fused_dat_step

    model, params, client = albef_setup
    cfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.1, attention_dropout=0.1),
    )
    m = AlbefModel(cfg)
    batch = next(client.train_batches(0))
    part = Partitioner(params, "fed", PEFTMode.DAT)
    state = init_train_state(params, part, OptimizerConfig(lr=5e-3), jax.random.PRNGKey(0))
    step, _ = make_albef_fused_dat_step(
        m, params, OptimizerConfig(lr=5e-3), max_steps=100, dropout_rng="rbg"
    )
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # the state rng is still a raw threefry key array (uint32[2])
    assert np.asarray(state.rng).dtype == np.uint32


def test_rank_answer_pack_group_exact(albef_setup):
    """Candidate packing in the rerank decode (``eval_pack_group``) is a
    pure layout change: rank_answer's ids AND probabilities are identical
    to the unpacked reference layout (the -10000 bias fill underflows exp
    to exactly 0.0, so packed rows add exact zeros)."""
    import dataclasses

    model, params, client = albef_setup
    batch = next(client.eval_batches())
    eval_batch = {
        "pixel_values": batch["pixel_values"],
        "question_ids": batch["question_ids"],
        "question_mask": batch["question_mask"],
    }
    ids = np.asarray(client.answer_ids)
    mask = np.asarray(client.answer_mask)

    def run(g):
        m = AlbefModel(dataclasses.replace(TINY_ALBEF, eval_pack_group=g))
        return jax.jit(
            lambda p, b: m.apply(
                {"params": p}, b, jnp.asarray(ids), jnp.asarray(mask), 4,
                "ensemble", 0, method=AlbefModel.rank_answer,
            )
        )(params, eval_batch)

    ids1, probs1 = run(1)
    ids4, probs4 = run(4)
    ids2, probs2 = run(2)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids4))
    np.testing.assert_allclose(np.asarray(probs1), np.asarray(probs4), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    # a pack that does not divide k falls back to the unpacked layout
    ids3, _ = run(3)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids3))
