"""Tensor-parallel (model axis) sharding: numerics + actual distribution.

SURVEY §2.7's "(+ optional model axis for larger backbones)": Megatron-style
column/row layout expressed through jax.sharding only, collectives inserted
by GSPMD.  Verified on the virtual 8-device CPU mesh (data=2 x model=4).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from feddat_tpu.parallel.tp import (
    MODEL_AXIS,
    make_tp_mesh,
    shard_params_tp,
    tp_forward,
    tp_spec_for,
)

from conftest import TINY_VILT, tiny_batch


def _setup():
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    batch = tiny_batch(np.random.RandomState(0), batch_size=4)
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_tp_specs_cover_the_transformer_stacks():
    _, params, _ = _setup()
    flat = traverse_util.flatten_dict(params)
    sharded_paths = [
        "/".join(map(str, p)) for p, v in flat.items()
        if MODEL_AXIS in jax.tree_util.tree_leaves(tuple(tp_spec_for(p, v)))
    ]
    # every layer's attention projections + FFN must be TP-sharded
    assert any("attention/query/dense/kernel" in p for p in sharded_paths)
    assert any("attention/out/kernel" in p for p in sharded_paths)
    assert any("mlp/intermediate/kernel" in p for p in sharded_paths)
    assert any("mlp/output/kernel" in p for p in sharded_paths)
    # trainable PEFT partitions and norms stay replicated — including every
    # bias (in PEFTMode.BIAS the biases ARE the trainable partition)
    assert not any("adapter" in p for p in sharded_paths)
    assert not any("norm" in p for p in sharded_paths)
    assert not any("task_" in p for p in sharded_paths)
    assert not any(p.endswith("bias") for p in sharded_paths)


def test_tp_forward_matches_single_device():
    model, params, batch = _setup()

    # single-device reference
    ref = model.apply(
        {"params": params}, "t", batch, adapter_mode="ensemble", deterministic=True
    )[1]

    mesh = make_tp_mesh(model_parallel=4, data_parallel=2)
    sharded = shard_params_tp(params, mesh)

    # params are ACTUALLY distributed: a column-parallel kernel's shard
    # holds 1/4 of the output features
    flat = traverse_util.flatten_dict(sharded)
    for p, v in flat.items():
        j = "/".join(map(str, p))
        if j.endswith("mlp/intermediate/kernel"):
            shard = v.addressable_shards[0].data
            assert shard.shape[-1] == v.shape[-1] // 4, (j, shard.shape)
        if j.endswith("mlp/output/kernel"):
            shard = v.addressable_shards[0].data
            assert shard.shape[-2] == v.shape[-2] // 4, (j, shard.shape)

    fn, place_batch = tp_forward(model, mesh, task_key="t")
    out = fn(sharded, place_batch(batch))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_tp_forward_albef():
    import dataclasses

    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from test_albef import TINY_ALBEF, TINY_BERT

    acfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.0, attention_dropout=0.0),
    )
    client = SyntheticAlbefClient(
        task_key="c", num_train=8, num_eval=4, num_answers=8, vocab_size=64,
        question_len=6, answer_len=4, image_size=(32, 32), batch_size=4, seed=0,
    )
    model = AlbefModel(acfg)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)
    ref = model.apply(
        {"params": params}, batch, adapter_mode="ensemble", deterministic=True
    )[0]

    mesh = make_tp_mesh(model_parallel=4, data_parallel=2)
    sharded = shard_params_tp(params, mesh)
    fn, place_batch = tp_forward(model, mesh)
    out = fn(sharded, place_batch(batch))
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-5)


def test_tp_cli_guards():
    """--tp composes with BOTH engines since round 5 (sequential over
    (data, model); spmd over (client, data, model) — tests/test_tp_spmd.py)
    but stays single-controller; every Pallas attention kernel is a custom
    call that does not partition over the model axis, so --tp forces
    attn_impl back to 'auto'."""
    import pytest

    from feddat_tpu.cli import apply_tp_arg_guards, build_parser

    parser = build_parser()
    # spmd+tp is accepted (the composition is validated in test_tp_spmd.py)
    args = parser.parse_args([
        "--encoder_name", "vilt", "--optimizer_mode", "dat",
        "--engine", "spmd", "--tp", "2",
        "--ordered_cl_tasks", "domain", "--climb_data_dir", "/x",
    ])
    apply_tp_arg_guards(args)  # must not raise

    base = ["--encoder_name", "vilt", "--optimizer_mode", "dat",
            "--ordered_cl_tasks", "domain", "--climb_data_dir", "/x",
            "--engine", "sequential", "--tp", "2"]
    for impl in ("block", "flash", "fused"):
        args = parser.parse_args(base + ["--attn_impl", impl])
        apply_tp_arg_guards(args)
        assert args.attn_impl == "auto"
    args = parser.parse_args(base + ["--multihost"])
    with pytest.raises(SystemExit, match="single-controller"):
        apply_tp_arg_guards(args)
    # no-op below the threshold
    args = parser.parse_args(base[:-1] + ["1", "--attn_impl", "block"])
    apply_tp_arg_guards(args)
    assert args.attn_impl == "block"


def test_tp_training_step_by_placement():
    """TP composes with the existing train steps by PLACEMENT alone: shard
    the frozen backbone over the model axis (that's where the memory is),
    keep the trainable PEFT partitions replicated, run the standard DAT
    step — GSPMD partitions the program and the result matches the
    replicated run.  (The Pallas block kernel is exempt: custom calls
    don't auto-partition — use attn_impl='auto' with TP.)"""
    from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
    from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
    from feddat_tpu.train.forwards import make_vilt_forward

    model, params, batch = _setup()
    forward = make_vilt_forward(model, "t")
    part = Partitioner(params, "t", PEFTMode.DAT)
    opt = OptimizerConfig(lr=5e-3)
    step = make_dat_train_step(forward, part, opt, max_steps=10, donate=False)

    # replicated reference: two steps
    s_ref = init_train_state(params, part, opt, jax.random.PRNGKey(3))
    for _ in range(2):
        s_ref, m_ref = step(s_ref, batch)

    # TP: backbone sharded, trainables replicated (tp_spec_for already
    # keeps adapters/heads replicated)
    mesh = make_tp_mesh(model_parallel=4, data_parallel=2)
    s_tp = init_train_state(params, part, opt, jax.random.PRNGKey(3))
    s_tp = s_tp.replace(params=shard_params_tp(s_tp.params, mesh))
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_tp = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    for _ in range(2):
        s_tp, m_tp = step(s_tp, batch_tp)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_tp["loss"]), rtol=2e-5)
    ref_flat = traverse_util.flatten_dict(s_ref.params)
    tp_flat = traverse_util.flatten_dict(s_tp.params)
    for p in part.shared_paths | part.local_paths | part.head_paths:
        np.testing.assert_allclose(
            np.asarray(ref_flat[p]), np.asarray(tp_flat[p]),
            rtol=2e-5, atol=2e-6, err_msg=str(p),
        )


def test_tp_engine_round_matches_replicated():
    """The FULL sequential-engine round under ``tp_mesh`` (params sharded in
    __init__, batches through the sharded prefetcher) matches the replicated
    engine — this covers the engine WIRING, not just the step numerics."""
    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.data.synthetic import SyntheticVQAClient
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from conftest import TINY_VILT

    def make_clients():
        return {
            f"cl_{i}": SyntheticVQAClient(
                task_key=f"cl_{i}", num_train=8, num_eval=4, num_labels=16,
                vocab_size=TINY_VILT.vocab_size, text_len=TINY_VILT.max_text_len,
                image_size=TINY_VILT.image_size, batch_size=4, seed=i,
            )
            for i in range(2)
        }

    clients = make_clients()
    heads = {k: TaskHeadSpec(num_labels=16) for k in clients}
    model = ViltContinualLearner(TINY_VILT, heads)
    batch = next(next(iter(clients.values())).train_batches(0))
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        peft_mode=PEFTMode.DAT,
        optimizer=OptimizerConfig(lr=5e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=4,
        seed=0,
    )

    t_ref = FederatedTrainer(model, params, make_clients(), cfg)
    t_ref.run_round(0)

    mesh = make_tp_mesh(model_parallel=4, data_parallel=2)
    t_tp = FederatedTrainer(model, params, make_clients(), cfg, tp_mesh=mesh)
    t_tp.run_round(0)

    ref_flat = traverse_util.flatten_dict(t_ref.server_params)
    tp_flat = traverse_util.flatten_dict(t_tp.server_params)
    for p in ref_flat:
        np.testing.assert_allclose(
            np.asarray(ref_flat[p]), np.asarray(tp_flat[p]),
            rtol=2e-5, atol=2e-6, err_msg=str(p),
        )


def test_tp_albef_dat_step_by_placement():
    """The ALBEF (LM-loss) DAT step under TP placement matches replicated."""
    import dataclasses

    from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
    from feddat_tpu.data.synthetic import SyntheticAlbefClient
    from feddat_tpu.models.albef import AlbefModel, init_albef_params
    from feddat_tpu.train.dat import Partitioner, init_train_state, make_dat_train_step
    from feddat_tpu.train.forwards import make_albef_forward
    from jax.sharding import NamedSharding, PartitionSpec as P
    from test_albef import TINY_ALBEF, TINY_BERT

    acfg = dataclasses.replace(
        TINY_ALBEF,
        bert=dataclasses.replace(TINY_BERT, hidden_dropout=0.0, attention_dropout=0.0),
    )
    client = SyntheticAlbefClient(
        task_key="c", num_train=8, num_eval=4, num_answers=8, vocab_size=64,
        question_len=6, answer_len=4, image_size=(32, 32), batch_size=4, seed=0,
    )
    model = AlbefModel(acfg)
    batch = next(client.train_batches(0))
    params = init_albef_params(model, jax.random.PRNGKey(0), batch)

    forward = make_albef_forward(model)
    part = Partitioner(params, "c", PEFTMode.DAT)
    opt = OptimizerConfig(lr=5e-3)
    step = make_dat_train_step(forward, part, opt, max_steps=10, donate=False)

    s_ref = init_train_state(params, part, opt, jax.random.PRNGKey(3))
    s_ref, m_ref = step(s_ref, batch)

    mesh = make_tp_mesh(model_parallel=4, data_parallel=2)
    s_tp = init_train_state(params, part, opt, jax.random.PRNGKey(3))
    s_tp = s_tp.replace(params=shard_params_tp(s_tp.params, mesh))
    batch_tp = {
        k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()
    }
    s_tp, m_tp = step(s_tp, batch_tp)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_tp["loss"]), rtol=2e-5)
