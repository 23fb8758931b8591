"""Round-3 review fixes: data-dir rooting, --val_batch_size, task-key
validation, per-task schedule horizons, metrics run markers, the shared
u8 canvas pack."""

import json
import os

import numpy as np
import pytest

from feddat_tpu.configs.tasks import TASK_CONFIGS, resolve_clients
from feddat_tpu.data.tokenizer import WordPieceTokenizer


def test_resolve_clients_rejects_unknown_keys_in_sequence():
    with pytest.raises(KeyError, match="abstrct"):
        resolve_clients(["art", "abstrct"])
    assert resolve_clients(["art", "gqa"]) == ("art", "gqa")


def test_fed_task_dirs_are_climb_relative():
    """Every built-in task's data_dir roots under --climb_data_dir (the
    reference joins climb_data_dir onto the task config's data_dir,
    ``train_vqa_crossvqa.py:97-98``); hardcoded './data' prefixes would make
    the example pickles resolve CWD-relative while ans2label/images follow
    the flag."""
    from feddat_tpu.configs.tasks import CLIENT_SETS

    # built-in keys only: other tests register tmpdir (absolute) tasks into
    # the shared registry, which are explicitly join-transparent
    builtin = {k for keys in CLIENT_SETS.values() for k in keys}
    builtin |= {"vqa", "nlvr2", "snli-ve", "vcr"}
    for key in builtin:
        spec = TASK_CONFIGS[key]
        assert not os.path.isabs(spec.data_dir), (key, spec.data_dir)
        assert not spec.data_dir.startswith("./data"), (key, spec.data_dir)


def test_cached_paths_root_under_climb_dir():
    from feddat_tpu.data.datasets import ans2label_path, cached_data_path

    spec = TASK_CONFIGS["gqa"]
    data_dir = os.path.join("/mnt/climb", spec.data_dir)
    assert cached_data_path("gqa", data_dir, "train").startswith("/mnt/climb/")
    assert ans2label_path("gqa", data_dir, "/mnt/climb").startswith("/mnt/climb/")


def _mini_examples(n):
    from feddat_tpu.data.datasets import VQAExample

    return [
        VQAExample(question_id=i, image_id=f"img{i}", question=f"what is {i}",
                   labels=[i % 3], scores=[1.0], answers=["a"])
        for i in range(n)
    ]


class _BlackBackend:
    def load(self, image_id):
        from PIL import Image

        return Image.new("RGB", (16, 16))

    def path_for(self, image_id):
        # classification pipelines pass path_for's result to PIL; handing a
        # PIL image back short-circuits the disk read (tests only)
        return self.load(image_id)


TOK = WordPieceTokenizer.toy(["what", "is"] + [str(i) for i in range(10)])


def test_val_batch_size_drives_eval_batches():
    from feddat_tpu.data.pipeline import ViltVQAPipeline

    pipe = ViltVQAPipeline(
        _mini_examples(7), _BlackBackend(), TOK, num_labels=4,
        batch_size=2, val_batch_size=4, canvas=(16, 16), max_text_len=8,
        num_workers=0,
    )
    evs = list(pipe.eval_batches())
    assert len(evs) == 2  # ceil(7 / 4)
    assert evs[0]["input_ids"].shape[0] == 4
    assert evs[1]["valid"].tolist() == [1.0, 1.0, 1.0, 0.0]
    # train batches keep the train batch size
    tb = next(pipe.train_batches(0))
    assert tb["input_ids"].shape[0] == 2
    # SPMD eval-step metadata picks the eval batch size up
    from feddat_tpu.federated.spmd import client_eval_steps

    assert client_eval_steps(pipe) == 2


def test_val_batch_size_classification_and_albef():
    from feddat_tpu.data.albef_pipeline import AlbefVQAPipeline
    from feddat_tpu.data.classification_datasets import SnliVePipeline

    ex = [
        type("E", (), {"text": "what is 1", "image_id": f"img{i}", "label": i % 3})()
        for i in range(5)
    ]
    pipe = SnliVePipeline(
        ex, _BlackBackend(), TOK, 8, (16, 16), batch_size=2,
        val_batch_size=5, eval_examples=ex,
    )
    evs = list(pipe.eval_batches())
    assert len(evs) == 1 and evs[0]["input_ids"].shape[0] == 5

    apipe = AlbefVQAPipeline(
        _mini_examples(6), _BlackBackend(), TOK, ["a", "b"],
        image_size=16, batch_size=2, val_batch_size=3, num_workers=0,
    )
    aevs = list(apipe.eval_batches())
    assert len(aevs) == 2 and aevs[0]["pixel_values"].shape[0] == 3


def test_metrics_logger_run_start_marker(tmp_path):
    from feddat_tpu.utils.observability import MetricsLogger

    p = tmp_path / "m.jsonl"
    m = MetricsLogger(str(p), log_every=1)
    m.step({"loss": 1.0}, batch_size=2)
    m.close()
    # a relaunch appends a second run with its own boundary marker
    m2 = MetricsLogger(str(p), log_every=1)
    m2.close()
    kinds = [json.loads(l)["kind"] for l in p.read_text().splitlines()]
    assert kinds == ["run_start", "step", "run_start"]


def test_setup_logger_idempotent(tmp_path):
    import logging

    from feddat_tpu.utils.observability import setup_logger

    name = "feddat_tpu_test_dedup"
    lg1 = setup_logger(str(tmp_path), name=name, run_name="r")
    n1 = len(lg1.handlers)
    lg2 = setup_logger(str(tmp_path), name=name, run_name="r")
    assert len(lg2.handlers) == n1  # no stacked duplicate handlers
    assert any(type(h) is logging.StreamHandler for h in lg2.handlers)


def test_pack_u8_canvas_matches_pipeline_u8_batch():
    from feddat_tpu.data.images import pack_u8_canvas
    from feddat_tpu.data.pipeline import ViltVQAPipeline

    pipe = ViltVQAPipeline(
        _mini_examples(3), _BlackBackend(), TOK, num_labels=4,
        batch_size=3, canvas=(16, 16), max_text_len=8, num_workers=0,
        pixels_u8=True,
    )
    b = next(pipe.train_batches(0))
    assert b["pixel_values"].dtype == np.uint8
    assert b["pixel_mask"].shape == (3, 2)
    # serving and training share one canvas-pack definition
    u8s = [pipe._load_u8(e) for e in pipe.examples]
    px, dims = pack_u8_canvas(u8s, (16, 16))
    assert px.shape == b["pixel_values"].shape
    assert dims.shape == b["pixel_mask"].shape


def test_engine_per_task_num_epochs_override():
    """The schedule horizon uses the task config's num_epochs for
    non-federated tasks (``train_nlvr2.py:85-93``): with warmup off and a
    linear decay, step 0's LR is lr * (1 - 0/max_steps) = lr for both, but
    step 1 differs (horizon 2 decays to lr/2; horizon 20 to 19/20 lr)."""
    import jax

    from conftest import TINY_VILT, tiny_batch
    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.train.dat import init_train_state

    rng = np.random.RandomState(0)
    batch = tiny_batch(rng, 2)

    class OneBatchData:
        steps_per_epoch = 1
        num_train_examples = 2
        num_eval_examples = 2
        batch_size = 2

        def train_batches(self, epoch=0):
            yield dict(batch)

        def eval_batches(self):
            b = dict(batch)
            b["valid"] = np.ones(2, np.float32)
            yield b

    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        encoder_name="vilt", peft_mode=PEFTMode.DAT, tasks=("t",),
        batch_size=2, optimizer=OptimizerConfig(lr=1e-3, warmup_ratio=0.0),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1),
        num_epochs=20, dtype="float32",
    )

    def second_lr(trainer):
        c = trainer.clients[0]
        st = init_train_state(trainer.server_params, c.partitioner, c.opt_cfg,
                              jax.random.PRNGKey(1))
        st, _ = c.train_step(st, batch)  # DAT ticks the clock by 2
        _, metrics = c.train_step(st, batch)
        return float(metrics["lr"])

    tr_default = FederatedTrainer(model, params, {"t": OneBatchData()}, cfg)
    tr_override = FederatedTrainer(
        model, params, {"t": OneBatchData()}, cfg, num_epochs_overrides={"t": 2}
    )
    lr_d, lr_o = second_lr(tr_default), second_lr(tr_override)
    assert lr_d != lr_o
    assert lr_d > lr_o  # shorter horizon decays faster


def test_partitioner_head_match_is_component_exact():
    """A task key that prefixes another key must not pull the other task's
    head into this client's optimizer (weight decay would shrink it every
    step despite zero gradients)."""
    import jax

    from conftest import TINY_VILT, tiny_batch
    from feddat_tpu.configs.core import PEFTMode
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.train.dat import Partitioner

    model = ViltContinualLearner(
        TINY_VILT,
        {"vqa": TaskHeadSpec(num_labels=16), "vqa_rad": TaskHeadSpec(num_labels=16)},
    )
    params = init_vilt_params(model, jax.random.PRNGKey(0),
                              tiny_batch(np.random.RandomState(0), 2))
    part = Partitioner(params, "vqa", PEFTMode.DAT)
    joined = ["/".join(str(s) for s in p) for p in part.head_paths]
    assert any("task_vqa/" in j or j.startswith("task_vqa/") for j in joined)
    assert not any("task_vqa_rad" in j for j in joined), joined


def test_latest_round_ignores_stray_entries(tmp_path):
    from feddat_tpu.utils.checkpointing import latest_round

    (tmp_path / "round_00003").mkdir()
    (tmp_path / "round_00012_old").mkdir()
    (tmp_path / "round_7").mkdir()
    assert latest_round(str(tmp_path)) == 3


def test_finalize_canvas_batch_rejects_non_rgb():
    from feddat_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    gray = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match=r"\[h, w, 3\]"):
        native.finalize_canvas_batch([gray], (16, 16), [0.5] * 3, [0.5] * 3)


def test_initialize_multihost_failure_propagates(monkeypatch):
    import jax

    from feddat_tpu.parallel import mesh as mesh_mod

    def boom(**kw):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="refusing"):
        mesh_mod.initialize_multihost()

    # jax 0.9.0's actual double-init wording (no "already" in it)
    def already(**kw):
        raise RuntimeError("distributed.initialize should only be called once.")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    assert mesh_mod.initialize_multihost() == jax.process_count()

    def already_old(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already_old)
    assert mesh_mod.initialize_multihost() == jax.process_count()


def test_joint_step_rejects_nonunit_adapter_scaling():
    from feddat_tpu.train.dat import dat_step_core_joint

    with pytest.raises(ValueError, match="scaling == 1.0"):
        dat_step_core_joint(
            None, None, None, None, None, 10, adapter_scaling=0.5
        )


def test_fused_attention_oversize_routes_to_xla():
    """'fused' holds all-heads [H,S,S] fp32 tiles in VMEM; grids past the
    16 MiB scoped budget (ALBEF's S=577, PERF.md) must fall back to XLA
    instead of failing to compile deep inside jit."""
    import jax
    import jax.numpy as jnp

    from feddat_tpu.ops.attention import dot_product_attention, mask_to_bias

    rng = np.random.RandomState(0)
    B, H, S, D = 1, 12, 320, 16  # 4*12*320^2*4 B ~ 19.7 MiB > 16 MiB
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    bias = mask_to_bias(jnp.ones((B, S)))
    out_fused = dot_product_attention(q, k, v, bias, impl="fused")
    out_xla = dot_product_attention(q, k, v, bias, impl="xla")
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla), rtol=1e-6)


def test_attn_block_prep_broadcast_batch_bias():
    """A batch-broadcast [1,1,1,S] bias expands instead of crashing the
    kernel-entry reshape."""
    import jax.numpy as jnp

    from feddat_tpu.ops.attn_block import _prep

    x = jnp.zeros((2, 8, 4), jnp.float32)
    bias = jnp.zeros((1, 1, 1, 8), jnp.float32)
    out = _prep(x, bias, 1)
    # _prep returns (x_padded, brow, ...); the bias row must carry B=2
    assert out[1].shape[0] == 2


def test_profile_dir_traces_first_round(tmp_path):
    """--profile_dir captures a jax.profiler trace of the first executed
    round (works on CPU; viewable in TensorBoard/xprof)."""
    import jax

    from conftest import TINY_VILT, tiny_batch
    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    rng = np.random.RandomState(0)
    batch = tiny_batch(rng, 2)

    class OneBatchData:
        steps_per_epoch = 1
        num_train_examples = 2
        num_eval_examples = 2
        batch_size = 2

        def train_batches(self, epoch=0):
            yield dict(batch)

        def eval_batches(self):
            b = dict(batch)
            b["valid"] = np.ones(2, np.float32)
            yield b

    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        encoder_name="vilt", peft_mode=PEFTMode.DAT, tasks=("t",),
        batch_size=2, optimizer=OptimizerConfig(lr=1e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1, dtype="float32",
    )
    prof = tmp_path / "trace"
    tr = FederatedTrainer(model, params, {"t": OneBatchData()}, cfg,
                          profile_dir=str(prof))
    tr.run(resume=False)
    dumped = list(prof.rglob("*"))
    assert any(p.is_file() for p in dumped), f"no trace files under {prof}"


def test_graceful_preemption_checkpoints_and_exits(tmp_path):
    """SIGTERM mid-run: the engine finishes the round in flight, writes its
    checkpoint, and exits cleanly instead of dying mid-update (SURVEY §5.3;
    preemptible TPU fleets deliver exactly this signal)."""
    import os
    import signal

    import jax

    from conftest import TINY_VILT, tiny_batch
    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.utils.checkpointing import latest_round

    rng = np.random.RandomState(0)
    batch = tiny_batch(rng, 2)

    class SignalingData:
        """Delivers SIGTERM while round 1's batches are being consumed."""

        steps_per_epoch = 1
        num_train_examples = 2
        num_eval_examples = 2
        batch_size = 2
        rounds_seen = 0

        def train_batches(self, epoch=0):
            if self.rounds_seen == 1:
                os.kill(os.getpid(), signal.SIGTERM)
            self.rounds_seen += 1
            yield dict(batch)

        def eval_batches(self):
            b = dict(batch)
            b["valid"] = np.ones(2, np.float32)
            yield b

    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        encoder_name="vilt", peft_mode=PEFTMode.DAT, tasks=("t",),
        batch_size=2, optimizer=OptimizerConfig(lr=1e-3),
        federated=FederatedConfig(comm_rounds=4, local_epochs=1, eval_every=1),
        num_epochs=1, dtype="float32",
    )
    ckpt = tmp_path / "ckpt"
    data = SignalingData()
    prev = signal.getsignal(signal.SIGTERM)
    tr = FederatedTrainer(model, params, {"t": data}, cfg, checkpoint_dir=str(ckpt))
    history = tr.run(resume=False)
    # stopped after round 1 of 4, with round 1 checkpointed
    assert data.rounds_seen == 2
    assert latest_round(str(ckpt)) == 1
    assert [h["round"] for h in history] == [0, 1]
    # the previous SIGTERM handler is restored on exit
    assert signal.getsignal(signal.SIGTERM) == prev


def test_fused_attention_broadcast_bias_matches_xla():
    """A [1,1,1,S] batch-broadcast bias stays on the fused fast path (the
    kernel expands it) and matches XLA."""
    import jax.numpy as jnp

    from feddat_tpu.ops.attention import dot_product_attention

    rng = np.random.RandomState(0)
    B, H, S, D = 2, 2, 24, 8
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    bias = jnp.where(jnp.arange(S) < 20, 0.0, -10000.0)[None, None, None, :]
    out_f = dot_product_attention(q, k, v, bias, impl="fused")
    out_x = dot_product_attention(q, k, v, bias, impl="xla")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=2e-5, atol=2e-6)


def test_run_single_task_then_run_starts_from_init(tmp_path):
    """run_single_task leaves NO baseline-trained personal state behind: a
    following run() starts its clients from the initial partitions."""
    import jax

    from conftest import TINY_VILT, tiny_batch
    from feddat_tpu.configs.core import (
        FederatedConfig,
        OptimizerConfig,
        PEFTMode,
        TrainConfig,
    )
    from feddat_tpu.federated.engine import FederatedTrainer
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params

    rng = np.random.RandomState(0)
    batch = tiny_batch(rng, 2)

    class OneBatchData:
        steps_per_epoch = 1
        num_train_examples = 2
        num_eval_examples = 2
        batch_size = 2

        def train_batches(self, epoch=0):
            yield dict(batch)

        def eval_batches(self):
            b = dict(batch)
            b["valid"] = np.ones(2, np.float32)
            yield b

    model = ViltContinualLearner(TINY_VILT, {"t": TaskHeadSpec(num_labels=16)})
    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(
        encoder_name="vilt", peft_mode=PEFTMode.DAT, tasks=("t",),
        batch_size=2, optimizer=OptimizerConfig(lr=1e-3),
        federated=FederatedConfig(comm_rounds=1, local_epochs=1, eval_every=1),
        num_epochs=1, dtype="float32",
    )
    tr = FederatedTrainer(model, params, {"t": OneBatchData()}, cfg)
    import jax.numpy as jnp
    from flax import traverse_util

    before = {
        k: np.asarray(v)
        for k, v in traverse_util.flatten_dict(tr.personal["t"]).items()
    }
    tr.run_single_task()
    after = traverse_util.flatten_dict(tr.personal["t"])
    for k, v in before.items():
        np.testing.assert_array_equal(v, np.asarray(after[k]), err_msg=str(k))
