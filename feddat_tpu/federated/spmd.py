"""SPMD federated engine — clients as a mesh axis.

The TPU-performance path (SURVEY.md §2.7 "TPU-native equivalents"): instead
of the reference's sequential Python loop over ``deepcopy``'d client models
(``src/train/main.py:466-510``), ALL clients' local DAT training runs as one
jitted ``shard_map`` program over a ``(client, data)`` mesh:

  * backbone params: replicated (in_spec ``P()``);
  * per-client partitions (shared copy, local, teacher, head) + optimizer
    states: stacked with a leading ``[C]`` axis, sharded over ``client``;
  * batches: ``[C, B, ...]``, sharded over ``(client, data)``;
  * DP gradient sync inside a client: ``pmean`` over ``data`` (replaces
    NCCL allreduce, ``task_trainer.py:302,323``);
  * FedAvg: weighted mean over the stacked client axis — a single XLA
    reduction over ICI (replaces ``get_average_net``, ``main.py:50-65``).

Personal state stays device-resident and sharded between rounds: zero
host<->device traffic for parameters during the whole experiment.

Requirement: all clients share one head *shape* (true for the federated VQA
benchmark: every client has ``num_labels=100``, ``task_configs_fed.py:44``),
so heads stack into one bank.  Each client still trains and keeps its own
head values — personalization semantics are identical to the sequential
engine (tested for equivalence in ``tests/test_spmd.py``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode, TrainConfig
from feddat_tpu.models.adapters import MODE_ENSEMBLE
from feddat_tpu.parallel.mesh import CLIENT_AXIS, DATA_AXIS
from feddat_tpu.peft.partition import label_params
from feddat_tpu.train.dat import (
    Partitioner,
    dat_step_core,
    init_train_state,
    plain_step_core,
)
from feddat_tpu.train.state import TrainState

FED_HEAD_KEY = "fed"  # all SPMD clients share the head module task_{FED_HEAD_KEY}


def _stack_trees(trees: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def client_eval_steps(client) -> int:
    """Number of fixed-size eval batches a client yields: global metadata the
    multi-host eval loop needs so every process runs the same step count."""
    n = int(client.num_eval_examples)
    bs = int(getattr(client, "val_batch_size", None) or client.batch_size)
    return -(-n // bs)


class SPMDFederatedTrainer:
    """Runs federated DAT rounds as SPMD over a ``(client, data)`` mesh."""

    def __init__(
        self,
        model,
        params: Dict[str, Any],
        clients: Sequence[Any],  # ordered ClientData, one per mesh client slot
        config: TrainConfig,
        mesh: Mesh,
        make_forward: Optional[Callable] = None,
        use_fused: bool = False,
        checkpoint_dir: Optional[str] = None,
        metrics_logger=None,
        family: str = "vilt",
        answer_banks: Optional[Dict[str, Any]] = None,
        rank_k: int = 64,
        metric: str = "vqa_score",
        pad_token_id: int = 0,
        full_epochs: bool = False,
        profile_dir: Optional[str] = None,
    ):
        """``use_fused`` selects the single-ensemble-pass fused DAT core
        (exact when encoder dropout is off; +14% measured on ViLT).

        ``full_epochs``: run each round to the LARGEST client's step count
        (the reference's full-epoch-per-client loop, ``main.py:466-503``)
        instead of truncating to the smallest.  Exhausted clients ride along
        with gated (no-op) updates and their own schedule horizons, so the
        result is numerically identical to the sequential engine even with
        heterogeneous client sizes (``test_spmd_full_epochs_*``).  Default
        off: min-steps truncation keeps every mesh slot doing useful work.

        ``family``: ``"vilt"`` (classification head + VQA-score/accuracy
        eval) or ``"albef"`` (LM loss + rank-answer eval over per-client
        ``answer_banks[task_key] = (ids, mask)``, stacked and sharded over
        the client axis).  All PEFT modes run: DAT uses the 3-stage core,
        the rest the single-update core, each with ``pmean`` DP grad sync.
        """
        self.checkpoint_dir = checkpoint_dir
        self.metrics = metrics_logger
        # jax.profiler trace of the first executed round (SURVEY §5.1);
        # multi-host: every process traces to its own profile_dir subtree
        self.profile_dir = profile_dir
        self.family = family
        self.model = model
        self.config = config
        self.mesh = mesh
        # Optional tensor-parallel composition (SURVEY §2.7's "(clients,
        # data) + optional model axis"): a mesh carrying a ``model`` axis
        # runs each client slot's step TP-sharded.  The engine stays manual
        # over (client, data) only — shard_map's ``axis_names`` excludes the
        # model axis, so GSPMD sees the backbone's parallel.tp layout on it
        # and inserts the per-layer all-reduces (the sequential --tp path's
        # exact sharding, now per client slot).
        from feddat_tpu.parallel.tp import MODEL_AXIS

        self._model_parallel = (
            int(mesh.shape[MODEL_AXIS]) if MODEL_AXIS in mesh.axis_names else 1
        )
        self._manual_axes = frozenset({CLIENT_AXIS, DATA_AXIS})
        self.clients = list(clients)
        C = mesh.shape[CLIENT_AXIS]
        if len(self.clients) != C:
            raise ValueError(f"{len(self.clients)} clients for client-axis size {C}")
        self.num_clients = C

        # -- multi-host data topology (SURVEY §5.8; replaces the reference's
        # accelerate multi-process launch, accelerate_config.yaml:1-11).
        # Each process FEEDS only the client slots whose devices it hosts
        # (``clients_for_process``); global [C, ...] arrays are assembled
        # from process-local shards via make_array_from_process_local_data —
        # no host ever materializes another host's batches.  Remote clients'
        # data objects are touched for cheap metadata only (sizes/task_key).
        from feddat_tpu.parallel.mesh import clients_for_process

        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()
        self._multihost = self.num_processes > 1
        if self._multihost:
            self.local_slots = clients_for_process(
                mesh.devices, lambda d: d.process_index, self.process_index
            )
            for c in range(C):
                procs = {d.process_index for d in np.asarray(mesh.devices[c]).flat}
                if len(procs) > 1:
                    raise ValueError(
                        f"client slot {c}'s data-parallel group spans processes "
                        f"{sorted(procs)}; use make_multihost_mesh so each "
                        "client's devices are process-local (its batches are "
                        "fed by the hosting process)"
                    )
            if not self.local_slots:
                raise ValueError(
                    f"process {self.process_index} hosts no client slots; "
                    "shrink the process count or grow the client axis"
                )
        else:
            self.local_slots = list(range(C))

        if make_forward is None:
            if family == "albef":
                from feddat_tpu.train.forwards import make_albef_forward

                make_forward = lambda m, k: make_albef_forward(m, pad_token_id)
            else:
                make_forward = self._default_vilt_forward
        forward = make_forward(model, FED_HEAD_KEY)

        self.partitioner = Partitioner(
            params, FED_HEAD_KEY, config.peft_mode,
            layers_to_freeze=config.layers_to_freeze,
        )
        P_ = self.partitioner
        from flax import traverse_util

        flat_labels = traverse_util.flatten_dict(label_params(params))
        self.teacher_paths = frozenset(p for p, l in flat_labels.items() if l == "teacher")
        self.client_paths = frozenset(
            P_.shared_paths | P_.local_paths | P_.head_paths | self.teacher_paths
        )
        # FedAvg communicates comm_roles(mode), NOT the trainable set: the
        # oracle engine averages exactly that subset and RESETS every trained
        # non-comm non-personal param back to the server value each round
        # (engine.py run_round; reference comm_state_dict_names routing,
        # main.py:132-245).  Identical for dat/adapter/norm/bias/lora/prompt
        # (comm == trainable - heads there); differs for FULL (lora/prompt
        # train locally but are never communicated or persisted) and
        # FREEZE_BOTTOM_K (comm set is empty: upper layers train within a
        # round, then reset).
        from feddat_tpu.peft.partition import comm_roles, personal_roles

        _comm = comm_roles(config.peft_mode)
        _pers = personal_roles(config.peft_mode)
        self._comm_paths = frozenset(
            p for p in self.client_paths if flat_labels[p] in _comm
        )
        self._round_reset_paths = frozenset(
            p for p in self.client_paths
            if flat_labels[p] not in _comm and flat_labels[p] not in _pers
        )

        # split template params into replicated backbone and per-client part
        flat = traverse_util.flatten_dict(params)
        client_part = traverse_util.unflatten_dict(
            {p: flat[p] for p in self.client_paths}
        )
        self.backbone = traverse_util.unflatten_dict(
            {p: v for p, v in flat.items() if p not in self.client_paths}
        )
        # every client starts from the same init (reference main.py:440-450)
        self.client_state = self._put_client_tree(_stack_trees([client_part] * C))
        # committed replicated placement (multi-process jit REQUIRES global
        # arrays; single-host it also keeps a numpy checkpoint-loaded
        # backbone from being re-transferred on every step).  With a model
        # axis, frozen-backbone kernels take the parallel.tp layout instead
        # (column/row-sharded projections, replicated elsewhere).
        if self._model_parallel > 1:
            from feddat_tpu.parallel.tp import tp_spec_for

            flat_b = traverse_util.flatten_dict(self.backbone)
            self.backbone = traverse_util.unflatten_dict(
                {p: self._put_global(v, tp_spec_for(p, v)) for p, v in flat_b.items()}
            )
        else:
            self.backbone = jax.tree_util.tree_map(
                lambda x: self._put_global(x, P()), self.backbone
            )

        self.full_epochs = full_epochs
        agg = max if full_epochs else min
        max_steps = agg(c.steps_per_epoch for c in self.clients) * config.num_epochs
        # per-client schedule horizons (sequential parity: engine.py builds
        # steps_per_epoch * num_epochs per client); consumed by the cores
        # through the batch's _sched_total in full-epochs mode
        self._sched_totals = np.array(
            [c.steps_per_epoch * config.num_epochs for c in self.clients], np.float32
        )

        if config.peft_mode != PEFTMode.DAT:
            adapter_mode = "adapter" if config.peft_mode == PEFTMode.ADAPTER else "none"
            core = plain_step_core(
                forward, self.partitioner, config.optimizer, max_steps,
                adapter_mode, data_axis=DATA_AXIS,
                dropout_rng=config.dropout_rng,
            )
        elif use_fused:
            from feddat_tpu.peft.partition import merge as _merge
            from feddat_tpu.train.dat import dat_step_core_fused
            from feddat_tpu.train.losses import bce_with_logits_vqa
            from feddat_tpu.train.trainers import check_fused_dropout

            live = check_fused_dropout(model, carries=True)

            flat_all = traverse_util.flatten_dict(params)
            head_frozen_rest = traverse_util.unflatten_dict(
                {p: v for p, v in flat_all.items() if p not in self.partitioner.head_paths}
            )

            if family == "albef":
                from feddat_tpu.train.trainers import albef_fused_parts

                encode, head_fn, task_loss = albef_fused_parts(
                    model, head_frozen_rest, pad_token_id, dropout=live > 0.0
                )
            else:
                if live > 0.0:
                    def encode(p, b, mode, rng):
                        return model.apply(
                            {"params": p}, FED_HEAD_KEY, b, adapter_mode=mode,
                            deterministic=False, rngs={"dropout": rng},
                            method=type(model).encode_single_image,
                        )
                else:
                    def encode(p, b, mode, rng):
                        return model.apply(
                            {"params": p}, FED_HEAD_KEY, b, adapter_mode=mode,
                            deterministic=True, method=type(model).encode_single_image,
                        )

                def head_fn(h, pooled):
                    return model.apply(
                        {"params": _merge(h, head_frozen_rest)}, FED_HEAD_KEY, pooled,
                        method=type(model).apply_head,
                    )

                def task_loss(logits, b):
                    return bce_with_logits_vqa(logits, b["target_scores"])

            core = dat_step_core_fused(
                encode, head_fn, task_loss, self.partitioner, config.optimizer,
                max_steps, data_axis=DATA_AXIS,
                dropout_rng=config.dropout_rng,
            )
        else:
            core = dat_step_core(
                forward, self.partitioner, config.optimizer, max_steps,
                data_axis=DATA_AXIS, dropout_rng=config.dropout_rng,
            )
        from flax import traverse_util as _tu

        def merge_full(backbone, client_part):
            flat = dict(_tu.flatten_dict(backbone))
            flat.update(_tu.flatten_dict(client_part))
            return _tu.unflatten_dict(flat)

        def extract_client(full):
            flat = _tu.flatten_dict(full)
            return _tu.unflatten_dict({p: flat[p] for p in self.client_paths})

        self._merge_full = merge_full
        self._extract_client = extract_client

        def slot_step(backbone, client_part, opt_states, sched_count, rng, batch):
            """One DAT step for one (client, data) mesh slot."""
            # strip the sharded leading client dim of size 1
            client_part = jax.tree_util.tree_map(lambda x: x[0], client_part)
            opt_states = jax.tree_util.tree_map(lambda x: x[0], opt_states)
            sched_count = sched_count[0]
            rng = rng[0]
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            params = merge_full(backbone, client_part)
            state = TrainState(params=params, opt_states=opt_states, sched_count=sched_count, rng=rng)
            new_state, metrics = core(state, batch)
            new_client = extract_client(new_state.params)
            new_opt, new_count, new_rng = (
                new_state.opt_states, new_state.sched_count, new_state.rng
            )
            if "_step_valid" in batch:
                # full-epochs mode: this slot's client is already exhausted
                # this epoch — gate EVERY state advance to a no-op so the
                # step matches the sequential engine exactly (params, Adam
                # moments, schedule clock, and the client rng chain all stay
                # put; the compute itself runs on a padding batch).
                keep = batch["_step_valid"][0] > 0
                gate = lambda new, old: jax.tree_util.tree_map(
                    lambda n, o: jnp.where(keep, n, o), new, old
                )
                new_client = gate(new_client, client_part)
                new_opt = gate(new_opt, opt_states)
                new_count = jnp.where(keep, new_count, sched_count)
                new_rng = jnp.where(keep, new_rng, rng)
                v0 = batch["_step_valid"][0]
                metrics = jax.tree_util.tree_map(lambda m: m * v0, metrics)
                # weight channel so metric means average over VALID clients
                # only (an exhausted client's zeroed loss must not bias the
                # reported round mean toward zero)
                metrics["_valid"] = v0
            expand = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
            # metrics: mean over data axis so all slots agree, then [1] for client axis
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
            return (
                expand(new_client),
                expand(new_opt),
                new_count[None],
                new_rng[None],
                expand(metrics),
            )

        in_specs = (
            P(),  # backbone replicated
            P(CLIENT_AXIS),  # client part stacked
            P(CLIENT_AXIS),  # opt states
            P(CLIENT_AXIS),  # sched counts
            P(CLIENT_AXIS),  # rngs
            P(CLIENT_AXIS, DATA_AXIS),  # batch [C, B, ...]
        )
        out_specs = (P(CLIENT_AXIS), P(CLIENT_AXIS), P(CLIENT_AXIS), P(CLIENT_AXIS), P(CLIENT_AXIS))

        self._spmd_step = jax.jit(
            shard_map(
                slot_step,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
                axis_names=self._manual_axes,  # model axis (if any) stays GSPMD-auto
            ),
            donate_argnums=(2, 3, 4),  # client_state kept undonated: fedavg/teacher-refresh outputs may alias
        )

        # DAT reports [ensemble, local-only, shared-only] (task_trainer.py:229-244);
        # single-adapter/plain modes evaluate their one mode.
        if config.peft_mode == PEFTMode.DAT:
            self._eval_modes = (MODE_ENSEMBLE, "adapter_0", "adapter_1")
        elif config.peft_mode == PEFTMode.ADAPTER:
            self._eval_modes = ("adapter",)
        else:
            self._eval_modes = ("none",)

        if family == "albef":
            # per-client answer banks, stacked [C, N, La] and sharded over the
            # client axis; rank-answer eval runs inside the shard_map
            if answer_banks is None:
                raise ValueError("family='albef' needs answer_banks[task_key]=(ids, mask)")
            banks = [answer_banks[c.task_key] for c in self.clients]
            shapes = {tuple(np.asarray(b[0]).shape) for b in banks}
            if len(shapes) != 1:
                raise ValueError(
                    f"SPMD stacks answer banks; shapes must match, got {shapes}"
                )
            self._banks = (
                self._put_global(np.stack([np.asarray(b[0]) for b in banks]), P(CLIENT_AXIS)),
                self._put_global(np.stack([np.asarray(b[1]) for b in banks]), P(CLIENT_AXIS)),
            )
            k = min(rank_k, int(self._banks[0].shape[1]))
            from feddat_tpu.models.albef import AlbefModel

            def slot_eval(backbone, client_part, bids, bmask, batch, mode):
                client_part = jax.tree_util.tree_map(lambda x: x[0], client_part)
                batch = jax.tree_util.tree_map(lambda x: x[0], batch)
                params = merge_full(backbone, client_part)
                topk_ids, _ = model.apply(
                    {"params": params}, batch, bids[0], bmask[0], k, mode,
                    pad_token_id, method=AlbefModel.rank_answer,
                )
                pred = topk_ids[:, 0]
                gt = batch["gt_labels"]
                hit = jnp.any((pred[:, None] == gt) & (gt >= 0), axis=1).astype(jnp.float32)
                if "valid" in batch:
                    hit = hit * batch["valid"]
                return jax.lax.psum(jnp.sum(hit), DATA_AXIS)[None]

            def make_eval(mode):
                return jax.jit(
                    shard_map(
                        partial(slot_eval, mode=mode),
                        mesh=self.mesh,
                        in_specs=(P(), P(CLIENT_AXIS), P(CLIENT_AXIS),
                                  P(CLIENT_AXIS), P(CLIENT_AXIS, DATA_AXIS)),
                        out_specs=P(CLIENT_AXIS),
                        check_vma=False,
                        axis_names=self._manual_axes,
                    )
                )
        else:
            self._banks = None

            def slot_eval(backbone, client_part, batch, mode):
                client_part = jax.tree_util.tree_map(lambda x: x[0], client_part)
                batch = jax.tree_util.tree_map(lambda x: x[0], batch)
                params = merge_full(backbone, client_part)
                _, logits = model.apply(
                    {"params": params}, FED_HEAD_KEY, batch, adapter_mode=mode, deterministic=True
                )
                from feddat_tpu.data.vqa_scoring import batch_accuracy, compute_score_with_logits

                if metric == "accuracy":
                    per = batch_accuracy(logits, batch["labels"])
                else:
                    per = compute_score_with_logits(logits, batch["target_scores"])
                if "valid" in batch:
                    per = per * batch["valid"]
                s = jnp.sum(per)
                s = jax.lax.psum(s, DATA_AXIS)
                return s[None]

            def make_eval(mode):
                return jax.jit(
                    shard_map(
                        partial(slot_eval, mode=mode),
                        mesh=self.mesh,
                        in_specs=(P(), P(CLIENT_AXIS), P(CLIENT_AXIS, DATA_AXIS)),
                        out_specs=P(CLIENT_AXIS),
                        check_vma=False,
                        axis_names=self._manual_axes,
                    )
                )

        self._eval_steps = {mode: make_eval(mode) for mode in self._eval_modes}

        # FedAvg over the stacked client axis: one XLA reduction.
        weights = config.federated.client_weights
        if weights is None:
            w = jnp.ones((C,), jnp.float32) / C
        else:
            if len(weights) != C:
                raise ValueError(
                    f"client_weights has {len(weights)} entries for a "
                    f"{C}-slot client axis"
                )
            w = jnp.asarray(weights, jnp.float32)
            w = w / jnp.sum(w)
        comm_paths = self._comm_paths
        # initial server values for the trained-but-discarded partition (the
        # server never updates non-comm paths, so "reset to server" is
        # always "reset to init"); empty for every mode but FULL / FREEZE_*
        flat_init = traverse_util.flatten_dict(params)
        reset_vals = {
            p: jnp.asarray(flat_init[p]) for p in self._round_reset_paths
        }

        @jax.jit
        def fedavg_stacked(client_state):
            flat = _tu.flatten_dict(client_state)
            out = dict(flat)
            for p in comm_paths:
                leaf = flat[p]
                wshape = (C,) + (1,) * (leaf.ndim - 1)
                avg = jnp.sum(leaf * w.reshape(wshape), axis=0)
                out[p] = jnp.broadcast_to(avg[None], leaf.shape)
            for p, v in reset_vals.items():
                out[p] = jnp.broadcast_to(v[None], flat[p].shape)
            return _tu.unflatten_dict(out)

        self._fedavg = fedavg_stacked

        # adapter_2 <- adapter_1 per client (task_trainer.py:36-45).  The
        # shared teacher_refresh is purely path-based, so it applies to the
        # stacked [C]-leading bank unchanged — one source of truth for the
        # load-bearing adapter_1/adapter_2 path mapping.
        from feddat_tpu.peft.partition import teacher_refresh

        self._teacher_refresh = jax.jit(teacher_refresh)

        self.rng = jax.random.PRNGKey(config.seed)
        self.history: List[Dict[str, Any]] = []

        # startup observability: parameter budget (reference main.py:371-374)
        from feddat_tpu.peft.partition import param_budget
        import logging

        self.param_budget = param_budget(params, config.peft_mode)
        b = self.param_budget
        logging.getLogger("feddat_tpu").info(
            "params: total=%d trainable=%d (%.3f%%) communicated=%d personal=%d"
            " (x%d clients stacked)",
            b["total"], b["trainable"], b["trainable_pct"],
            b["communicated"], b["personal"], C,
        )

    @staticmethod
    def _default_vilt_forward(model, task_key):
        # one definition shared by both engines (their numerical-equivalence
        # contract rides on it): train/forwards.py::make_vilt_forward
        from feddat_tpu.train.forwards import make_vilt_forward

        return make_vilt_forward(model, task_key, loss="vqa")

    # -- global-array placement (single- and multi-process) ----------------
    def _put_global(self, x, spec):
        """Host value -> committed global jax.Array sharded ``spec``.

        Multi-host: the host value must be identical on every process when
        replicated (``P()``) or carry the full [C, ...] leading client axis
        (this process contributes only its ``local_slots`` rows, via
        ``jax.make_array_from_process_local_data``)."""
        sharding = NamedSharding(self.mesh, spec)
        if not self._multihost:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        local = x[np.asarray(self.local_slots)] if (
            len(spec) > 0 and spec[0] == CLIENT_AXIS
        ) else x
        return jax.make_array_from_process_local_data(sharding, local, x.shape)

    def _put_client_tree(self, host_tree):
        return jax.tree_util.tree_map(
            lambda x: self._put_global(x, P(CLIENT_AXIS)), host_tree
        )

    def _put_local_batch(self, local_stack):
        """[C_local, B, ...] host stack covering exactly ``local_slots`` ->
        global [C, B, ...] arrays sharded over (client, data)."""
        sharding = NamedSharding(self.mesh, P(CLIENT_AXIS, DATA_AXIS))
        C = self.num_clients

        def put(x):
            if self._multihost:
                return jax.make_array_from_process_local_data(
                    sharding, x, (C,) + x.shape[1:]
                )
            return jax.device_put(x, sharding)

        return jax.tree_util.tree_map(put, local_stack)

    def _stage_batches(self, host_batches, lookahead: int = 2):
        """Assemble host stacks into global device arrays ``lookahead``
        batches ahead of consumption, so the host batch build + H2D DMA
        overlap the previous step's compute (the SPMD engine's analogue of
        ``data.pipeline.prefetch_to_device``; SURVEY §7.1 — the chip must
        never wait on the host pipeline)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=lookahead)
        END = object()
        ERR = object()
        stop = threading.Event()  # set when the consumer abandons the stream

        def offer(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in host_batches:
                    if not offer(self._put_local_batch(b)):
                        return  # consumer gone: drop staged work, exit
            except BaseException as e:  # surface pipeline errors to the consumer
                offer((ERR, e))
                return
            offer(END)

        threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is END:
                    break
                if isinstance(item, tuple) and item[0] is ERR:
                    raise item[1]
                yield item
        finally:
            # a mid-round exception (or early generator close) must not leave
            # the producer blocked on q.put pinning staged device batches
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def _to_host(self, x) -> np.ndarray:
        """Global (possibly non-addressable) array -> full numpy on host.

        Fully-replicated arrays read out locally; client-sharded arrays go
        through a cross-process allgather (a collective: every process must
        call this in lockstep for such arrays)."""
        if self._multihost and not getattr(x, "is_fully_replicated", True):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    # -- data staging ------------------------------------------------------
    def _stacked_train_batches(self, round_idx: int):
        """Zip the LOCAL client slots' iterators into [C_local, B, ...] host
        batches, truncated to the global minimum step count (heterogeneous
        client sizes; SURVEY.md §7.3 'Client heterogeneity vs SPMD' — the
        truncation semantics are documented in README and pinned by
        ``test_spmd_heterogeneous_truncation``)."""
        dbg = self.config.debug_steps
        # global metadata: every process computes the same step count
        agg = max if self.full_epochs else min
        round_steps = agg(c.steps_per_epoch for c in self.clients)
        for epoch in range(self.config.federated.local_epochs):
            its = [
                self.clients[i].train_batches(epoch=round_idx * 1000 + epoch)
                for i in self.local_slots
            ]
            last = [None] * len(its)
            for step_idx in range(round_steps):
                # reference --debug N truncation, per epoch (main.py:275-276,
                # task_trainer.py:82-83: batches 0..N run)
                if dbg and step_idx > dbg:
                    break
                if not self.full_epochs:
                    batches = [next(it) for it in its]
                    yield {
                        k: np.stack([b[k] for b in batches], axis=0)
                        for k in batches[0]
                    }
                    continue
                # full-epochs: exhausted clients repeat their last batch with
                # a zero step-valid flag — the jitted step gates their state
                # advance to a no-op (sequential-engine parity)
                batches, valid = [], []
                for j, it in enumerate(its):
                    try:
                        b = next(it)
                        last[j] = b
                        valid.append(1.0)
                    except StopIteration:
                        b = last[j]
                        valid.append(0.0)
                    batches.append(b)
                if any(b is None for b in batches):
                    # a client with zero batches this epoch: pad from any
                    # live client's batch (shapes are uniform across slots)
                    live = [b for b in batches if b is not None]
                    if not live:
                        # inside a generator a bare StopIteration from next()
                        # would surface as an opaque PEP-479 RuntimeError
                        raise ValueError(
                            "no locally-hosted client produced a train batch "
                            "this epoch (every local client has num_train < "
                            "batch_size); cannot pad the stacked batch"
                        )
                    template = live[0]
                    batches = [template if b is None else b for b in batches]
                stacked = {
                    k: np.stack([b[k] for b in batches], axis=0) for k in batches[0]
                }
                B = next(iter(stacked.values())).shape[1]
                stacked["_step_valid"] = np.repeat(
                    np.asarray(valid, np.float32)[:, None], B, axis=1
                )
                stacked["_sched_total"] = np.repeat(
                    self._sched_totals[np.asarray(self.local_slots)][:, None], B, axis=1
                )
                yield stacked

    def _fresh_opt_and_clocks(self):
        template = self._merge_full(
            self.backbone, jax.tree_util.tree_map(lambda x: x[0], self.client_state)
        )
        st = init_train_state(
            template, self.partitioner, self.config.optimizer, jax.random.PRNGKey(0)
        )
        opt = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (self.num_clients,) + x.shape), st.opt_states
        )
        counts = jnp.zeros((self.num_clients,), jnp.int32)
        self.rng, sub = jax.random.split(self.rng)
        rngs = jax.random.split(sub, self.num_clients)
        return self._put_client_tree(opt), self._put_global(
            counts, P(CLIENT_AXIS)
        ), self._put_global(rngs, P(CLIENT_AXIS))

    # -- rounds ------------------------------------------------------------
    def run_round(self, round_idx: int) -> Dict[str, float]:
        import time

        t0 = time.time()
        if self.config.peft_mode == PEFTMode.DAT:
            # oracle parity: the engine refreshes adapter_2 <- adapter_1 only
            # under DAT (engine.py _client_params)
            self.client_state = self._teacher_refresh(self.client_state)
        opt, counts, rngs = self._fresh_opt_and_clocks()
        last_metrics = None
        batch_total = self.num_clients * self.config.batch_size
        for batch in self._stage_batches(self._stacked_train_batches(round_idx)):
            self.client_state, opt, counts, rngs, last_metrics = self._spmd_step(
                self.backbone, self.client_state, opt, counts, rngs, batch
            )
            if self.metrics is not None and not self._multihost:
                # lazy client-mean scalars; only float()'d every log_every
                # steps.  (Multi-host: eager reductions over non-addressable
                # arrays are collective ops — per-round metrics only.)
                self.metrics.step(
                    self._metric_means(last_metrics), batch_total, "spmd"
                )
        self.client_state = self._fedavg(self.client_state)
        self._last_round_wall_s = time.time() - t0
        if last_metrics is None:
            return {}
        host = {k: self._to_host(v) for k, v in last_metrics.items()}
        w = host.pop("_valid", None)
        denom = float(max(1.0, w.sum())) if w is not None else None
        return {
            k: (v.sum() / denom if denom is not None else v.mean())
            for k, v in host.items()
        }

    @staticmethod
    def _metric_means(last_metrics):
        """Per-metric client means; full-epochs rounds carry a ``_valid``
        weight channel so exhausted (no-op-gated) clients don't bias the
        mean toward zero."""
        if "_valid" in last_metrics:
            cnt = jnp.maximum(1.0, jnp.sum(last_metrics["_valid"]))
            return {
                k: jnp.sum(v) / cnt
                for k, v in last_metrics.items()
                if k != "_valid"
            }
        return {k: jnp.mean(v) for k, v in last_metrics.items()}

    def evaluate_round(self, round_idx: int) -> Dict[str, Any]:
        """Per-client scores [ensemble, adapter_0, adapter_1] like the
        reference's DAT eval (``task_trainer.py:229-244``)."""
        totals = {m: np.zeros(self.num_clients) for m in self._eval_steps}
        counts = np.array([c.num_eval_examples for c in self.clients], dtype=np.float64)
        dbg = self.config.debug_steps
        # global step count from metadata so every process (multi-host) runs
        # the same number of collective eval steps in lockstep
        n_steps = max(client_eval_steps(c) for c in self.clients)
        if dbg:
            n_steps = min(n_steps, dbg + 1)
        # one pass over the data: each staged batch (one host build + one
        # H2D transfer) is evaluated under EVERY adapter mode — the per-mode
        # outer loop used to decode/tokenize/transfer the eval split 3x
        # under DAT
        its = [self.clients[i].eval_batches() for i in self.local_slots]
        template = None
        for _ in range(n_steps):
            batches = []
            for it in its:
                try:
                    b = next(it)
                    template = template or b
                except StopIteration:
                    b = None
                batches.append(b)
            if template is None:
                raise ValueError(
                    "every process must host at least one client with "
                    "eval examples (needed to build padding batches)"
                )
            # heterogeneous eval sizes: exhausted clients contribute
            # all-invalid padding batches (valid mask zero)
            for i, b in enumerate(batches):
                if b is None:
                    pad = {k: np.zeros_like(v) for k, v in template.items()}
                    pad["valid"] = np.zeros_like(template["valid"])
                    batches[i] = pad
            stacked = {
                k: np.stack([b[k] for b in batches], axis=0) for k in batches[0]
            }
            gbatch = self._put_local_batch(stacked)
            for mode, fn in self._eval_steps.items():
                if self._banks is not None:
                    out = fn(self.backbone, self.client_state, *self._banks, gbatch)
                else:
                    out = fn(self.backbone, self.client_state, gbatch)
                totals[mode] += self._to_host(out)
        scores = {
            c.task_key: [
                # max(1, n): a zero-example eval split scores 0.0, not NaN
                # (reference evaluate(), train/evaluation.py:111 parity)
                float(totals[m][i] / max(1, counts[i]) * 100.0)
                for m in self._eval_modes
            ]
            for i, c in enumerate(self.clients)
        }
        entry = {"round": round_idx, "scores": scores}
        self.history.append(entry)
        if self.metrics is not None:
            self.metrics.round(round_idx, scores, getattr(self, "_last_round_wall_s", 0.0))
        return entry

    # -- checkpoint / resume -------------------------------------------------
    # The stacked client bank plays the role of the sequential engine's
    # personal store; the replicated backbone that of the server params.
    def save_checkpoint(self, round_idx: int) -> Optional[str]:
        if not self.checkpoint_dir:
            return None
        from feddat_tpu.utils.checkpointing import save_federated_state

        # EVERY process calls save: the client-state allgather is a
        # collective, and orbax's save is ITSELF collective in multiprocess
        # mode (internal sync_global_devices barriers) — a p0-only call
        # desyncs the barrier names and deadlocks/aborts the run (caught by
        # tests/test_multihost_real.py's preemption scenario).  Orbax writes
        # from the primary host; --checkpoint_dir must be one shared path.
        path = save_federated_state(
            self.checkpoint_dir, round_idx,
            jax.tree_util.tree_map(self._to_host, self.backbone),
            {"stacked_clients": jax.tree_util.tree_map(self._to_host, self.client_state)},
            self.rng,
        )
        return path if self.process_index == 0 else None

    def try_resume(self) -> int:
        if not self.checkpoint_dir:
            return 0
        from feddat_tpu.utils.checkpointing import restore_federated_state

        restored = restore_federated_state(self.checkpoint_dir)
        if self._multihost:
            # all processes MUST agree on the resume round before entering
            # the collective round loop — a per-host checkpoint dir (or a
            # partially visible one) would otherwise desync the processes'
            # collective sequences and deadlock at the first psum/allgather
            from jax.experimental import multihost_utils

            rnd_local = np.asarray(
                [-1 if restored is None else restored[0]], np.int32
            )
            rounds = np.asarray(
                multihost_utils.process_allgather(rnd_local, tiled=True)
            ).reshape(-1)
            if not np.all(rounds == rounds[0]):
                raise ValueError(
                    f"processes disagree on the checkpoint round {rounds.tolist()}: "
                    "--checkpoint_dir must be one SHARED filesystem path "
                    "visible to every host (process 0 writes, all read)"
                )
        if restored is None:
            return 0
        rnd, backbone, personal, rng = restored
        # re-commit the restored host arrays to the mesh (single-host too —
        # a host-numpy backbone would otherwise be re-transferred every step)
        self.backbone = jax.tree_util.tree_map(
            lambda x: self._put_global(x, P()), backbone
        )
        self.client_state = self._put_client_tree(personal["stacked_clients"])
        self.rng = rng
        return rnd + 1

    def run(self, resume: bool = True) -> List[Dict[str, Any]]:
        import logging

        from feddat_tpu.utils.observability import trace
        from feddat_tpu.utils.preemption import GracefulPreemption

        rounds = self.config.federated.comm_rounds
        start = self.try_resume() if resume else 0
        # SIGTERM finishes the round in flight, checkpoints, exits cleanly
        # (SURVEY §5.3).  Multi-host: every process checks the CONSENSUS
        # flag at the same round boundary (any_process_requested is itself
        # a collective), so no process leaves the collective loop alone.
        preempted = False
        with GracefulPreemption(enabled=bool(self.checkpoint_dir)) as stop:
            for r in range(start, rounds):
                with trace(self.profile_dir, enabled=bool(self.profile_dir) and r == start):
                    self.run_round(r)
                if self.checkpoint_dir:
                    self.save_checkpoint(r)
                if (r + 1) % self.config.federated.eval_every == 0 or r == rounds - 1:
                    self.evaluate_round(r)
                if self.checkpoint_dir and stop.any_process_requested():
                    logging.getLogger("feddat_tpu").warning(
                        "preempted: round %d checkpointed; exiting", r
                    )
                    preempted = True
                    break
        if not self.history and rounds > 0 and not preempted:
            # resumed at/after the final round: still produce a final eval so
            # the run's history is never empty.  NOT on preemption — a cut
            # run must not masquerade as a completed one (the relaunch
            # resumes and produces the real final eval).
            self.evaluate_round(rounds - 1)
        return self.history
