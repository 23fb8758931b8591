"""Sequential federated engine — semantically exact port of the reference's
communication-round loop (``src/train/main.py:453-558``).

Per round, per client:
  1. client params = server params with the client's personal partition
     swapped in (replaces ``copy.deepcopy`` + name-matched restore,
     ``main.py:472-478``);
  2. DAT teacher refresh: ``adapter_2 <- adapter_1``
     (``task_trainer.py:36-45``);
  3. fresh AdamW + schedule (the reference rebuilds both inside
     ``trainer.train`` every round, ``task_trainer.py:52-63``);
  4. ``local_epochs`` epochs of (DAT or plain) train steps;
  5. re-capture personal partition; harvest the communicated subtree.
Then FedAvg over the harvested subtrees into the server params, and every
``eval_every`` rounds an eval of each client's personalized model
(``main.py:520-558``).

This engine is the *reference semantics oracle*; the SPMD clients-mesh engine
(``feddat_tpu/federated/spmd.py``) is the TPU-performance path and is tested
for equivalence against this one.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode, TrainConfig
from feddat_tpu.federated.fedavg import fedavg
from feddat_tpu.peft.partition import (
    comm_roles,
    label_params,
    personal_roles,
    split_by_roles,
    teacher_refresh,
)
from feddat_tpu.train.dat import (
    Partitioner,
    init_train_state,
    make_dat_train_step,
    make_plain_train_step,
)
from feddat_tpu.train.evaluation import evaluate, evaluate_dat, make_eval_step

logger = logging.getLogger("feddat_tpu")


@dataclasses.dataclass
class ClientRuntime:
    """Per-client compiled artifacts and data handles."""

    task_key: str
    data: Any  # ClientData protocol: train_batches/eval_batches/sizes
    forward: Callable
    partitioner: Partitioner
    train_step: Callable
    eval_step: Callable
    opt_cfg: OptimizerConfig = None  # per-task hyperparameters (see below)


class FederatedTrainer:
    """Drives communication rounds over a set of clients."""

    def __init__(
        self,
        model,
        params: Dict[str, Any],
        clients: Dict[str, Any],
        config: TrainConfig,
        make_forward: Optional[Callable] = None,
        metric: str = "vqa_score",
        make_eval: Optional[Callable] = None,
        checkpoint_dir: Optional[str] = None,
        metrics_logger=None,
        aux_init: Optional[Callable] = None,
        batch_transform: Optional[Callable] = None,
        aux_forward: bool = False,
        use_fused_dat: bool = False,
        optimizer_overrides: Optional[Dict[str, OptimizerConfig]] = None,
        num_epochs_overrides: Optional[Dict[str, int]] = None,
        tp_mesh=None,
        profile_dir: Optional[str] = None,
    ):
        """``make_forward(model, task_key) -> forward`` and
        ``make_eval(model, task_key) -> eval_step`` customize the model
        family (ViLT default; ALBEF passes ``make_albef_eval_step`` bound to
        each task's answer bank).

        ``aux_init(params) -> aux`` seeds per-client auxiliary model state
        (ALBEF momentum twins: ``copy_params`` at client start,
        ``albef_model.py:158-163``); ``aux_forward`` marks the forward as
        aux-threading.  ``batch_transform(batch, epoch, step, steps_per_epoch)``
        mirrors the reference's per-batch mutation hook (the ALBEF distill
        alpha ramp, ``train_vqa_crossvqa.py:265-271``)..

        ``tp_mesh`` (a ``(data, model)`` ``jax.sharding.Mesh``) tensor-
        parallelizes the run by PLACEMENT alone: the frozen backbone is
        sharded Megatron-style over the ``model`` axis
        (``parallel/tp.py::tp_spec_for``), the trainable PEFT partitions stay
        replicated, batches ride the ``data`` axis, and GSPMD partitions the
        unchanged train/eval steps (equivalence:
        ``tests/test_tp.py::test_tp_training_step_by_placement``)."""
        self.model = model
        self.config = config
        self.mode = config.peft_mode
        self.tp_mesh = tp_mesh
        self._batch_sharding = None
        if tp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from feddat_tpu.parallel.tp import DATA_AXIS, shard_params_tp

            params = shard_params_tp(params, tp_mesh)
            self._batch_sharding = NamedSharding(tp_mesh, PartitionSpec(DATA_AXIS))
        self.server_params = params
        self.labels = label_params(params)
        self._personal_roles = personal_roles(self.mode)
        self._comm_roles = comm_roles(self.mode)
        self.rng = jax.random.PRNGKey(config.seed)

        if make_forward is None:
            make_forward = self._default_vilt_forward

        self.clients: List[ClientRuntime] = []
        for task_key, data in clients.items():
            forward = make_forward(model, task_key)
            part = Partitioner(params, task_key, self.mode,
                               layers_to_freeze=config.layers_to_freeze)
            # Per-task hyperparameters: the reference's non-federated trainers
            # take lr/wd/eps/warmup AND the schedule-horizon num_epochs from
            # the task config (``task_configs_fed.py:48-51``,
            # ``train_nlvr2.py:85-93``), while the federated cross-VQA path
            # uses the CLI ``--lr``/``--num_epochs``
            # (``train_vqa_crossvqa.py:233-238``).
            n_epochs = (num_epochs_overrides or {}).get(task_key, config.num_epochs)
            max_steps = data.steps_per_epoch * n_epochs
            opt_cfg = (optimizer_overrides or {}).get(task_key, config.optimizer)
            if self.mode == PEFTMode.DAT:
                # no buffer donation here: the sequential engine's personal store and
                # server tree intentionally alias client-param leaves (the SPMD
                # engine is the donation-optimized path)
                if use_fused_dat:
                    step = self._build_fused_dat_step(
                        model, params, task_key, part, opt_cfg, max_steps,
                        dropout_rng=config.dropout_rng,
                    )
                else:
                    step = make_dat_train_step(
                        forward, part, opt_cfg, max_steps, donate=False,
                        dropout_rng=config.dropout_rng,
                    )
            else:
                adapter_mode = "adapter" if self.mode == PEFTMode.ADAPTER else "none"
                step = make_plain_train_step(
                    forward, part, opt_cfg, max_steps, adapter_mode,
                    donate=False, aux_forward=aux_forward,
                    dropout_rng=config.dropout_rng,
                )
            self.clients.append(
                ClientRuntime(
                    task_key=task_key,
                    data=data,
                    forward=forward,
                    partitioner=part,
                    train_step=step,
                    eval_step=(
                        make_eval(model, task_key)
                        if make_eval is not None
                        else make_eval_step(model, task_key, metric)
                    ),
                    opt_cfg=opt_cfg,
                )
            )

        # Initial personal store: every client starts from the same init
        # (reference captures it once before the round loop, main.py:440-450).
        init_personal, _ = split_by_roles(params, self.labels, self._personal_roles)
        self.personal: Dict[str, Dict[str, Any]] = {
            c.task_key: jax.tree_util.tree_map(lambda x: x, init_personal)
            for c in self.clients
        }
        self.history: List[Dict[str, Any]] = []
        self.checkpoint_dir = checkpoint_dir
        self.metrics = metrics_logger
        # jax.profiler trace of the first executed round (SURVEY §5.1 —
        # view in TensorBoard/xprof); None = off
        self.profile_dir = profile_dir
        self.aux_init = aux_init
        self.batch_transform = batch_transform

        # startup observability: parameter budget (reference main.py:371-374)
        from feddat_tpu.peft.partition import param_budget

        self.param_budget = param_budget(params, self.mode)
        b = self.param_budget
        logger.info(
            "params: total=%d trainable=%d (%.3f%%) communicated=%d personal=%d",
            b["total"], b["trainable"], b["trainable_pct"],
            b["communicated"], b["personal"],
        )

    @staticmethod
    def _build_fused_dat_step(model, params, task_key, part, opt_cfg, max_steps,
                              dropout_rng: str = "threefry"):
        """Fused DAT step (single ensemble encoder pass; see
        ``train/dat.py::make_dat_train_step_fused``).  Exact when encoder
        dropout is off (ViLT default); live dropout (ALBEF/ViltBert 0.1) is
        threaded through with fresh masks per step — the one deviation is
        documented in ``trainers.check_fused_dropout``."""
        from feddat_tpu.peft.partition import label_params, merge, split_by_roles
        from feddat_tpu.train.dat import make_dat_train_step_fused
        from feddat_tpu.train.losses import bce_with_logits_vqa
        from feddat_tpu.train.trainers import check_fused_dropout

        from feddat_tpu.models.albef import AlbefModel

        if isinstance(model, AlbefModel):
            # single source of truth for the fused-ALBEF contract
            # (warns about dropout itself)
            from feddat_tpu.train.trainers import make_albef_fused_dat_step

            step, _ = make_albef_fused_dat_step(
                model, params, opt_cfg, max_steps, donate=False, part=part,
                dropout_rng=dropout_rng,
            )
            return step

        live = check_fused_dropout(model, carries=True)
        labels = label_params(params)
        _, frozen_rest = split_by_roles(params, labels, frozenset({"head"}))

        if live > 0.0:
            def encode(p, b, mode, rng):
                return model.apply(
                    {"params": p}, task_key, b, adapter_mode=mode,
                    deterministic=False, rngs={"dropout": rng},
                    method=type(model).encode_single_image,
                )
        else:
            def encode(p, b, mode, rng):
                return model.apply(
                    {"params": p}, task_key, b, adapter_mode=mode, deterministic=True,
                    method=type(model).encode_single_image,
                )

        def head_fn(h, pooled):
            return model.apply(
                {"params": merge(h, frozen_rest)}, task_key, pooled,
                method=type(model).apply_head,
            )

        def task_loss(logits, b):
            return bce_with_logits_vqa(logits, b["target_scores"])

        return make_dat_train_step_fused(
            encode, head_fn, task_loss, part, opt_cfg, max_steps, donate=False,
            dropout_rng=dropout_rng,
        )

    @staticmethod
    def _default_vilt_forward(model, task_key):
        # one definition shared by both engines (their numerical-equivalence
        # contract rides on it): train/forwards.py::make_vilt_forward
        from feddat_tpu.train.forwards import make_vilt_forward

        return make_vilt_forward(model, task_key, loss="vqa")

    # -- internals ---------------------------------------------------------
    def _client_params(self, client: ClientRuntime, refresh: bool = True) -> Dict[str, Any]:
        """Server params with the client's personal partition swapped in.

        ``refresh`` applies the DAT teacher refresh (``adapter_2 <-
        adapter_1``) — done at *train* start only (``task_trainer.py:36-45``).
        Eval must NOT refresh: the reference evaluates the post-aggregation
        server model with the client's stored personal params (including the
        adapter_2 captured after its last local training) swapped in
        (``main.py:520-558``), which is also what the SPMD engine does.
        """
        from feddat_tpu.peft.partition import merge

        personal = self.personal[client.task_key]
        _, rest = split_by_roles(self.server_params, self.labels, self._personal_roles)
        params = merge(rest, personal)
        if refresh and self.mode == PEFTMode.DAT:
            params = teacher_refresh(params)
        return params

    def train_client(self, client: ClientRuntime, round_idx: int) -> Dict[str, Any]:
        """One client's local training; returns its full post-training params."""
        params = self._client_params(client)
        self.rng, client_rng = jax.random.split(self.rng)
        state = init_train_state(params, client.partitioner, client.opt_cfg, client_rng)
        if self.aux_init is not None:
            state = state.replace(aux=self.aux_init(params))
        on_accelerator = jax.default_backend() != "cpu"
        for epoch in range(self.config.federated.local_epochs):
            it = client.data.train_batches(epoch=round_idx * 1000 + epoch)
            if on_accelerator or self._batch_sharding is not None:
                # overlap host batch prep + H2D with the previous step; under
                # TP additionally split each batch over the mesh's data axis
                from feddat_tpu.data.pipeline import prefetch_to_device

                it = prefetch_to_device(it, size=2, sharding=self._batch_sharding)
            spe = client.data.steps_per_epoch
            for step_idx, batch in enumerate(it):
                # reference --debug N truncation: per-epoch, batches 0..N run
                # (``task_trainer.py:82-83``: ``if debug > 0 and step > debug``)
                if self.config.debug_steps and step_idx > self.config.debug_steps:
                    break
                if self.batch_transform is not None:
                    batch = self.batch_transform(batch, epoch, step_idx, spe)
                state, metrics = client.train_step(state, batch)
                if self.metrics is not None:
                    bs = next(iter(batch.values())).shape[0]
                    self.metrics.step(metrics, bs, client.task_key)
        return state.params

    def run_round(self, round_idx: int) -> None:
        t0 = time.time()
        self._last_round_wall_s = 0.0
        comm_subtrees = []
        for client in self.clients:
            trained = self.train_client(client, round_idx)
            personal, _ = split_by_roles(trained, self.labels, self._personal_roles)
            self.personal[client.task_key] = personal
            comm, _ = split_by_roles(trained, self.labels, self._comm_roles)
            comm_subtrees.append(comm)

        if comm_subtrees and self._comm_roles:
            weights = self.config.federated.client_weights
            averaged = fedavg(comm_subtrees, weights)
            from feddat_tpu.peft.partition import merge

            _, rest = split_by_roles(self.server_params, self.labels, self._comm_roles)
            self.server_params = merge(rest, averaged)
        self._last_round_wall_s = time.time() - t0
        logger.info("round %d done in %.2fs", round_idx, self._last_round_wall_s)

    def evaluate_round(self, round_idx: int) -> Dict[str, Any]:
        """Eval each client's personalized model (``main.py:520-558``)."""
        from feddat_tpu.peft.partition import merge

        results = {}
        dbg = self.config.debug_steps
        for client in self.clients:
            params = self._client_params(client, refresh=False)
            n = client.data.num_eval_examples
            if self.mode == PEFTMode.DAT:
                score = evaluate_dat(
                    params, client.eval_step, client.data.eval_batches, n,
                    debug_steps=dbg,
                )
            elif self.mode == PEFTMode.ADAPTER:
                score = evaluate(params, client.eval_step, client.data.eval_batches(), n, "adapter", debug_steps=dbg)
            else:
                score = evaluate(params, client.eval_step, client.data.eval_batches(), n, "none", debug_steps=dbg)
            results[client.task_key] = score
        entry = {"round": round_idx, "scores": results}
        self.history.append(entry)
        logger.info("eval %s", entry)
        if self.metrics is not None:
            self.metrics.round(round_idx, results, getattr(self, "_last_round_wall_s", 0.0))
        return entry

    # -- checkpoint / resume (real persistence the reference lacks,
    #    SURVEY.md §5.4) -----------------------------------------------------
    def save_checkpoint(self, round_idx: int) -> Optional[str]:
        if not self.checkpoint_dir:
            return None
        from feddat_tpu.utils.checkpointing import save_federated_state

        return save_federated_state(
            self.checkpoint_dir, round_idx, self.server_params, self.personal, self.rng
        )

    def try_resume(self) -> int:
        """Restore the latest checkpoint; returns the next round index."""
        if not self.checkpoint_dir:
            return 0
        from feddat_tpu.utils.checkpointing import restore_federated_state

        restored = restore_federated_state(self.checkpoint_dir)
        if restored is None:
            return 0
        rnd, server, personal, rng = restored
        if self.tp_mesh is not None:
            # orbax restores host arrays; re-apply the TP layout or the rest
            # of the run silently trains a fully-replicated backbone
            from feddat_tpu.parallel.tp import shard_params_tp

            server = shard_params_tp(server, self.tp_mesh)
        self.server_params = server
        self.personal = personal
        self.rng = rng
        logger.info("resumed from checkpoint at round %d", rnd)
        return rnd + 1

    def run_single_task(self) -> Dict[str, Any]:
        """Centralized baseline (``--do_single``, reference ``main.py:402-436``):
        each task trains ``comm_rounds`` times sequentially on its own model
        (no aggregation, personal state carried between repeats), then evals."""
        init_server = self.server_params
        init_personal, _ = split_by_roles(init_server, self.labels, self._personal_roles)
        results = {}
        for client in self.clients:
            # the reference rebuilds the model per task to reset state
            # (``main.py:427-436``): each task starts from the initial params
            # — the PERSONAL store too, or a preceding run()/resume on this
            # trainer would leak federated-trained adapters/heads into the
            # "centralized baseline"
            self.server_params = init_server
            self.personal[client.task_key] = init_personal
            for r in range(self.config.federated.comm_rounds):
                trained = self.train_client(client, r)
                personal, _ = split_by_roles(trained, self.labels, self._personal_roles)
                self.personal[client.task_key] = personal
                comm, _ = split_by_roles(trained, self.labels, self._comm_roles)
                if self._comm_roles:
                    from feddat_tpu.peft.partition import merge

                    _, rest = split_by_roles(
                        self.server_params, self.labels, self._comm_roles
                    )
                    self.server_params = merge(rest, comm)
            params = self._client_params(client, refresh=False)
            n = client.data.num_eval_examples
            if self.mode == PEFTMode.DAT:
                results[client.task_key] = evaluate_dat(
                    params, client.eval_step, client.data.eval_batches, n,
                    debug_steps=self.config.debug_steps,
                )
            else:
                mode = "adapter" if self.mode == PEFTMode.ADAPTER else "none"
                results[client.task_key] = evaluate(
                    params, client.eval_step, client.data.eval_batches(), n, mode,
                    debug_steps=self.config.debug_steps,
                )
        # leave the trainer as it started: server AND personal store (a
        # later run() must not inherit baseline-trained personal partitions
        # — the mirror image of the reset at the top of each task)
        self.server_params = init_server
        for c in self.clients:
            self.personal[c.task_key] = init_personal
        entry = {"round": -1, "scores": results, "single_task": True}
        self.history.append(entry)
        return entry

    def run(self, resume: bool = True) -> List[Dict[str, Any]]:
        from feddat_tpu.utils.observability import trace
        from feddat_tpu.utils.preemption import GracefulPreemption

        rounds = self.config.federated.comm_rounds
        start = self.try_resume() if resume else 0
        # SIGTERM (the TPU-fleet preemption notice) finishes the round in
        # flight, checkpoints it, and exits cleanly; the relaunch resumes
        # (SURVEY §5.3 — the reference has no failure handling at all)
        preempted = False
        with GracefulPreemption(enabled=bool(self.checkpoint_dir)) as stop:
            for r in range(start, rounds):
                with trace(self.profile_dir, enabled=bool(self.profile_dir) and r == start):
                    self.run_round(r)
                if self.checkpoint_dir:
                    self.save_checkpoint(r)
                if (r + 1) % self.config.federated.eval_every == 0 or r == rounds - 1:
                    self.evaluate_round(r)
                if stop.requested:
                    logger.warning("preempted: round %d checkpointed; exiting", r)
                    preempted = True
                    break
        if not self.history and rounds > 0 and not preempted:
            # resumed at/after the final round: still produce a final eval so
            # the run's history is never empty.  NOT on preemption — a cut
            # run must not masquerade as a completed one (the relaunch
            # resumes and produces the real final eval).
            self.evaluate_round(rounds - 1)
        return self.history
