"""Train-step builders: DAT + Mutual-KD, and the single-update baselines.

The reference's DAT step (``task_trainer.py:280-330``) is three forwards and
two backward/optimizer-steps per batch, sequenced through object mutation:

  ① gating on  -> ensemble {adapter_0, adapter_2} forward, no grad -> logits_all
  ② gating off -> adapter_1 forward; L1 = (task_loss + KL(l1 ‖ sg(l_all)))/2;
     backward; AdamW step (adapter_1 + active head); scheduler tick
  ③ gating on  -> ensemble forward; L0 = (task_loss + KL(l0 ‖ sg(l1)))/2;
     backward; AdamW step (adapter_0 + active head); scheduler tick

Here the whole thing is ONE jitted function: adapter selection is a static
``adapter_mode`` argument, the two masked updates are two optax partitions
(shared / local) plus a head partition whose Adam state advances twice per
batch (exactly torch's per-param step counting), and stop-gradients replace
``.clone().detach()``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, FrozenSet, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from feddat_tpu.configs.core import OptimizerConfig, PEFTMode
from feddat_tpu.models.adapters import MODE_ENSEMBLE
from feddat_tpu.peft.partition import (
    ROLE_HEAD,
    ROLE_LOCAL,
    ROLE_SHARED,
    label_params,
    trainable_roles,
)
from feddat_tpu.train.losses import kd_kl_loss
from feddat_tpu.train.optim import (
    adamw_direction,
    apply_direction,
    polynomial_schedule,
    polynomial_schedule_dyn,
)
from feddat_tpu.train.state import TrainState


def _make_lr_at(opt_cfg: OptimizerConfig, max_steps: int):
    """lr(count, batch): the static schedule, unless the batch carries a
    per-slot ``_sched_total`` (SPMD full-epochs mode: every client keeps its
    own horizon inside one jitted program — trace-time branch)."""
    schedule = polynomial_schedule(opt_cfg, max_steps)
    dyn = polynomial_schedule_dyn(opt_cfg)

    def lr_at(count, batch):
        if "_sched_total" in batch:
            return dyn(count, batch["_sched_total"].reshape(-1)[0])
        return schedule(count)

    return lr_at

# forward(params, batch, adapter_mode, dropout_rng) -> (task_loss, logits)
ForwardFn = Callable[[Dict[str, Any], Dict[str, Any], str, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


class Partitioner:
    """Static path-set partitioning of a parameter tree for one client.

    Partitions: ``shared`` (role adapter_1/comm subset), ``local``
    (adapter_0), ``head`` (the *active* task's head only — the reference
    updates only the head that receives gradients; other clients' heads must
    not be touched by weight decay), ``frozen`` (everything else).
    """

    def __init__(
        self,
        params: Dict[str, Any],
        task_key: str,
        mode: PEFTMode,
        layers_to_freeze: int = 0,
    ):
        labels = label_params(params)
        flat_labels = traverse_util.flatten_dict(labels)
        self.mode = mode
        self.grad_mask: Dict[Tuple, Any] = {}
        head_tag = f"task_{task_key}"

        def joined(path):
            return "/".join(str(p) for p in path)

        # ViLT heads are per-task modules (only the active task's head may be
        # touched by this client's optimizer); ALBEF's single LM prediction
        # head (``.cls.``) is the personal head for every client
        # (reference ``main.py:127-130``).  Component-EXACT matching: a
        # substring test would let a task key that prefixes another key
        # (e.g. 'vqa' vs 'vqa_rad') pull the other task's head into this
        # client's optimizer, where decoupled weight decay shrinks it every
        # step despite zero gradients.
        self.head_paths = frozenset(
            p
            for p, l in flat_labels.items()
            if l == ROLE_HEAD
            and (head_tag in joined(p).split("/") or "cls" in joined(p).split("/"))
        )
        if mode == PEFTMode.DAT:
            self.shared_paths = frozenset(p for p, l in flat_labels.items() if l == ROLE_SHARED)
            self.local_paths = frozenset(p for p, l in flat_labels.items() if l == ROLE_LOCAL)
        elif mode == PEFTMode.FREEZE_BOTTOM_K:
            # Intended semantics (CLiMB lineage): embeddings + bottom-k
            # transformer layers frozen, upper layers + heads train.  (The
            # reference's fed branch blanket-freezes everything first,
            # reducing this mode to heads-only — an apparent regression we
            # do not reproduce; ``main.py:137-139, 169-171``.  Its ALBEF
            # freeze helper is vestigial and crashes, ``albef.py:82-92`` —
            # here the mode is well-defined for every family.)  Per-layer
            # freezing over nn.scan-stacked params = a leading-axis grad
            # mask on the layer stacks.
            #
            # Stack components and their global layer-index offsets: ViLT's
            # ``layers/layer`` and the ViT's ``blocks/block`` index from 0;
            # ALBEF's text encoder is ONE 12-layer BERT split into two scan
            # stacks (``text_layers`` 0..5, ``fusion_layers`` 6..11 — the
            # checkpoint surgery's split, ``albef.py:219-241``), so fusion
            # stacks (incl. the decoder's, the original layers >= 6) index
            # from the text depth.
            flat_p = traverse_util.flatten_dict(params)
            text_depth = max(
                (flat_p[p].shape[0] for p in flat_p if "text_layers" in p),
                default=0,
            )
            STACKS = {"layers": 0, "blocks": 0, "text_layers": 0,
                      "fusion_layers": text_depth}
            # ViT embedding leaves live outside any *embeddings* module
            VISION_EMBEDS = ("patch_embed", "pos_embed", "cls_token")
            roles = trainable_roles(mode) - {ROLE_HEAD}
            paths = set()
            for p, l in flat_labels.items():
                strs = tuple(str(s) for s in p)
                if l not in roles or "text_bert" in strs:
                    continue
                if any("embeddings" in s for s in strs) or any(
                    s in VISION_EMBEDS for s in strs
                ):
                    continue
                paths.add(p)
                stack = next((s for s in strs if s in STACKS), None)
                if stack is not None:
                    leaf = flat_p[p]
                    num_layers = leaf.shape[0]
                    idx = STACKS[stack] + jnp.arange(num_layers)
                    mask = (idx >= layers_to_freeze).astype(leaf.dtype)
                    self.grad_mask[p] = mask.reshape((num_layers,) + (1,) * (leaf.ndim - 1))
            self.shared_paths = frozenset(paths)
            self.local_paths = frozenset()
        else:
            roles = trainable_roles(mode) - {ROLE_HEAD}
            # ViltBert's text_bert is structurally frozen (stop_gradient,
            # ``viltbert.py::get_bert_outputs``): keep it out of the
            # optimizer so decoupled weight decay can't mutate it under
            # FULL/NORM/BIAS (torch AdamW skips grad-None params; optax
            # would decay them)
            self.shared_paths = frozenset(
                p for p, l in flat_labels.items()
                if l in roles and "text_bert" not in tuple(str(s) for s in p)
            )
            self.local_paths = frozenset()

    def extract(self, params: Dict[str, Any], paths: FrozenSet[Tuple]) -> Dict[str, Any]:
        flat = traverse_util.flatten_dict(params)
        return traverse_util.unflatten_dict({p: flat[p] for p in paths})

    def merge_into(self, params: Dict[str, Any], sub: Dict[str, Any]) -> Dict[str, Any]:
        flat = dict(traverse_util.flatten_dict(params))
        flat.update(traverse_util.flatten_dict(sub))
        return traverse_util.unflatten_dict(flat)


def init_train_state(
    params: Dict[str, Any],
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    rng: jnp.ndarray,
) -> TrainState:
    tx = adamw_direction(opt_cfg)
    opt_states = {}
    if partitioner.mode == PEFTMode.DAT:
        opt_states["shared"] = tx.init(partitioner.extract(params, partitioner.shared_paths))
        opt_states["local"] = tx.init(partitioner.extract(params, partitioner.local_paths))
        opt_states["head"] = tx.init(partitioner.extract(params, partitioner.head_paths))
    else:
        opt_states["trainable"] = tx.init(
            partitioner.extract(params, partitioner.shared_paths | partitioner.head_paths)
        )
    return TrainState(
        params=params,
        opt_states=opt_states,
        sched_count=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def dat_step_core(
    forward: ForwardFn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    data_axis: str | None = None,
    dropout_rng: str = "threefry",
):
    """The un-jitted DAT step; ``data_axis`` enables gradient ``pmean`` over a
    mesh axis for data parallelism inside ``shard_map`` (the TPU-native
    replacement for the reference's DDP allreduce,
    ``task_trainer.py:302,323``).  ``dropout_rng``: bit-generator for the
    per-stage dropout keys (see ``utils.seeding.dropout_key``; "rbg" uses
    the TPU hardware RNG for bulk mask bits, +7%% on ALBEF)."""
    from feddat_tpu.utils.seeding import dropout_key

    tx = adamw_direction(opt_cfg)
    lr_at = _make_lr_at(opt_cfg, max_steps)
    P = partitioner

    def maybe_pmean(tree):
        if data_axis is None:
            return tree
        return jax.lax.pmean(tree, data_axis)

    def step(state: TrainState, batch: Dict[str, Any]):
        rng, d0, d1, d2 = jax.random.split(state.rng, 4)
        d0, d1, d2 = (dropout_key(d, dropout_rng) for d in (d0, d1, d2))
        params = state.params

        # ① ensemble forward (teacher+local mix), gradients stopped.
        _, logits_all = forward(params, batch, MODE_ENSEMBLE, d0)
        logits_all = jax.lax.stop_gradient(logits_all)

        # ② shared-adapter update.
        shared = P.extract(params, P.shared_paths)
        head = P.extract(params, P.head_paths)

        def loss1(shared_p, head_p):
            full = P.merge_into(P.merge_into(params, shared_p), head_p)
            task_loss, logits = forward(full, batch, "adapter_1", d1)
            kl = kd_kl_loss(logits, logits_all)
            return (task_loss + kl) / 2.0, (task_loss, logits)

        (l1, (task_l1, logits_1)), grads1 = jax.value_and_grad(
            loss1, argnums=(0, 1), has_aux=True
        )(shared, head)
        grads1 = maybe_pmean(grads1)
        lr1 = lr_at(state.sched_count, batch)
        new_shared, opt_shared = apply_direction(tx, grads1[0], state.opt_states["shared"], shared, lr1)
        head, opt_head = apply_direction(tx, grads1[1], state.opt_states["head"], head, lr1)
        params = P.merge_into(P.merge_into(params, new_shared), head)
        logits_1 = jax.lax.stop_gradient(logits_1)

        # ③ local-adapter update through the ensemble forward.
        local = P.extract(params, P.local_paths)

        def loss0(local_p, head_p):
            full = P.merge_into(P.merge_into(params, local_p), head_p)
            task_loss, logits = forward(full, batch, MODE_ENSEMBLE, d2)
            kl = kd_kl_loss(logits, logits_1)
            return (task_loss + kl) / 2.0, (task_loss, logits)

        (l0, (task_l0, _)), grads0 = jax.value_and_grad(
            loss0, argnums=(0, 1), has_aux=True
        )(local, head)
        grads0 = maybe_pmean(grads0)
        lr0 = lr_at(state.sched_count + 1, batch)
        new_local, opt_local = apply_direction(tx, grads0[0], state.opt_states["local"], local, lr0)
        head, opt_head = apply_direction(tx, grads0[1], opt_head, head, lr0)
        params = P.merge_into(P.merge_into(params, new_local), head)

        new_state = TrainState(
            params=params,
            opt_states={"shared": opt_shared, "local": opt_local, "head": opt_head},
            sched_count=state.sched_count + 2,
            rng=rng,
            aux=state.aux,
        )
        metrics = {"loss": l0, "loss_shared": l1, "task_loss": task_l0, "lr": lr0}
        return new_state, metrics

    return step


def make_dat_train_step(
    forward: ForwardFn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    donate: bool = True,
    dropout_rng: str = "threefry",
):
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    Exact-parity notes vs ``task_trainer.py:280-330``:
      * logits_all and logits_1 enter the KD losses through stop_gradient
        (torch ``.clone().detach()``);
      * update ② trains {adapter_1, head} at lr = schedule(c); update ③
        trains {adapter_0, head} at lr = schedule(c+1); c advances by 2;
      * the head's Adam moments/step advance in both updates (torch keeps a
        single per-param state across both ``optimizer.step()`` calls).
    """
    step = dat_step_core(
        forward, partitioner, opt_cfg, max_steps, dropout_rng=dropout_rng
    )
    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)


def dat_step_core_fused(
    encode_fn,
    head_fn,
    task_loss_fn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    data_axis: str | None = None,
    dropout_rng: str = "threefry",
):
    """DAT step that computes the ensemble ENCODER forward once.

    The reference runs the gated-ensemble forward twice per batch (① no-grad
    teacher logits, ③ local-adapter update, ``task_trainer.py:283-328``),
    but between the two only the HEAD changes (step ② updates adapter_1 +
    head; the ensemble path uses adapter_0/adapter_2/backbone, all
    untouched).  Here one ``jax.vjp`` of the ensemble encoder supplies:
      * pooled features for the no-grad teacher logits (old head), and
      * the backward closure for step ③'s adapter_0 gradients (new head),
    eliminating one of the three encoder forwards (~1/7 of step FLOPs).

    Exact vs the reference when encoder dropout is off (ViLT's default).
    With live dropout (``encode_fn`` consuming its rng argument) the step
    stays stochastic — d0 drives the ensemble pass, d1 the adapter_1 pass,
    fresh draws every step — and the ONLY deviation from the reference's
    three independent forwards is that stages ① and ③ share the single
    ensemble pass's mask draw (distribution-level equivalence tested,
    tests/test_dat_fused.py).

    Args:
      encode_fn(params, batch, adapter_mode, rng) -> pooled
      head_fn(head_subtree, pooled) -> logits
      task_loss_fn(logits, batch) -> scalar task loss
    """
    tx = adamw_direction(opt_cfg)
    lr_at = _make_lr_at(opt_cfg, max_steps)
    P = partitioner

    def maybe_pmean(tree):
        if data_axis is None:
            return tree
        return jax.lax.pmean(tree, data_axis)

    def step(state: TrainState, batch: Dict[str, Any]):
        from feddat_tpu.utils.seeding import dropout_key

        rng, d0, d1 = jax.random.split(state.rng, 3)
        d0, d1 = dropout_key(d0, dropout_rng), dropout_key(d1, dropout_rng)
        params = state.params
        head = P.extract(params, P.head_paths)
        local = P.extract(params, P.local_paths)
        shared = P.extract(params, P.shared_paths)

        # ONE ensemble encoder pass, differentiable wrt the local adapter.
        def enc_local(local_p):
            return encode_fn(P.merge_into(params, local_p), batch, MODE_ENSEMBLE, d0)

        pooled, enc_vjp = jax.vjp(enc_local, local)
        pooled_sg = jax.lax.stop_gradient(pooled)
        logits_all = jax.lax.stop_gradient(head_fn(head, pooled_sg))

        # ② shared-adapter update (full forward, single adapter_1 path).
        def loss1(shared_p, head_p):
            full = P.merge_into(P.merge_into(params, shared_p), head_p)
            pooled1 = encode_fn(full, batch, "adapter_1", d1)
            logits = head_fn(head_p, pooled1)
            l = task_loss_fn(logits, batch)
            kl = kd_kl_loss(logits, logits_all)
            return (l + kl) / 2.0, logits

        (l1, logits_1), grads1 = jax.value_and_grad(loss1, argnums=(0, 1), has_aux=True)(
            shared, head
        )
        grads1 = maybe_pmean(grads1)
        lr1 = lr_at(state.sched_count, batch)
        new_shared, opt_shared = apply_direction(tx, grads1[0], state.opt_states["shared"], shared, lr1)
        head, opt_head = apply_direction(tx, grads1[1], state.opt_states["head"], head, lr1)
        params = P.merge_into(P.merge_into(params, new_shared), head)
        logits_1 = jax.lax.stop_gradient(logits_1)

        # ③ local update: reuse pooled; backward through the saved vjp.
        def loss0(head_p, pooled_in):
            logits = head_fn(head_p, pooled_in)
            l = task_loss_fn(logits, batch)
            kl = kd_kl_loss(logits, logits_1)
            return (l + kl) / 2.0

        l0, (g_head, g_pooled) = jax.value_and_grad(loss0, argnums=(0, 1))(head, pooled)
        (g_local,) = enc_vjp(g_pooled)
        g_local, g_head = maybe_pmean((g_local, g_head))
        lr0 = lr_at(state.sched_count + 1, batch)
        new_local, opt_local = apply_direction(tx, g_local, state.opt_states["local"], local, lr0)
        head, opt_head = apply_direction(tx, g_head, opt_head, head, lr0)
        params = P.merge_into(P.merge_into(params, new_local), head)

        new_state = TrainState(
            params=params,
            opt_states={"shared": opt_shared, "local": opt_local, "head": opt_head},
            sched_count=state.sched_count + 2,
            rng=rng,
            aux=state.aux,
        )
        return new_state, {"loss": l0, "loss_shared": l1, "lr": lr0}

    return step


def dat_step_core_joint(
    encode_fn,
    head_fn,
    task_loss_fn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    adapter_names: Tuple[str, ...] = ("adapter_0", "adapter_1", "adapter_2"),
    ensemble_weight: float = 0.5,
    adapter_scaling: float = 1.0,
    data_axis: str | None = None,
    dropout_rng: str = "threefry",
):
    """DAT step as ONE mega-batched encoder forward + ONE shared backward.

    The fused step (:func:`dat_step_core_fused`) still runs two encoder
    forward scans (ensemble + adapter_1) and two backward scans per batch.
    Both passes are head-independent and use disjoint adapter subsets, so
    they batch into a single 2B-example pass with per-example adapter
    weights (``MODE_WEIGHTED``): rows 0..B-1 carry the ensemble mix
    (0.5, 0, 0.5), rows B..2B-1 the single-adapter selection (0, 1, 0).
    A zero weight makes that row's gradient to that adapter exactly zero, so
    ONE ``jax.vjp`` backward returns both stage gradients:

      * d loss1 / d adapter_1 flows only from the second half,
      * d loss0 / d adapter_0 only from the first half,

    with the head sequencing identical to the reference
    (``task_trainer.py:280-330``): stage ② updates {adapter_1, head} at
    lr(c) using pre-update values; stage ③ evaluates its loss at the
    stage-②-updated head and updates {adapter_0, head} at lr(c+1).
    FLOPs are unchanged (+~1% for the always-on adapter blend); scan
    launches are halved.  Exact when encoder dropout is off (ViLT default),
    like the fused step.

    ``adapter_names`` / ``ensemble_weight`` / ``adapter_scaling`` MUST match
    the model's ``AdapterSpec`` — pass them from the spec when it deviates
    from the DAT defaults, or the step silently trains a different ensemble
    mix than eval uses.  ``adapter_scaling`` must be 1.0 (the reference
    constant, ``adapter.py:26``): MODE_WEIGHTED applies scaling to every
    row, while the standard step's single-adapter pass (reference parity,
    ``adapter.py:124-130``) does not, so the stage-② rows would diverge
    under any other value — enforced here rather than documented away.
    """
    if adapter_scaling != 1.0:
        raise ValueError(
            f"the joint DAT step requires AdapterSpec.scaling == 1.0 (got "
            f"{adapter_scaling}): its stage-② rows run through MODE_WEIGHTED "
            "(which scales, reference adapter.py:144,161) while the standard "
            "step's adapter_1 pass does not (adapter.py:124-130) — any other "
            "value breaks joint==standard equivalence.  Use the standard or "
            "fused step."
        )
    tx = adamw_direction(opt_cfg)
    lr_at = _make_lr_at(opt_cfg, max_steps)
    P = partitioner

    def maybe_pmean(tree):
        if data_axis is None:
            return tree
        return jax.lax.pmean(tree, data_axis)

    w_row = {name: i for i, name in enumerate(adapter_names)}
    n_names = len(adapter_names)
    ens = jnp.zeros((n_names,)).at[w_row["adapter_0"]].set(ensemble_weight)
    ens = ens.at[w_row["adapter_2"]].set(1.0 - ensemble_weight)
    single = jnp.zeros((n_names,)).at[w_row["adapter_1"]].set(1.0)

    def step(state: TrainState, batch: Dict[str, Any]):
        from feddat_tpu.utils.seeding import dropout_key

        rng, d0 = jax.random.split(state.rng)
        d0 = dropout_key(d0, dropout_rng)
        params = state.params
        head = P.extract(params, P.head_paths)
        local = P.extract(params, P.local_paths)
        shared = P.extract(params, P.shared_paths)

        B = batch["input_ids"].shape[0]
        # double only per-example channels; scalar side channels (the SPMD
        # full-epochs ``_sched_total`` horizon) pass through unchanged
        batch2 = {
            k: (v if k.startswith("_") else jnp.concatenate([v, v], axis=0))
            for k, v in batch.items()
        }
        batch2["adapter_weights"] = jnp.concatenate(
            [jnp.tile(ens, (B, 1)), jnp.tile(single, (B, 1))], axis=0
        )

        def enc(local_p, shared_p):
            full = P.merge_into(P.merge_into(params, local_p), shared_p)
            return encode_fn(full, batch2, "weighted", d0)

        pooled2, enc_vjp = jax.vjp(enc, local, shared)
        pooled_ens, pooled_1 = pooled2[:B], pooled2[B:]
        pooled_ens_sg = jax.lax.stop_gradient(pooled_ens)
        logits_all = jax.lax.stop_gradient(head_fn(head, pooled_ens_sg))

        # stage ② head-level loss/grads (pre-update head)
        def loss1(head_p, pooled_in):
            logits = head_fn(head_p, pooled_in)
            l = task_loss_fn(logits, batch)
            kl = kd_kl_loss(logits, logits_all)
            return (l + kl) / 2.0, logits

        (l1, logits_1), (g_head1, g_pooled_1) = jax.value_and_grad(
            loss1, argnums=(0, 1), has_aux=True
        )(head, pooled_1)
        g_head1 = maybe_pmean(g_head1)
        lr1 = lr_at(state.sched_count, batch)
        head2, opt_head = apply_direction(tx, g_head1, state.opt_states["head"], head, lr1)
        logits_1 = jax.lax.stop_gradient(logits_1)

        # stage ③ head-level loss/grads at the updated head
        def loss0(head_p, pooled_in):
            logits = head_fn(head_p, pooled_in)
            l = task_loss_fn(logits, batch)
            kl = kd_kl_loss(logits, logits_1)
            return (l + kl) / 2.0

        l0, (g_head0, g_pooled_ens) = jax.value_and_grad(loss0, argnums=(0, 1))(
            head2, pooled_ens
        )

        # ONE backward scan for both stages
        g_local, g_shared = enc_vjp(jnp.concatenate([g_pooled_ens, g_pooled_1], axis=0))
        g_local, g_shared, g_head0 = maybe_pmean((g_local, g_shared, g_head0))

        new_shared, opt_shared = apply_direction(
            tx, g_shared, state.opt_states["shared"], shared, lr1
        )
        lr0 = lr_at(state.sched_count + 1, batch)
        new_local, opt_local = apply_direction(
            tx, g_local, state.opt_states["local"], local, lr0
        )
        head3, opt_head = apply_direction(tx, g_head0, opt_head, head2, lr0)

        params = P.merge_into(params, new_shared)
        params = P.merge_into(params, new_local)
        params = P.merge_into(params, head3)
        new_state = TrainState(
            params=params,
            opt_states={"shared": opt_shared, "local": opt_local, "head": opt_head},
            sched_count=state.sched_count + 2,
            rng=rng,
            aux=state.aux,
        )
        return new_state, {"loss": l0, "loss_shared": l1, "lr": lr0}

    return step


def make_dat_train_step_joint(
    encode_fn,
    head_fn,
    task_loss_fn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    adapter_names: Tuple[str, ...] = ("adapter_0", "adapter_1", "adapter_2"),
    ensemble_weight: float = 0.5,
    adapter_scaling: float = 1.0,
    donate: bool = True,
    dropout_rng: str = "threefry",
):
    """Jitted wrapper around :func:`dat_step_core_joint` (see its docstring)."""
    step = dat_step_core_joint(
        encode_fn, head_fn, task_loss_fn, partitioner, opt_cfg, max_steps,
        adapter_names, ensemble_weight, adapter_scaling,
        dropout_rng=dropout_rng,
    )
    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)


def make_dat_train_step_fused(
    encode_fn,
    head_fn,
    task_loss_fn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    donate: bool = True,
    dropout_rng: str = "threefry",
):
    """Jitted wrapper around :func:`dat_step_core_fused` (see its docstring)."""
    step = dat_step_core_fused(
        encode_fn, head_fn, task_loss_fn, partitioner, opt_cfg, max_steps,
        dropout_rng=dropout_rng,
    )
    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)


def plain_step_core(
    forward: ForwardFn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    adapter_mode: str = "none",
    aux_forward: bool = False,
    data_axis: str | None = None,
    dropout_rng: str = "threefry",
):
    """Un-jitted single fwd/bwd/update step for all non-DAT modes
    (reference ``task_trainer.py:433-450``).  ``data_axis`` enables gradient
    ``pmean`` for data parallelism inside ``shard_map`` (the SPMD engine's
    non-DAT path).

    With ``aux_forward`` the forward has signature
    ``(params, batch, mode, rng, aux) -> (loss, logits, aux)`` and the aux
    state (e.g. ALBEF momentum twins) is threaded through ``state.aux``.
    """
    tx = adamw_direction(opt_cfg)
    lr_at = _make_lr_at(opt_cfg, max_steps)
    P = partitioner
    paths = P.shared_paths | P.head_paths

    def maybe_pmean(tree):
        if data_axis is None:
            return tree
        return jax.lax.pmean(tree, data_axis)

    def step(state: TrainState, batch: Dict[str, Any]):
        from feddat_tpu.utils.seeding import dropout_key

        rng, d_rng = jax.random.split(state.rng)
        d_rng = dropout_key(d_rng, dropout_rng)
        params = state.params
        trainable = P.extract(params, paths)

        def loss_fn(train_p):
            full = P.merge_into(params, train_p)
            if aux_forward:
                task_loss, logits, new_aux = forward(
                    full, batch, adapter_mode, d_rng, state.aux
                )
            else:
                task_loss, logits = forward(full, batch, adapter_mode, d_rng)
                new_aux = state.aux
            return task_loss, (logits, new_aux)

        (loss, (_, new_aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        grads = maybe_pmean(grads)
        if P.grad_mask:
            gflat = dict(traverse_util.flatten_dict(grads))
            for p, m in P.grad_mask.items():
                if p in gflat:
                    gflat[p] = gflat[p] * m.astype(gflat[p].dtype)
            grads = traverse_util.unflatten_dict(gflat)
        lr = lr_at(state.sched_count, batch)
        new_trainable, opt_state = apply_direction(
            tx, grads, state.opt_states["trainable"], trainable, lr
        )
        if P.grad_mask:
            # weight decay must not move frozen layers either: blend back
            nflat = dict(traverse_util.flatten_dict(new_trainable))
            oflat = traverse_util.flatten_dict(trainable)
            for p, m in P.grad_mask.items():
                if p in nflat:
                    mm = m.astype(nflat[p].dtype)
                    nflat[p] = nflat[p] * mm + oflat[p] * (1 - mm)
            new_trainable = traverse_util.unflatten_dict(nflat)
        params = P.merge_into(params, new_trainable)
        new_state = TrainState(
            params=params,
            opt_states={"trainable": opt_state},
            sched_count=state.sched_count + 1,
            rng=rng,
            aux=new_aux,
        )
        return new_state, {"loss": loss, "lr": lr}

    return step


def make_plain_train_step(
    forward: ForwardFn,
    partitioner: Partitioner,
    opt_cfg: OptimizerConfig,
    max_steps: int,
    adapter_mode: str = "none",
    donate: bool = True,
    aux_forward: bool = False,
    dropout_rng: str = "threefry",
):
    """Jitted wrapper around :func:`plain_step_core` (see its docstring)."""
    step = plain_step_core(
        forward, partitioner, opt_cfg, max_steps, adapter_mode, aux_forward,
        dropout_rng=dropout_rng,
    )
    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)
