"""Bottleneck adapter cell — the heart of DAT.

Functional re-design of the reference's mutable ``Adapter`` module
(``src/modeling/models/adapter.py:16-163``): instead of
``set_active_adapter`` / ``activate_gating`` object mutation, the active
adapter ("mode") is a *static argument* to a pure ``__call__``.  Each mode
traces to its own XLA program; inactive adapters simply do not appear in the
graph, so their gradients are structurally zero (replacing the reference's
``requires_grad`` toggling and DDP ``find_unused_parameters`` workaround).

Modes:
  * ``"none"``        — identity (no adapter in the graph).
  * ``"<name>"``      — single active adapter: ``residual + up(relu(down(z)))``
                        (reference ``adapter.py:126-131``).
  * ``"ensemble"``    — fixed 0.5/0.5 mix of adapters {0, 2} when a frozen
                        teacher ``adapter_2`` exists, else {0, 1}
                        (reference ``adapter.py:133-162``; the learned gate is
                        dead code, the live path uses constant weights).

Params are held directly (Dense-compatible ``{name}_down/{kernel,bias}``
paths) so the ensemble can be routed through the fused Pallas epilogue
(``feddat_tpu.ops.adapter_fused``) when ``spec.fused`` is set.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from feddat_tpu.configs.core import AdapterSpec

MODE_NONE = "none"
MODE_ENSEMBLE = "ensemble"
# Per-example adapter mixing: ``weights`` [B, len(names)] selects/blends the
# named adapters per batch row.  Lets one forward pass serve examples in
# DIFFERENT adapter modes (the joint DAT step runs its ensemble and
# adapter_1 passes as one 2B batch; rows where a weight is 0 contribute
# exactly-zero gradient to that adapter).
MODE_WEIGHTED = "weighted"
# Used only during ``model.init``: touches every named adapter so that the
# parameter tree is identical for all modes (jit cache reuse + partitioning).
MODE_INIT = "init_all"


def ensemble_members(names: Sequence[str]) -> tuple[str, str]:
    """Which two adapters the gated forward mixes (reference ``adapter.py:133-162``)."""
    if "adapter_2" in names:
        return ("adapter_0", "adapter_2")
    return ("adapter_0", "adapter_1")


class _DenseParams(nn.Module):
    """Declares the params of an ``nn.Dense`` (same names/shapes/inits)
    WITHOUT computing it, so a parent can fuse several projections into one
    matmul while the param tree stays byte-identical to the unfused path.
    (Lives here rather than in ``layers.py`` — which imports this module —
    so both adapter cells and attention blocks share one declaration twin.)"""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, in_features: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class AdapterCell(nn.Module):
    """All named adapters at one insertion site.

    Parameters per name: ``{name}_down`` (d -> d/r) and ``{name}_up``
    (d/r -> d), BERT-init (normal std 0.02, zero bias;
    reference ``adapter.py:5-13``).
    """

    spec: AdapterSpec
    model_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def delta(self, z: jnp.ndarray, mode: str, weights_bx: jnp.ndarray = None) -> jnp.ndarray:
        """The additive adapter update for hidden states ``z``.

        Callers compose this with their own residual/LayerNorm convention:
        ViLT-style sites do ``h + delta(h)``; BERT-style sites sandwich it
        between LayerNorms (see ``xbert.py`` port).

        ``weights_bx`` ([B, len(names)]) is required for ``MODE_WEIGHTED``.
        """
        if mode == MODE_NONE or not self.spec.enabled:
            return jnp.zeros_like(z)

        bottleneck = self.model_dim // self.spec.reduction_factor
        # Materialize every named adapter's params regardless of mode so the
        # param tree is mode-independent (jit cache reuse; FedAvg and
        # personalization partitioning).
        weights = {}
        for name in self.spec.names:
            wd, bd = _DenseParams(bottleneck, name=f"{name}_down")(self.model_dim)
            wu, bu = _DenseParams(self.model_dim, name=f"{name}_up")(bottleneck)
            weights[name] = (wd, bd, wu, bu)

        def cast(t):
            return t.astype(self.dtype)

        def one(name: str) -> jnp.ndarray:
            wd, bd, wu, bu = weights[name]
            down = z.astype(self.dtype) @ cast(wd) + cast(bd)
            return nn.relu(down) @ cast(wu) + cast(bu)

        if mode == MODE_INIT:
            # Average of all adapters; only ever traced by ``init``.
            return sum(one(n) for n in self.spec.names) / len(self.spec.names)

        if mode == MODE_WEIGHTED:
            # per-example blend; weight columns follow self.spec.names order.
            # z is [B, S, D] (or [B, D]); weights broadcast over trailing dims.
            # Scaling matches MODE_ENSEMBLE: the reference multiplies every
            # weighted aggregation by ``self.scaling`` (``adapter.py:144,161``)
            # — required for joint-step == standard-step equivalence.
            assert weights_bx is not None, "MODE_WEIGHTED needs adapter weights"
            out = jnp.zeros_like(z)
            for i, name in enumerate(self.spec.names):
                w = weights_bx[:, i].astype(z.dtype)
                w = w.reshape(w.shape + (1,) * (z.ndim - 1))
                out = out + w * one(name)
            return out * self.spec.scaling

        if mode == MODE_ENSEMBLE:
            a, b = ensemble_members(self.spec.names)
            w = self.spec.ensemble_weight
            if self.spec.fused and jax.default_backend() == "tpu":
                # Fused Pallas epilogue returns the ensemble DELTA (mixing
                # in fp32 on-chip); the residual add stays with the caller.
                from feddat_tpu.ops.adapter_fused import fused_ensemble_adapter

                pa = tuple(cast(t) for t in weights[a])
                pb = tuple(cast(t) for t in weights[b])
                zc = z.astype(self.dtype)
                delta = fused_ensemble_adapter(zc, pa, pb, float(w), False)
                return delta * self.spec.scaling
            return (w * one(a) + (1.0 - w) * one(b)) * self.spec.scaling

        if mode not in weights:
            raise ValueError(
                f"Unknown adapter mode {mode!r}; have {tuple(weights)} + "
                f"('{MODE_NONE}', '{MODE_ENSEMBLE}')"
            )
        return one(mode)
