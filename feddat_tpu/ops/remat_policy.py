"""Shared remat-policy-name -> jax checkpoint-policy mapping.

Single source of truth for the ``remat_policy`` config knob, used by both
the ViLT encoder stack (models/vilt.py) and ALBEF's ViT tower
(models/vit.py) so the name lists cannot drift between them.  The
``block_save*`` names pair with the attention-block kernel
(ops/attn_block.py), whose vjp residuals are tagged ``attn_x`` /
``attn_ctx`` / ``attn_lse``; measured trade-offs live in PERF.md.

Names handled STRUCTURALLY by the layer (not via a checkpoint policy):
``attention`` (remat only the attention sub-block) and ``min_save``
(checkpointed LNs + no layer remat) — callers that do not wire those
structural flags should pass ``supports_structural=False`` to get a clear
error instead of silently falling back to full remat.
"""

from __future__ import annotations

_STRUCTURAL = ("attention", "min_save")


def resolve_remat_policy(name: str, supports_structural: bool = True):
    """Returns the jax.checkpoint policy for ``name`` (None = save nothing,
    i.e. full recompute)."""
    import jax

    cp = jax.checkpoint_policies
    if name in ("full",) + (_STRUCTURAL if supports_structural else ()):
        return None
    if name == "dots":
        return cp.dots_saveable
    if name == "names":
        # store exactly the cheap-to-store / expensive-to-recompute bf16
        # tensors (tagged in layers.py / ops/attention.py)
        return cp.save_only_these_names("qkv", "attn_probs", "attn_out", "ffn_preact")
    if name == "block_save":
        return cp.save_only_these_names("attn_x", "attn_ctx", "attn_lse", "attn_out")
    if name == "block_save_nox":
        # like block_save but the kernel input is re-built by re-running the
        # (cheap) LayerNorm in the backward instead of being stored
        return cp.save_only_these_names("attn_ctx", "attn_lse", "attn_out")
    if name == "block_save_ffn":
        return cp.save_only_these_names(
            "attn_x", "attn_ctx", "attn_lse", "attn_out", "ffn_preact"
        )
    raise ValueError(
        f"unsupported remat_policy {name!r} for this layer stack"
        + ("" if supports_structural else f" (structural policies {_STRUCTURAL} are not wired here)")
    )
