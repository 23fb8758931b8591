"""Train-state pytrees.

The reference mutates a DDP-wrapped ``nn.Module`` + torch optimizer in place;
here state is an explicit immutable pytree threaded through jitted steps
(donated for in-place buffer reuse on TPU).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    """State for one client's local training.

    ``opt_states`` is keyed by partition name ("shared", "local", "head" for
    DAT; "trainable" for the single-update modes).  ``sched_count`` is the
    scheduler clock: ticks once per optimizer update (twice per batch under
    DAT, matching ``task_trainer.py:304-328``).
    """

    params: Dict[str, Any]
    opt_states: Dict[str, Any]
    sched_count: jnp.ndarray
    rng: jnp.ndarray
    # Optional auxiliary model state threaded through the step — used for
    # ALBEF's momentum-distillation twin params (``albef_model.py:44-57``).
    aux: Any = None
