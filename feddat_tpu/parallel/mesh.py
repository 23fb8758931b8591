"""Device-mesh construction.

The TPU-native replacement for the reference's accelerate/NCCL process-group
setup (``accelerate_config.yaml``, ``src/train/main.py:362-365``): one global
SPMD mesh with axes

  * ``client`` — federated clients (the reference's sequential client loop,
    ``main.py:466-503``, becomes this axis; FedAvg rides ICI as a ``pmean``);
  * ``data``   — data parallelism within a client (the reference's DDP).

Multi-host: initialize ``jax.distributed`` before calling and the mesh spans
all processes (clients on DCN-adjacent slices, data-parallel within a slice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

CLIENT_AXIS = "client"
DATA_AXIS = "data"


def make_mesh(
    num_clients: int = 1,
    data_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (client=num_clients, data=data_parallel).

    ``data_parallel`` defaults to using all remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        if n % num_clients != 0:
            raise ValueError(f"{n} devices not divisible by {num_clients} clients")
        data_parallel = n // num_clients
    need = num_clients * data_parallel
    if need > n:
        raise ValueError(f"need {need} devices, have {n}")
    grid = np.asarray(devices[:need]).reshape(num_clients, data_parallel)
    return Mesh(grid, (CLIENT_AXIS, DATA_AXIS))
