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
    model_parallel: int = 1,
) -> Mesh:
    """Mesh of shape (client=num_clients, data=data_parallel[, model=...]).

    ``data_parallel`` defaults to using all remaining devices.
    ``model_parallel > 1`` appends the tensor-parallel ``model`` axis
    (innermost, so each client/data slot's TP group sits on ICI-adjacent
    devices); the SPMD engine leaves that axis to GSPMD (shard_map
    ``axis_names`` excludes it) with the ``parallel.tp`` layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        if n % (num_clients * model_parallel) != 0:
            raise ValueError(
                f"{n} devices not divisible by {num_clients} clients"
                + (f" x model={model_parallel}" if model_parallel > 1 else "")
            )
        data_parallel = n // (num_clients * model_parallel)
    need = num_clients * data_parallel * model_parallel
    if need > n:
        raise ValueError(f"need {need} devices, have {n}")
    if model_parallel > 1:
        from feddat_tpu.parallel.tp import MODEL_AXIS

        grid = np.asarray(devices[:need]).reshape(
            num_clients, data_parallel, model_parallel
        )
        return Mesh(grid, (CLIENT_AXIS, DATA_AXIS, MODEL_AXIS))
    grid = np.asarray(devices[:need]).reshape(num_clients, data_parallel)
    return Mesh(grid, (CLIENT_AXIS, DATA_AXIS))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host runtime init — the TPU-native replacement for the
    reference's ``accelerate launch`` process-group setup
    (``accelerate_config.yaml:1-11``, SURVEY.md §5.8).

    With no arguments, ``jax.distributed.initialize()`` auto-detects the
    cluster from the TPU pod/GKE/SLURM environment; explicit
    coordinator/process arguments cover bare-metal launches.  Returns the
    process count.

    Failure policy: every caller reached this through an explicit
    ``--multihost``, so a failed init must PROPAGATE — swallowing it would
    silently degrade the run to disconnected per-host copies with no
    cross-host FedAvg (each host training and "averaging" alone).  The only
    benign failure is double-initialization (e.g. a test harness already
    brought the cluster up): detected by message and passed through.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # double-init is benign (an outer harness brought the cluster up).
        # jax wordings vary by version: 0.9 raises "...should only be
        # called once.", older builds say "already initialized".
        msg = str(e).lower()
        if "already" in msg or "once" in msg:
            return jax.process_count()
        raise RuntimeError(
            "jax.distributed.initialize failed under --multihost; refusing "
            "to fall back to single-process (disconnected per-host training "
            "with no cross-host FedAvg).  On bare metal pass "
            "--coordinator_address/--num_processes/--process_id; on TPU "
            f"pods/GKE check the cluster environment.  Cause: {e}"
        ) from e
    return jax.process_count()


def arrange_multihost_grid(
    devices: Sequence,
    process_of,
    num_clients: int,
    data_parallel: Optional[int] = None,
):
    """Order devices into a (client, data) grid that keeps each client's
    data-parallel group on as few processes as possible, so the per-client
    gradient ``pmean`` rides ICI within a slice and only FedAvg's single
    reduction crosses DCN (the scaling-book recipe: collectives on the
    fastest fabric they fit).

    ``process_of(device) -> process index``.  Returns a [C, dp] numpy object
    grid (pure layout logic — testable without real multi-host hardware).
    """
    devices = list(devices)
    n = len(devices)
    if data_parallel is None:
        if n % num_clients != 0:
            raise ValueError(f"{n} devices not divisible by {num_clients} clients")
        data_parallel = n // num_clients
    need = num_clients * data_parallel
    if need > n:
        raise ValueError(f"need {need} devices, have {n}")
    # group devices by process, concatenate process blocks in order: slicing
    # [C, dp] row-major then assigns each client a contiguous run of devices
    # from as few processes as possible.
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(process_of(d), []).append(d)
    ordered = [d for p in sorted(by_proc) for d in by_proc[p]]
    grid = np.empty((num_clients, data_parallel), dtype=object)
    for i, d in enumerate(ordered[:need]):
        grid[i // data_parallel, i % data_parallel] = d
    return grid


def make_multihost_mesh(
    num_clients: int,
    data_parallel: Optional[int] = None,
) -> Mesh:
    """Global (client, data) mesh over every device of every process, with
    clients mapped to DCN-adjacent process blocks (see
    :func:`arrange_multihost_grid`).  Call :func:`initialize_multihost`
    first."""
    grid = arrange_multihost_grid(
        jax.devices(), lambda d: d.process_index, num_clients, data_parallel
    )
    return Mesh(grid, (CLIENT_AXIS, DATA_AXIS))


def clients_for_process(grid, process_of, process_index: int):
    """Which client rows of a (client, data) grid have at least one device
    on this process — the process-count-aware data split: each host only
    loads/feeds the clients it physically hosts."""
    rows = []
    for c in range(grid.shape[0]):
        if any(process_of(d) == process_index for d in grid[c]):
            rows.append(c)
    return rows
