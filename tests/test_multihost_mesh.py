"""Multi-host mesh layout logic (SURVEY.md §5.8: clients on DCN-adjacent
process blocks, data-parallel within a slice riding ICI).  Pure layout tests
— real multi-host init needs a pod; the grid arithmetic is what can regress."""

import dataclasses

import numpy as np
import pytest

from feddat_tpu.parallel.mesh import arrange_multihost_grid, clients_for_process


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    process_index: int


def _devices(num_procs, per_proc, interleave=False):
    devs = [FakeDev(p * per_proc + i, p) for p in range(num_procs) for i in range(per_proc)]
    if interleave:  # global device order sometimes interleaves processes
        devs = sorted(devs, key=lambda d: (d.id % per_proc, d.process_index))
    return devs


def test_clients_within_process_blocks():
    """4 procs x 4 chips, 8 clients x dp=2: every client's dp pair must live
    on ONE process (gradient pmean never touches DCN)."""
    devs = _devices(4, 4)
    grid = arrange_multihost_grid(devs, lambda d: d.process_index, 8, 2)
    assert grid.shape == (8, 2)
    for c in range(8):
        procs = {d.process_index for d in grid[c]}
        assert len(procs) == 1, f"client {c} spans processes {procs}"
    # all 16 devices used exactly once
    ids = sorted(d.id for row in grid for d in row)
    assert ids == list(range(16))


def test_interleaved_device_order_regrouped():
    """Even if jax.devices() interleaves processes, the grid regroups by
    process before slicing."""
    devs = _devices(2, 4, interleave=True)
    grid = arrange_multihost_grid(devs, lambda d: d.process_index, 2, 4)
    for c in range(2):
        assert len({d.process_index for d in grid[c]}) == 1


def test_client_spanning_processes_when_unavoidable():
    """2 procs x 2 chips, 1 client x dp=4: the client must span both procs
    (data axis over DCN) — allowed, just not preferred."""
    devs = _devices(2, 2)
    grid = arrange_multihost_grid(devs, lambda d: d.process_index, 1, 4)
    assert {d.process_index for d in grid[0]} == {0, 1}


def test_default_data_parallel_and_errors():
    devs = _devices(2, 4)
    grid = arrange_multihost_grid(devs, lambda d: d.process_index, 4)
    assert grid.shape == (4, 2)
    with pytest.raises(ValueError):
        arrange_multihost_grid(devs, lambda d: d.process_index, 3)
    with pytest.raises(ValueError):
        arrange_multihost_grid(devs, lambda d: d.process_index, 4, 4)


def test_clients_for_process_split():
    devs = _devices(4, 4)
    grid = arrange_multihost_grid(devs, lambda d: d.process_index, 8, 2)
    seen = []
    for p in range(4):
        rows = clients_for_process(grid, lambda d: d.process_index, p)
        assert len(rows) == 2  # 8 clients / 4 hosts
        seen.extend(rows)
    assert sorted(seen) == list(range(8))
