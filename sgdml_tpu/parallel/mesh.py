"""Mesh construction helpers (single-host 1-D/2-D meshes, multi-host hook)."""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['default_mesh', 'mesh_2d', 'init_distributed', 'NamedSharding', 'P']

log = logging.getLogger(__name__)


def default_mesh(n_devices: int | None = None, axis_name: str = 'dev') -> Mesh:
    """1-D mesh over (a prefix of) the available devices.

    sGDML's parallel axes — kernel rows, query batches, table terms — are
    all flat, so a 1-D mesh rides ICI with simple all-gathers/psums. A 2-D
    mesh (``mesh_2d``) becomes interesting for the distributed Cholesky
    beyond a pod slice.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def mesh_2d(rows: int, cols: int, axis_names=('r', 'c')) -> Mesh:
    """2-D mesh over the first ``rows * cols`` devices.

    Groundwork for beyond-pod-slice solves: with the kernel matrix
    sharded ``P('r', 'c')`` the blocked Cholesky's panel broadcasts ride
    one mesh axis and the rank-nb updates the other, instead of
    all-gathering full panels to every device (the 1-D pattern). The
    current factorization kernels (ops/linalg.py) are GSPMD-partitionable
    over either mesh; a hand-placed block-cyclic ScaLAPACK-style variant
    is future work.
    """
    devices = jax.devices()
    if rows * cols > len(devices):
        raise ValueError(
            'mesh_2d(%d, %d) needs %d devices; %d available'
            % (rows, cols, rows * cols, len(devices))
        )
    return Mesh(
        np.array(devices[: rows * cols]).reshape(rows, cols), tuple(axis_names)
    )


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host (DCN) initialization hook, guarded behind a flag.

    Call once per host process before any mesh construction to span a
    mesh across hosts (``jax.devices()`` then reports the global device
    set). Enabled either by explicit arguments or by the environment:

        SGDML_TPU_DISTRIBUTED=1
        [JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
         or the standard TPU-pod auto-detection]

    Returns True when ``jax.distributed.initialize`` was invoked. A no-op
    (False) on single-host setups, so library code can call it
    unconditionally. The reference has no multi-host story at all (its
    fabric is fork()+POSIX shm on one node, sgdml/train.py:75-94).
    """
    enabled = (
        coordinator is not None
        or os.environ.get('SGDML_TPU_DISTRIBUTED', '') not in ('', '0')
    )
    if not enabled:
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs['coordinator_address'] = coordinator
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    log.info(
        'jax.distributed initialized: process %d/%d, %d global devices.',
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True
