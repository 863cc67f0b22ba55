"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['default_mesh', 'NamedSharding', 'P']


def default_mesh(n_devices: int | None = None, axis_name: str = 'dev') -> Mesh:
    """1-D mesh over (a prefix of) the available devices.

    sGDML's parallel axes — kernel rows, query batches, table terms — are
    all flat, so a 1-D mesh rides ICI with simple all-gathers/psums; no 2-D
    tiling is needed until the distributed Cholesky lands.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
