"""Device-mesh construction and step sharding.

TPU-native replacement for the reference's block decomposition + distribution
machinery (/root/reference/source/ice_blocks.F90, ice_distribution.F90's six
block->rank strategies, ice_domain.F90). On TPU there is no load-balancing
problem to solve with rake/spacecurve heuristics: the domain is split into
equal (ny/py, nx/px) shards over a 2-D mesh and every device runs the same
dense SPMD program; the win the reference gets from land-block elimination
and masked halos comes instead from never being latency-bound (dense compute,
overlapped ppermute halos).
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cice5_tpu.parallel.halo import Topology

AXIS_Y = "Y"
AXIS_X = "X"


def best_mesh_shape(n_devices: int, ny: int, nx: int) -> tuple[int, int]:
    """Pick (py, px) ~ the most-square factorization that divides the grid
    (the analog of proc_decomposition, ice_distribution.F90:199)."""
    best = (1, n_devices)
    best_score = None
    for py in range(1, n_devices + 1):
        if n_devices % py:
            continue
        px = n_devices // py
        if ny % py or nx % px:
            continue
        # prefer square-ish shards (minimize halo perimeter / area)
        score = (ny // py) + (nx // px)
        if best_score is None or score < best_score:
            best, best_score = (py, px), score
    if best_score is None:
        raise ValueError(f"no (py,px) with py*px={n_devices} divides "
                         f"({ny},{nx})")
    return best


def make_mesh(devices=None, ny: int | None = None, nx: int | None = None,
              shape: tuple[int, int] | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = best_mesh_shape(len(devices), ny, nx)
    py, px = shape
    dev_arr = np.asarray(devices[: py * px]).reshape(py, px)
    return Mesh(dev_arr, (AXIS_Y, AXIS_X))


def mesh_topology(mesh: Mesh, ew: str, ns: str) -> Topology:
    return Topology(ew=ew, ns=ns, axis_y=AXIS_Y, axis_x=AXIS_X)


def spatial_spec(ndim_leading: int = 0) -> P:
    """PartitionSpec sharding the trailing (ny, nx) axes."""
    return P(*([None] * ndim_leading), AXIS_Y, AXIS_X)
