"""Ice restoring at open boundaries (reference source/ice_restoring.F90).

For regional (non-cyclic) domains the reference saves the initial (or
restart) state of the cells surrounding the grid and nudges the boundary
cells toward it every step with timescale ``trestore`` days
(ice_HaloRestore, :527-705). Fields here carry no ghost cells, so the
equivalent is nudging the outermost physical row/column at each non-cyclic
global edge; under shard_map the global-edge test uses lax.axis_index.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from cice5_tpu.parallel import Topology


def edge_mask(shape, topo: Topology, dtype=jnp.float32):
    """(ny, nx) mask of cells on non-cyclic global boundaries
    (1.0 on the outermost row/column)."""
    ny, nx = shape
    m = jnp.zeros(shape, dtype)
    if topo.ew != "cyclic":
        west = jnp.zeros(shape, bool).at[:, 0].set(True)
        east = jnp.zeros(shape, bool).at[:, -1].set(True)
        if topo.axis_x is not None:
            ix = lax.axis_index(topo.axis_x)
            npx = lax.axis_size(topo.axis_x)
            west = west & (ix == 0)
            east = east & (ix == npx - 1)
        m = jnp.maximum(m, (west | east).astype(dtype))
    if topo.ns not in ("cyclic", "tripole", "tripoleT"):
        south = jnp.zeros(shape, bool).at[0, :].set(True)
        north = jnp.zeros(shape, bool).at[-1, :].set(True)
        if topo.axis_y is not None:
            iy = lax.axis_index(topo.axis_y)
            npy = lax.axis_size(topo.axis_y)
            south = south & (iy == 0)
            north = north & (iy == npy - 1)
        m = jnp.maximum(m, (south | north).astype(dtype))
    elif topo.ns in ("tripole", "tripoleT"):
        # only the southern edge is open on tripole grids
        south = jnp.zeros(shape, bool).at[0, :].set(True)
        if topo.axis_y is not None:
            south = south & (lax.axis_index(topo.axis_y) == 0)
        m = jnp.maximum(m, south.astype(dtype))
    return m


def restore_ice(dt, trestore_days, state, rest, topo: Topology):
    """Nudge boundary cells of (aicen, vicen, vsnon, trcrn) toward the
    stored restoring state ``rest`` (ice_restoring.F90:527-705).

    trestore_days == 0 applies the restoring state instantaneously."""
    trest = max(float(trestore_days), 0.0) * 86400.0
    ctime = 1.0 if trest <= 0.0 else min(1.0, dt / trest)
    ny, nx = state.aicen.shape[-2:]
    m = edge_mask((ny, nx), topo, state.aicen.dtype)

    def blend(cur, tgt):
        return cur + (tgt - cur) * ctime * m
    return state.replace(
        aicen=blend(state.aicen, rest.aicen),
        vicen=blend(state.vicen, rest.vicen),
        vsnon=blend(state.vsnon, rest.vsnon),
        trcrn=blend(state.trcrn, rest.trcrn))
