"""Halo exchange: ONE API over single-device and sharded execution.

TPU-native replacement for the reference MPI halo machinery
(/root/reference/mpi/ice_boundary.F90: ice_HaloCreate/ice_HaloUpdate with
precomputed IRECV/ISEND message schedules, 9 dtype/rank variants, masked
halos). Here a field never stores ghost cells; ``extend(field, topo)`` returns
the field with a 1-cell ghost ring filled according to the boundary
conditions:

* single device (``topo.axis_x is None``): ghost ring from jnp.roll/zero pad —
  the analog of the reference's ``serial/`` twin backend (bld/build.sh:138-142).
* inside ``shard_map`` over a 2-D mesh: ghost ring from ``lax.ppermute``
  neighbor exchanges riding ICI. Corners are correct because the x-extension
  happens first and whole extended rows are then exchanged in y.

Non-cyclic (open/closed) global boundaries fill ghosts with zeros, matching
ice_boundary.F90's fill of halo cells outside cyclic/tripole domains; under
sharding this comes for free from lax.ppermute's zero-fill for devices with
no source. The tripole fold (ice_boundary.F90 tripole branches +
ice_HaloUpdate_stress:5564) will layer on top as an index-reversal permute of
the top row; ``loc``/``kind`` arguments already thread the staggering and
sign information it needs.

All functions accept arbitrary leading batch axes: shape (..., ny, nx) ->
(..., ny+2, nx+2). Batched fields should be stacked and extended together so
each subcycle issues ONE pair of neighbor exchanges.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from cice5_tpu.constants import FieldLoc, FieldType


@dataclass(frozen=True)
class Topology:
    """Static description of how (ny, nx) arrays are laid out.

    axis_y/axis_x: shard_map mesh axis names, or None when running unsharded.
    ew/ns: global boundary types ("cyclic" | "open" | "closed" | "tripole").
    """
    ew: str = "cyclic"
    ns: str = "open"
    axis_y: str | None = None
    axis_x: str | None = None

    @property
    def sharded(self) -> bool:
        return self.axis_x is not None or self.axis_y is not None


def _pshift(x, axis_name: str, shift: int, cyclic: bool):
    """Fetch neighbor shard data along a mesh axis.

    shift=+1 returns the value held by the device at index (me - 1)
    (i.e. data arriving from the 'west'/'south'), matching the roll
    convention below. Non-cyclic edges receive zeros.
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        if cyclic:
            return x
        return jnp.zeros_like(x)
    if cyclic:
        perm = [(i, (i + shift) % n) for i in range(n)]
    else:
        perm = [(i, i + shift) for i in range(n) if 0 <= i + shift < n]
    return lax.ppermute(x, axis_name, perm)


def _global_flip_x(row, topo: Topology):
    """Global x-reversal of (..., nx_local) rows. Sharded: local flip +
    mirror-pair ppermute (device ix <-> px-1-ix)."""
    flipped = jnp.flip(row, axis=-1)
    if topo.axis_x is None:
        return flipped
    n = lax.axis_size(topo.axis_x)
    if n == 1:
        return flipped
    perm = [(i, n - 1 - i) for i in range(n)]
    return lax.ppermute(flipped, topo.axis_x, perm)


def _tripole_ghost(f, topo: Topology, loc: FieldLoc, kind: FieldType):
    """North ghost row + symmetrized top row for the tripole U-fold
    (mpi/ice_boundary.F90 tripole branches; U-fold offsets:
    center (0,0), NEcorner (1,1), Eface (1,0), Nface (0,1)).

    Returns (ghost_row (..., 1, nx), top_row_sym (..., 1, nx) or None).
    In 1-based reference indexing the ghost at (i, ny+1) reads
    sign * field(nxGlobal + 1 - i - ioffset, ny - joffset)."""
    sign = -1.0 if kind in (FieldType.VECTOR, FieldType.ANGLE) else 1.0
    ioff, joff = {
        FieldLoc.CENTER: (0, 0),
        FieldLoc.NECORNER: (1, 1),
        FieldLoc.EFACE: (1, 0),
        FieldLoc.NFACE: (0, 1),
    }.get(loc, (0, 0))

    src_row = f[..., -1 - joff:f.shape[-2] - joff, :]   # row ny or ny-1
    gA = _global_flip_x(src_row, topo)                   # maps i -> nx+1-i
    if ioff:
        # maps i -> nx-i: shift the flipped row left by one, cyclic in x
        if topo.axis_x is None:
            g = jnp.roll(gA, -1, axis=-1)
        else:
            nbr = _pshift(gA[..., :1], topo.axis_x, -1, True)
            g = jnp.concatenate([gA[..., 1:], nbr], axis=-1)
    else:
        g = gA
    ghost = sign * g

    # degenerate top-row symmetrization for corner/Nface fields
    top_sym = None
    if loc in (FieldLoc.NECORNER, FieldLoc.NFACE):
        top = f[..., -1:, :]
        tA = _global_flip_x(top, topo)
        if loc == FieldLoc.NECORNER:
            if topo.axis_x is None:
                tB = jnp.roll(tA, -1, axis=-1)
            else:
                nbr = _pshift(tA[..., :1], topo.axis_x, -1, True)
                tB = jnp.concatenate([tA[..., 1:], nbr], axis=-1)
        else:
            tB = tA
        top_sym = 0.5 * (top + sign * tB)
    return ghost, top_sym


def extend(f: jnp.ndarray, topo: Topology,
           loc: FieldLoc = FieldLoc.CENTER,
           kind: FieldType = FieldType.SCALAR) -> jnp.ndarray:
    """Add a 1-cell ghost ring: (..., ny, nx) -> (..., ny+2, nx+2)."""
    tripole = topo.ns in ("tripole", "tripoleT")
    if topo.ns == "tripoleT":
        raise NotImplementedError("tripole T-fold not yet implemented")
    cyc_x = topo.ew == "cyclic"
    cyc_y = topo.ns == "cyclic"

    if tripole:
        # fold ghost row (interior width), before x-extension
        tghost, top_sym = _tripole_ghost(f, topo, loc, kind)
        if top_sym is not None:
            # only the global top row is degenerate; under Y sharding
            # gate the symmetrization to the top device row
            if topo.axis_y is not None:
                is_top = (lax.axis_index(topo.axis_y)
                          == lax.axis_size(topo.axis_y) - 1)
                top_sym = jnp.where(is_top, top_sym, f[..., -1:, :])
            f = jnp.concatenate([f[..., :-1, :], top_sym], axis=-2)

    # --- extend in x ---
    west_edge = f[..., :, -1:]   # what my west ghost should hold if cyclic+unsharded
    east_edge = f[..., :, :1]
    if topo.axis_x is not None:
        wvals = _pshift(f[..., :, -1:], topo.axis_x, +1, cyc_x)
        evals = _pshift(f[..., :, :1], topo.axis_x, -1, cyc_x)
    else:
        if cyc_x:
            wvals, evals = west_edge, east_edge
        else:
            wvals = jnp.zeros_like(west_edge)
            evals = jnp.zeros_like(east_edge)
    fx = jnp.concatenate([wvals, f, evals], axis=-1)

    # --- extend in y (full extended rows -> corners ride along) ---
    south_row = fx[..., -1:, :]
    north_row = fx[..., :1, :]
    if topo.axis_y is not None:
        svals = _pshift(fx[..., -1:, :], topo.axis_y, +1, cyc_y)
        nvals = _pshift(fx[..., :1, :], topo.axis_y, -1, cyc_y)
    else:
        if cyc_y:
            svals, nvals = south_row, north_row
        else:
            svals = jnp.zeros_like(south_row)
            nvals = jnp.zeros_like(north_row)

    if tripole:
        # x-extend the folded ghost row (cyclic) and use it at the north
        # edge; under Y sharding only the top device row applies it.
        tg_w = tghost[..., :, -1:]
        tg_e = tghost[..., :, :1]
        if topo.axis_x is not None:
            tg_w = _pshift(tghost[..., :, -1:], topo.axis_x, +1, True)
            tg_e = _pshift(tghost[..., :, :1], topo.axis_x, -1, True)
        tg_ext = jnp.concatenate([tg_w, tghost, tg_e], axis=-1)
        if topo.axis_y is not None:
            ny_dev = lax.axis_size(topo.axis_y)
            is_top = lax.axis_index(topo.axis_y) == ny_dev - 1
            nvals = jnp.where(is_top, tg_ext, nvals)
        else:
            nvals = tg_ext
    return jnp.concatenate([svals, fx, nvals], axis=-2)


# --- static-slice stencil accessors on extended arrays -------------------
# For an extended array F (ghost ring 1), interior cell (j, i) lives at
# F[j+1, i+1]. These return (..., ny, nx) views shifted by (dj, di).

def interior(F):
    return F[..., 1:-1, 1:-1]


def shifted(F, di: int, dj: int):
    """F at (j + dj, i + di); di/dj in {-1, 0, +1}."""
    j0, j1 = 1 + dj, F.shape[-2] - 1 + dj
    i0, i1 = 1 + di, F.shape[-1] - 1 + di
    return F[..., j0:j1, i0:i1]


def global_sum(x, topo: Topology, axis_names: tuple[str, ...] | None = None):
    """Deterministic global sum of a (...,) shard-local reduction.

    Single device: plain jnp.sum. Sharded: local sum then psum over the mesh
    axes — XLA's psum is deterministic for a fixed mesh, giving the
    reproducibility the reference buys with bfbflag master-ordered sums
    (mpi/ice_global_reductions.F90:142-267) at zero cost.
    """
    s = jnp.sum(x)
    names = axis_names or tuple(n for n in (topo.axis_y, topo.axis_x) if n)
    if names:
        s = lax.psum(s, names)
    return s
