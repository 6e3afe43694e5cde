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
import numpy as np
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


# When True (set trace-time by Pallas kernel bodies, e.g.
# ops/pallas/evp_resident.py), implement the x-reversal as a contraction
# with the anti-diagonal permutation matrix instead of lax.rev, which
# Mosaic cannot lower. The matmul is bit-exact (each output element is
# one input element times 1.0 plus exact zeros, Precision.HIGHEST keeps
# f32 operands unsplit-rounded) and the reversed rows are tiny (a single
# ghost row per subcycle), so MXU cost is negligible.
FLIP_VIA_MATMUL = False


def _flip_last(row):
    """Reverse the last axis; Mosaic-lowerable under FLIP_VIA_MATMUL."""
    if not FLIP_VIA_MATMUL:
        return jnp.flip(row, axis=-1)
    n = row.shape[-1]
    i = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    P = jnp.asarray(i + j == n - 1, row.dtype)
    r2 = row.reshape(-1, n)
    out = jax.lax.dot(r2, P, precision=lax.Precision.HIGHEST)
    return out.reshape(row.shape)


def _global_flip_x(row, topo: Topology):
    """Global x-reversal of (..., nx_local) rows. Sharded: local flip +
    mirror-pair ppermute (device ix <-> px-1-ix)."""
    flipped = _flip_last(row)
    if topo.axis_x is None:
        return flipped
    n = lax.axis_size(topo.axis_x)
    if n == 1:
        return flipped
    perm = [(i, n - 1 - i) for i in range(n)]
    return lax.ppermute(flipped, topo.axis_x, perm)


def _roll_global(row, topo: Topology, shift: int):
    """Cyclic x-roll of a (..., nx_local) row by +-1, across shards."""
    if topo.axis_x is None:
        return jnp.roll(row, shift, axis=-1)
    if shift == -1:
        nbr = _pshift(row[..., :1], topo.axis_x, -1, True)
        return jnp.concatenate([row[..., 1:], nbr], axis=-1)
    nbr = _pshift(row[..., -1:], topo.axis_x, +1, True)
    return jnp.concatenate([nbr, row[..., :-1]], axis=-1)


# fold (ioffset, joffset) per staggering (mpi/ice_boundary.F90:1494-1596):
# ghost(i, ny+1) = sign * field(nxGlobal+1-i-ioffset, ny-joffset)
_UFOLD_OFFSETS = {FieldLoc.CENTER: (0, 0), FieldLoc.NECORNER: (1, 1),
                  FieldLoc.EFACE: (1, 0), FieldLoc.NFACE: (0, 1)}
_TFOLD_OFFSETS = {FieldLoc.CENTER: (-1, 0), FieldLoc.NECORNER: (0, 1),
                  FieldLoc.EFACE: (0, 0), FieldLoc.NFACE: (-1, 1)}
# staggerings whose top physical row lies ON the fold (degenerate row that
# must be symmetrized with its own image)
_UFOLD_DEGEN = (FieldLoc.NECORNER, FieldLoc.NFACE)
_TFOLD_DEGEN = (FieldLoc.CENTER, FieldLoc.EFACE)


def _fold_map(row, topo: Topology, ioff: int):
    """Map column i -> nxGlobal+1-i-ioffset (1-based), i.e. 0-based
    i0 -> (nx-1-i0-ioff) mod nx."""
    gA = _global_flip_x(row, topo)           # i0 -> nx-1-i0
    if ioff == 0:
        return gA
    return _roll_global(gA, topo, -ioff)     # +-1 cyclic shift


def _tripole_ghost(f, topo: Topology, loc: FieldLoc, kind: FieldType):
    """North ghost row + symmetrized top row for the tripole U- or T-fold
    (mpi/ice_boundary.F90:1494-1596).

    Returns (ghost_row (..., 1, nx), top_row_sym (..., 1, nx) or None).
    In 1-based reference indexing the ghost at (i, ny+1) reads
    sign * field(nxGlobal + 1 - i - ioffset, ny - joffset)."""
    sign = -1.0 if kind in (FieldType.VECTOR, FieldType.ANGLE) else 1.0
    tfold = topo.ns == "tripoleT"
    offs = _TFOLD_OFFSETS if tfold else _UFOLD_OFFSETS
    degen = _TFOLD_DEGEN if tfold else _UFOLD_DEGEN
    ioff, joff = offs.get(loc, (0, 0))

    # degenerate top-row symmetrization (row ny maps onto itself)
    top_sym = None
    if loc in degen:
        top = f[..., -1:, :]
        tB = _fold_map(top, topo, ioff)
        top_sym = 0.5 * (top + sign * tB)
        if ioff == -1:
            # T-fold center: i0=0 and i0=nx/2 are their own images; the
            # reference loop (i=2..nx/2) leaves them untouched
            nx_loc = top.shape[-1]
            if topo.axis_x is None:
                selfmask = np.zeros(nx_loc, bool)
                selfmask[0] = True
                if nx_loc % 2 == 0:
                    selfmask[nx_loc // 2] = True
                top_sym = jnp.where(jnp.asarray(selfmask), top, top_sym)
            else:
                npx = lax.axis_size(topo.axis_x)
                ix = lax.axis_index(topo.axis_x)
                col = jnp.arange(nx_loc) + ix * nx_loc
                nxg = nx_loc * npx
                selfmask = (col == 0) | (col == nxg // 2)
                top_sym = jnp.where(selfmask, top, top_sym)

    # ghost row: reads the (symmetrized, for T-fold degenerate locs) source
    # row — the reference symmetrizes the tripole buffer BEFORE copy-out
    if top_sym is not None and joff == 0:
        src_row = top_sym
    else:
        src_row = f[..., -1 - joff:f.shape[-2] - joff, :]   # row ny or ny-1
    ghost = sign * _fold_map(src_row, topo, ioff)
    return ghost, top_sym


def extend(f: jnp.ndarray, topo: Topology,
           loc: FieldLoc = FieldLoc.CENTER,
           kind: FieldType = FieldType.SCALAR,
           open_fill: str = "zero",
           fold_partner: jnp.ndarray | None = None,
           fold_sign: float = 1.0) -> jnp.ndarray:
    """Add a 1-cell ghost ring: (..., ny, nx) -> (..., ny+2, nx+2).

    open_fill: what non-cyclic (open/closed) global-boundary ghosts hold —
    "zero" (the ice_HaloUpdate default fill) or "extrapolate" (linear
    ghost = 2*edge - inner, the ice_HaloExtrapolate semantics used for
    grid variables and regional-domain stencils,
    mpi/ice_boundary.F90:7070-7172).

    fold_partner/fold_sign: on tripole topologies, build the north ghost
    row from ``fold_sign * fold(fold_partner)`` instead of the field
    itself. The 180-degree fold maps one-sided metric coefficients onto
    their PARTNERS (ghost cyp = -cym of the image cell, cxp = -cxm,
    dxhy/dyhx negate; cf. ice_grid.F90:356-367 definitions) — a plain
    scalar fold of cxp would hand the ghost row the image cell's cxp,
    which differs on any grid with nonuniform face lengths. Only
    supported for non-degenerate staggerings (CENTER/EFACE on the U-fold).
    """
    tripole = topo.ns in ("tripole", "tripoleT")
    cyc_x = topo.ew == "cyclic"
    cyc_y = topo.ns == "cyclic"
    extrap = open_fill == "extrapolate"

    if tripole and fold_partner is not None:
        degen = _TFOLD_DEGEN if topo.ns == "tripoleT" else _UFOLD_DEGEN
        if loc in degen:
            raise NotImplementedError(
                "fold_partner on a degenerate (on-fold) staggering")

    if tripole:
        # fold ghost row (interior width), before x-extension
        if fold_partner is not None:
            offs = (_TFOLD_OFFSETS if topo.ns == "tripoleT"
                    else _UFOLD_OFFSETS)
            ioff, joff = offs.get(loc, (0, 0))
            src = fold_partner[..., -1 - joff:fold_partner.shape[-2] - joff,
                               :]
            tghost = fold_sign * _fold_map(src, topo, ioff)
            top_sym = None
        else:
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
    w_ext = 2.0 * f[..., :, :1] - f[..., :, 1:2]     # extrapolated west ghost
    e_ext = 2.0 * f[..., :, -1:] - f[..., :, -2:-1]
    if topo.axis_x is not None:
        wvals = _pshift(f[..., :, -1:], topo.axis_x, +1, cyc_x)
        evals = _pshift(f[..., :, :1], topo.axis_x, -1, cyc_x)
        if extrap and not cyc_x:
            ix = lax.axis_index(topo.axis_x)
            npx = lax.axis_size(topo.axis_x)
            wvals = jnp.where(ix == 0, w_ext, wvals)
            evals = jnp.where(ix == npx - 1, e_ext, evals)
    else:
        if cyc_x:
            wvals, evals = west_edge, east_edge
        elif extrap:
            wvals, evals = w_ext, e_ext
        else:
            wvals = jnp.zeros_like(west_edge)
            evals = jnp.zeros_like(east_edge)
    fx = jnp.concatenate([wvals, f, evals], axis=-1)

    # --- extend in y (full extended rows -> corners ride along) ---
    south_row = fx[..., -1:, :]
    north_row = fx[..., :1, :]
    s_ext = 2.0 * fx[..., :1, :] - fx[..., 1:2, :]
    n_ext = 2.0 * fx[..., -1:, :] - fx[..., -2:-1, :]
    if topo.axis_y is not None:
        svals = _pshift(fx[..., -1:, :], topo.axis_y, +1, cyc_y)
        nvals = _pshift(fx[..., :1, :], topo.axis_y, -1, cyc_y)
        if extrap and not cyc_y and not tripole:
            iy = lax.axis_index(topo.axis_y)
            npy = lax.axis_size(topo.axis_y)
            svals = jnp.where(iy == 0, s_ext, svals)
            nvals = jnp.where(iy == npy - 1, n_ext, nvals)
    else:
        if cyc_y:
            svals, nvals = south_row, north_row
        elif extrap and not tripole:
            svals, nvals = s_ext, n_ext
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


def _tripole_ghost_wide(f, topo: Topology, loc: FieldLoc, kind: FieldType,
                        W: int, fold_partner=None, fold_sign: float = 1.0):
    """W north ghost rows for the tripole fold: ghost row ny+k reads
    sign * field(nxGlobal+1-i-ioffset, ny-joffset-(k-1)) — the W-deep
    generalization of _tripole_ghost (mpi/ice_boundary.F90:1494-1596).

    Returns (ghost (..., W, nx), top_row_sym or None)."""
    sign = -1.0 if kind in (FieldType.VECTOR, FieldType.ANGLE) else 1.0
    tfold = topo.ns == "tripoleT"
    offs = _TFOLD_OFFSETS if tfold else _UFOLD_OFFSETS
    degen = _TFOLD_DEGEN if tfold else _UFOLD_DEGEN
    ioff, joff = offs.get(loc, (0, 0))

    # with fold_partner the caller supplies the exact ghost sources (and
    # any sign premultiplied); the degenerate top row is used as-is —
    # consistent inputs already satisfy the fold symmetry there
    top_sym = None
    if loc in degen and fold_partner is None:
        top = f[..., -1:, :]
        tB = _fold_map(top, topo, ioff)
        top_sym = 0.5 * (top + sign * tB)
        if ioff == -1:
            nx_loc = top.shape[-1]
            if topo.axis_x is None:
                selfmask = np.zeros(nx_loc, bool)
                selfmask[0] = True
                if nx_loc % 2 == 0:
                    selfmask[nx_loc // 2] = True
                top_sym = jnp.where(jnp.asarray(selfmask), top, top_sym)
            else:
                npx = lax.axis_size(topo.axis_x)
                ix = lax.axis_index(topo.axis_x)
                col = jnp.arange(nx_loc) + ix * nx_loc
                nxg = nx_loc * npx
                selfmask = (col == 0) | (col == nxg // 2)
                top_sym = jnp.where(selfmask, top, top_sym)

    src_field = fold_partner if fold_partner is not None else f
    sgn = fold_sign if fold_partner is not None else sign
    ny_l = f.shape[-2]
    if ny_l < W + joff:
        raise ValueError(f"tripole wide fold needs ny_local >= W+joff "
                         f"({ny_l} < {W}+{joff})")
    rows = src_field[..., ny_l - joff - W:ny_l - joff, :]
    if top_sym is not None and joff == 0:
        # the k=1 source is the SYMMETRIZED top row (the reference
        # symmetrizes the tripole buffer before copy-out)
        rows = jnp.concatenate([rows[..., :-1, :], top_sym], axis=-2)
    rows = jnp.flip(rows, axis=-2)          # ghost order k = 1..W
    ghost = sgn * _fold_map(rows, topo, ioff)
    return ghost, top_sym


def extend_wide(f: jnp.ndarray, topo: Topology, W: int,
                loc: FieldLoc = FieldLoc.CENTER,
                kind: FieldType = FieldType.SCALAR,
                fold_partner: jnp.ndarray | None = None,
                fold_sign: float = 1.0) -> jnp.ndarray:
    """Add a W-cell ghost ring in ONE neighbor exchange per side:
    (..., ny, nx) -> (..., ny+2W, nx+2W).

    This is the communication primitive of the chunked (comm/compute-
    overlapped) EVP subcycling: instead of one 1-ring exchange per subcycle
    (the reference's per-subcycle MPI halo, ice_dyn_evp.F90:392-399), a
    K-ring margin is exchanged once per K subcycles and the margin is
    recomputed redundantly, cutting the latency-bound exchange count by K.

    Tripole north seams fill the W ghost rows with the fold image of the
    top W rows (loc/kind staggering + parity as in `extend`;
    fold_partner/fold_sign as in `extend` for one-sided metric
    coefficients). Requires W <= the local shard extent on sharded axes
    (single-hop exchange; W+joff rows locally for the fold).
    """
    tripole = topo.ns in ("tripole", "tripoleT")
    if W == 1 and not tripole:
        return extend(f, topo, loc=loc, kind=kind)
    cyc_x = topo.ew == "cyclic"
    cyc_y = topo.ns == "cyclic"

    tghost = None
    if tripole:
        tghost, top_sym = _tripole_ghost_wide(
            f, topo, loc, kind, W, fold_partner=fold_partner,
            fold_sign=fold_sign)
        if top_sym is not None:
            if topo.axis_y is not None:
                is_top = (lax.axis_index(topo.axis_y)
                          == lax.axis_size(topo.axis_y) - 1)
                top_sym = jnp.where(is_top, top_sym, f[..., -1:, :])
            f = jnp.concatenate([f[..., :-1, :], top_sym], axis=-2)

    # --- x ---
    if topo.axis_x is not None:
        wvals = _pshift(f[..., :, -W:], topo.axis_x, +1, cyc_x)
        evals = _pshift(f[..., :, :W], topo.axis_x, -1, cyc_x)
    elif cyc_x:
        wvals, evals = f[..., :, -W:], f[..., :, :W]
    else:
        wvals = jnp.zeros_like(f[..., :, -W:])
        evals = jnp.zeros_like(f[..., :, :W])
    fx = jnp.concatenate([wvals, f, evals], axis=-1)

    # --- y (full extended rows so corners ride along) ---
    if topo.axis_y is not None:
        svals = _pshift(fx[..., -W:, :], topo.axis_y, +1, cyc_y)
        nvals = _pshift(fx[..., :W, :], topo.axis_y, -1, cyc_y)
    elif cyc_y:
        svals, nvals = fx[..., -W:, :], fx[..., :W, :]
    else:
        svals = jnp.zeros_like(fx[..., -W:, :])
        nvals = jnp.zeros_like(fx[..., :W, :])

    if tripole:
        # x-extend the folded ghost block (cyclic seam) and use it at the
        # north edge; under Y sharding only the top device row applies it
        if topo.axis_x is not None:
            tg_w = _pshift(tghost[..., :, -W:], topo.axis_x, +1, True)
            tg_e = _pshift(tghost[..., :, :W], topo.axis_x, -1, True)
        else:
            tg_w, tg_e = tghost[..., :, -W:], tghost[..., :, :W]
        tg_ext = jnp.concatenate([tg_w, tghost, tg_e], axis=-1)
        if topo.axis_y is not None:
            is_top = (lax.axis_index(topo.axis_y)
                      == lax.axis_size(topo.axis_y) - 1)
            nvals = jnp.where(is_top, tg_ext, nvals)
        else:
            nvals = tg_ext
    return jnp.concatenate([svals, fx, nvals], axis=-2)


def extend_wide_groups(f: jnp.ndarray, topo: Topology, W: int,
                       groups) -> jnp.ndarray:
    """extend_wide for a (C, ny, nx) stack whose entries need DIFFERENT
    tripole fold treatments but should share ONE neighbor exchange.

    groups: list of (channel_slice, loc, kind, fold_partner, fold_sign)
    covering 0..C in order; fold_partner is a (len, ny, nx) stack or None.
    Non-tripole topologies ignore the groups entirely (one extend_wide).

    Used by the chunked EVP on tripole seams: (u, v) fold as NECORNER
    vectors while the 12 stress components fold through the corner-partner
    permutation (ice_HaloUpdate_stress, mpi/ice_boundary.F90:5564) — one
    slab exchange per chunk either way.
    """
    tripole = topo.ns in ("tripole", "tripoleT")
    if not tripole:
        return extend_wide(f, topo, W)
    if topo.ns == "tripoleT":
        raise NotImplementedError("extend_wide_groups: T-fold grids")
    cyc_x = topo.ew == "cyclic"

    ghosts = []
    fparts = []
    for sl, loc, kind, fpart, fsign in groups:
        sub = f[sl]
        g, top_sym = _tripole_ghost_wide(sub, topo, loc, kind, W,
                                         fold_partner=fpart,
                                         fold_sign=fsign)
        if top_sym is not None:
            if topo.axis_y is not None:
                is_top = (lax.axis_index(topo.axis_y)
                          == lax.axis_size(topo.axis_y) - 1)
                top_sym = jnp.where(is_top, top_sym, sub[..., -1:, :])
            sub = jnp.concatenate([sub[..., :-1, :], top_sym], axis=-2)
        ghosts.append(g)
        fparts.append(sub)
    f = jnp.concatenate(fparts, axis=0)
    tghost = jnp.concatenate(ghosts, axis=0)

    # --- x ---
    if topo.axis_x is not None:
        wvals = _pshift(f[..., :, -W:], topo.axis_x, +1, cyc_x)
        evals = _pshift(f[..., :, :W], topo.axis_x, -1, cyc_x)
    elif cyc_x:
        wvals, evals = f[..., :, -W:], f[..., :, :W]
    else:
        wvals = jnp.zeros_like(f[..., :, -W:])
        evals = jnp.zeros_like(f[..., :, :W])
    fx = jnp.concatenate([wvals, f, evals], axis=-1)

    # --- y ---
    if topo.axis_y is not None:
        svals = _pshift(fx[..., -W:, :], topo.axis_y, +1, False)
        nvals = _pshift(fx[..., :W, :], topo.axis_y, -1, False)
    else:
        svals = jnp.zeros_like(fx[..., -W:, :])
        nvals = jnp.zeros_like(fx[..., :W, :])

    if topo.axis_x is not None:
        tg_w = _pshift(tghost[..., :, -W:], topo.axis_x, +1, True)
        tg_e = _pshift(tghost[..., :, :W], topo.axis_x, -1, True)
    else:
        tg_w, tg_e = tghost[..., :, -W:], tghost[..., :, :W]
    tg_ext = jnp.concatenate([tg_w, tghost, tg_e], axis=-1)
    if topo.axis_y is not None:
        is_top = (lax.axis_index(topo.axis_y)
                  == lax.axis_size(topo.axis_y) - 1)
        nvals = jnp.where(is_top, tg_ext, nvals)
    else:
        nvals = tg_ext
    return jnp.concatenate([svals, fx, nvals], axis=-2)


def global_min(x, topo: Topology, axis_names: tuple[str, ...] | None = None):
    """Global minimum of a shard-local array (the global_minval analog,
    mpi/ice_global_reductions.F90:1453)."""
    s = jnp.min(x)
    names = axis_names or tuple(n for n in (topo.axis_y, topo.axis_x) if n)
    if names:
        s = lax.pmin(s, names)
    return s


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
