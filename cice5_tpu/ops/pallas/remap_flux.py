"""Fused incremental-remapping reconstruction + transport integrals as a
Pallas kernel.

Motivation (xprof, gx1-parity step): the XLA `_integrals` path
(models/transport/remap.py) is the remap's dominant HBM cost (~10
ms/step at gx1 size).  Each tracer flux is a 6-view weighted read of
the ~12 MB extended tracer stacks — on TPU every statically-shifted
view is a separate HBM pass (no cache), so the weight-map application
alone re-reads the (ntrace, ny, nx) stacks 18 times per edge per
category, and the weight-map/donor-select construction re-reads the
(NGROUPS, ny, nx) geometry planes dozens more.

Both the integrals AND the van-Leer reconstruction are row-local: flux
at edge (j, i) reads reconstructions of the 2-3 rows of cells around
the edge, and each cell's limited gradient reads its 3x3 raw
neighborhood.  This kernel therefore takes the RAW mass/tracer fields
(one W=2 `extend_wide` ring) and per row tile (1) rebuilds the limited
linear reconstructions in VMEM (`remap._reconstruct_ext` — VPU work on
resident data) and (2) runs the SAME `_integrals` code on VMEM slices.
Compared to materializing + re-extending the (ncat, ntrace, ny, nx)
tc/tx/ty stacks in HBM and streaming all three through both edge
passes (the previous kernel), tracer HBM traffic drops from ~9 stack
round-trips per step to ~3 (one extend_wide write + one read per edge)
— worth ~2 ms/step at gx1 parity.  Reference: construct_fields +
transport_integrals, ice_transport_remap.F90:1024-1316,3199-3512.

Row windows under Pallas block semantics: BlockSpec index maps address
whole blocks, so an overlapping window is expressed by passing the SAME
array twice with block indices t and t+1 and concatenating the two
blocks in-kernel.  With the W=2 ring, 2-ring row r maps to 1-ring row
r-1, so the reconstruction of window rows [t*BY, t*BY+2*BY) yields
reconstructed rows in exactly the 1-ring indexing the donor views
expect, starting at 1-ring row t*BY — the view slices are unchanged
from the tc/tx/ty-input version of this kernel.  Requires
BY >= span + 1 = 4 (east) so every gradient a valid flux row needs
stays inside the two-block window.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice5_tpu.models.transport import remap as rm


def _views_north(F, BY, nx):
    """Six donor views for a north-edge row tile: flux row l reads F rows
    l (B*) and l+1 (T*) (cf. remap._nbr_views_north).  F is in 1-ring
    indexing (the reconstruction of a 2-ring window)."""
    return {
        rm.BC: F[..., 0:BY, 1:nx + 1],
        rm.TC: F[..., 1:BY + 1, 1:nx + 1],
        rm.BL: F[..., 0:BY, 0:nx],
        rm.TL: F[..., 1:BY + 1, 0:nx],
        rm.BR: F[..., 0:BY, 2:nx + 2],
        rm.TR: F[..., 1:BY + 1, 2:nx + 2],
    }


def _views_east(F, BY, nx):
    """Six donor views for an east-edge row tile: flux row l reads F rows
    l (BR/TR), l+1 (BC/TC), l+2 (BL/TL) (cf. remap._nbr_views_east)."""
    return {
        rm.BC: F[..., 1:BY + 1, 0:nx + 1],
        rm.TC: F[..., 1:BY + 1, 1:nx + 2],
        rm.BL: F[..., 2:BY + 2, 0:nx + 1],
        rm.TL: F[..., 2:BY + 2, 1:nx + 2],
        rm.BR: F[..., 0:BY, 0:nx + 1],
        rm.TR: F[..., 0:BY, 1:nx + 2],
    }


def integrals_tiled(edge: str, donor, triarea, qx, qy, mmE2, tmE2, hmE2,
                    tracer_type, parent, ny: int, nx: int,
                    block_rows: int = 8, interpret: bool = False):
    """Reconstruction + transport integrals for one edge set, all
    categories.

    donor/triarea: (NGROUPS, nyr, nxr); qx/qy: (NGROUPS, 3, nyr, nxr);
    mmE2: (ncat, ny+4, nx+4); tmE2: (ncat, ntrace, ny+4, nx+4);
    hmE2: (ny+4, nx+4) — RAW fields with a W=2 `extend_wide` ghost ring.
    Returns (mflx (ncat, nyr, nxr), mtflx (ncat, ntrace, nyr, nxr)).
    """
    ncat, ntrace = tmE2.shape[0], tmE2.shape[1]
    dtype = tmE2.dtype
    nyr, nxr = donor.shape[-2:]
    nxE2 = nx + 4
    BY = block_rows
    assert BY >= 4, "window needs BY >= span + 1 = 4"
    nb = pl.cdiv(nyr, BY)
    views = _views_north if edge == "north" else _views_east

    # Window block B is block t+1 of the 2-ring fields, CLAMPED to the
    # last addressable (ragged) row block. No physical row pad is needed:
    # whenever the clamp engages, every raw row the valid flux rows of
    # that tile need already sits in block A — valid flux rows end at
    # nyr-1, their donor reconstructions end at 1-ring row
    # nyr + span - 2, whose gradients read 2-ring rows <= nyr + span
    # <= ny + 3 = the last 2-ring row; A then covers [t*BY, ny+4). Rows
    # of the window beyond ny+4 are undefined but (row-local
    # reconstruction + row-local integrals) only feed flux rows >= nyr,
    # which the ragged output write masks.
    nbB = pl.cdiv(mmE2.shape[-2], BY)   # addressable row blocks

    def _bidx(t):
        return jnp.minimum(t + 1, nbB - 1)

    mspecA = pl.BlockSpec((1, BY, nxE2), lambda c, t: (c, t, 0),
                          memory_space=pltpu.VMEM)
    mspecB = pl.BlockSpec((1, BY, nxE2), lambda c, t: (c, _bidx(t), 0),
                          memory_space=pltpu.VMEM)
    tspecA = pl.BlockSpec((1, ntrace, BY, nxE2), lambda c, t: (c, 0, t, 0),
                          memory_space=pltpu.VMEM)
    tspecB = pl.BlockSpec((1, ntrace, BY, nxE2),
                          lambda c, t: (c, 0, _bidx(t), 0),
                          memory_space=pltpu.VMEM)
    hspecA = pl.BlockSpec((BY, nxE2), lambda c, t: (t, 0),
                          memory_space=pltpu.VMEM)
    hspecB = pl.BlockSpec((BY, nxE2), lambda c, t: (_bidx(t), 0),
                          memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((rm.NGROUPS, BY, nxr), lambda c, t: (0, t, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((rm.NGROUPS, 3, BY, nxr),
                         lambda c, t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM)

    def kernel(dn, ta, qxr, qyr, mmA, mmB, tmA, tmB, hmA, hmB,
               mflx_o, mtflx_o):
        Wm = jnp.concatenate([mmA[0], mmB[0]], axis=-2)      # (2BY, nxE2)
        Wt = jnp.concatenate([tmA[0], tmB[0]], axis=-2)      # (nt,2BY,nxE2)
        Wh = jnp.concatenate([hmA[:], hmB[:]], axis=-2)
        mc, mx, my, tc, tx, ty = rm._reconstruct_ext(
            Wm, Wt, Wh, tracer_type, parent)                 # (2BY-2, nx+2)
        fl = rm._integrals(
            dn[:], ta[:], qxr[:], qyr[:],
            views(mc, BY, nx), views(mx, BY, nx), views(my, BY, nx),
            views(tc, BY, nx), views(tx, BY, nx), views(ty, BY, nx),
            tracer_type, parent)
        mflx_o[0] = fl.mflx
        mtflx_o[0] = jnp.stack(fl.mtflx)

    mflx, mtflx = pl.pallas_call(
        kernel,
        grid=(ncat, nb),
        in_specs=[gspec, gspec, qspec, qspec,
                  mspecA, mspecB, tspecA, tspecB, hspecA, hspecB],
        out_specs=(pl.BlockSpec((1, BY, nxr), lambda c, t: (c, t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, ntrace, BY, nxr),
                                lambda c, t: (c, 0, t, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((ncat, nyr, nxr), dtype),
                   jax.ShapeDtypeStruct((ncat, ntrace, nyr, nxr), dtype)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(donor, triarea, qx, qy, mmE2, mmE2, tmE2, tmE2, hmE2, hmE2)
    return mflx, mtflx


def integrals_tiled_both(geomN, geomE, mmE2, tmE2, hmE2, tracer_type,
                         parent, ny: int, nx: int, block_rows: int = 8,
                         interpret: bool = False):
    """Reconstruction + BOTH edge sets' transport integrals in one kernel.

    The per-edge kernel (`integrals_tiled`) rebuilds the limited
    reconstruction per row window — calling it twice (north, east)
    reconstructs every cell twice and streams the raw window from HBM
    twice. This merged kernel reconstructs each window ONCE and applies
    both view sets to it; on the gx1-parity profile the two per-edge
    kernels are the largest custom-call cost (~2.8 ms each), mostly VPU
    work, and the shared reconstruction is the redundant half.

    geomN: (donor, triarea, qx, qy) for north edges, rows ny+1;
    geomE: same for east edges, rows ny (row-padded to ny+1 here — the
    pad row's outputs are garbage and sliced off before return).
    Returns (fn_mflx (ncat, ny+1, nx), fn_mtflx (ncat, ntrace, ny+1, nx),
    fe_mflx (ncat, ny, nx+1), fe_mtflx (ncat, ntrace, ny, nx+1)).
    """
    ncat, ntrace = tmE2.shape[0], tmE2.shape[1]
    dtype = tmE2.dtype
    nxE2 = nx + 4
    BY = block_rows
    assert BY >= 4, "window needs BY >= span + 1 = 4"
    nyrN = ny + 1
    nb = pl.cdiv(nyrN, BY)
    nbB = pl.cdiv(mmE2.shape[-2], BY)

    def _pad_row(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 0)])

    dnN, taN, qxN, qyN = geomN
    dnE, taE, qxE, qyE = (_pad_row(a) for a in geomE)

    def _bidx(t):
        return jnp.minimum(t + 1, nbB - 1)

    mspecA = pl.BlockSpec((1, BY, nxE2), lambda c, t: (c, t, 0),
                          memory_space=pltpu.VMEM)
    mspecB = pl.BlockSpec((1, BY, nxE2), lambda c, t: (c, _bidx(t), 0),
                          memory_space=pltpu.VMEM)
    tspecA = pl.BlockSpec((1, ntrace, BY, nxE2), lambda c, t: (c, 0, t, 0),
                          memory_space=pltpu.VMEM)
    tspecB = pl.BlockSpec((1, ntrace, BY, nxE2),
                          lambda c, t: (c, 0, _bidx(t), 0),
                          memory_space=pltpu.VMEM)
    hspecA = pl.BlockSpec((BY, nxE2), lambda c, t: (t, 0),
                          memory_space=pltpu.VMEM)
    hspecB = pl.BlockSpec((BY, nxE2), lambda c, t: (_bidx(t), 0),
                          memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((ncat, nb), lambda c, t: (0, 0),
                             memory_space=pltpu.SMEM)

    # Block-level ice skip: every flux a block emits integrates the mass
    # reconstruction of donor cells inside its two-block row window
    # (incl. the W=2 ring, all carried by mmE2), and the reconstruction
    # of an exactly-zero mass field is exactly zero (zero center values,
    # zero limited gradients), so mflx == mtflx == 0 wherever the window
    # holds no ice. mm is aicen, exactly 0.0 on ice-free ocean — on gx1
    # only the polar row bands carry ice, so most (category, tile)
    # blocks skip the reconstruction and both integral passes entirely
    # (the reference's icellsnc/icellsec compressed edge lists,
    # ice_transport_remap.F90:1024-1316, at block granularity).
    nrows = mmE2.shape[-2]
    padr = nbB * BY - nrows
    mm_pad = jnp.pad(mmE2, [(0, 0), (0, padr), (0, 0)]) if padr \
        else mmE2
    anyA = jnp.any(mm_pad.reshape(ncat, nbB, BY, nxE2) != 0.0,
                   axis=(2, 3))
    tidx = jnp.minimum(jnp.arange(nb) + 1, nbB - 1)
    flags = (anyA[:, :nb] | anyA[:, tidx]).astype(jnp.int32)

    def gspec(nxr):
        return pl.BlockSpec((rm.NGROUPS, BY, nxr), lambda c, t: (0, t, 0),
                            memory_space=pltpu.VMEM)

    def qspec(nxr):
        return pl.BlockSpec((rm.NGROUPS, 3, BY, nxr),
                            lambda c, t: (0, 0, t, 0),
                            memory_space=pltpu.VMEM)

    def kernel(flg, dnNr, taNr, qxNr, qyNr, dnEr, taEr, qxEr, qyEr,
               mmA, mmB, tmA, tmB, hmA, hmB,
               mflxN_o, mtflxN_o, mflxE_o, mtflxE_o):
        lit_blk = flg[pl.program_id(0), pl.program_id(1)]

        @pl.when(lit_blk != 0)
        def _compute():
            Wm = jnp.concatenate([mmA[0], mmB[0]], axis=-2)
            Wt = jnp.concatenate([tmA[0], tmB[0]], axis=-2)
            Wh = jnp.concatenate([hmA[:], hmB[:]], axis=-2)
            mc, mx, my, tc, tx, ty = rm._reconstruct_ext(
                Wm, Wt, Wh, tracer_type, parent)
            flN = rm._integrals(
                dnNr[:], taNr[:], qxNr[:], qyNr[:],
                _views_north(mc, BY, nx), _views_north(mx, BY, nx),
                _views_north(my, BY, nx), _views_north(tc, BY, nx),
                _views_north(tx, BY, nx), _views_north(ty, BY, nx),
                tracer_type, parent)
            flE = rm._integrals(
                dnEr[:], taEr[:], qxEr[:], qyEr[:],
                _views_east(mc, BY, nx), _views_east(mx, BY, nx),
                _views_east(my, BY, nx), _views_east(tc, BY, nx),
                _views_east(tx, BY, nx), _views_east(ty, BY, nx),
                tracer_type, parent)
            mflxN_o[0] = flN.mflx
            mtflxN_o[0] = jnp.stack(flN.mtflx)
            mflxE_o[0] = flE.mflx
            mtflxE_o[0] = jnp.stack(flE.mtflx)

        @pl.when(lit_blk == 0)
        def _zero():
            for o in (mflxN_o, mtflxN_o, mflxE_o, mtflxE_o):
                o[0] = jnp.zeros(o.shape[1:], o.dtype)

    def ospec(nxr):
        return (pl.BlockSpec((1, BY, nxr), lambda c, t: (c, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ntrace, BY, nxr),
                             lambda c, t: (c, 0, t, 0),
                             memory_space=pltpu.VMEM))
    osN = ospec(nx)
    osE = ospec(nx + 1)

    fn_mflx, fn_mtflx, fe_mflx, fe_mtflx = pl.pallas_call(
        kernel,
        grid=(ncat, nb),
        in_specs=[flag_spec,
                  gspec(nx), gspec(nx), qspec(nx), qspec(nx),
                  gspec(nx + 1), gspec(nx + 1), qspec(nx + 1),
                  qspec(nx + 1),
                  mspecA, mspecB, tspecA, tspecB, hspecA, hspecB],
        out_specs=(osN[0], osN[1], osE[0], osE[1]),
        out_shape=(jax.ShapeDtypeStruct((ncat, nyrN, nx), dtype),
                   jax.ShapeDtypeStruct((ncat, ntrace, nyrN, nx), dtype),
                   jax.ShapeDtypeStruct((ncat, nyrN, nx + 1), dtype),
                   jax.ShapeDtypeStruct((ncat, ntrace, nyrN, nx + 1),
                                        dtype)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(flags, dnN, taN, qxN, qyN, dnE, taE, qxE, qyE,
      mmE2, mmE2, tmE2, tmE2, hmE2, hmE2)
    return (fn_mflx, fn_mtflx,
            fe_mflx[:, :ny], fe_mtflx[:, :, :ny])
