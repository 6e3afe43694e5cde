"""Fused incremental-remapping transport integrals as a Pallas kernel.

Motivation (xprof, gx1-parity step): the XLA `_integrals` path
(models/transport/remap.py) is the remap's dominant HBM cost (~10
ms/step at gx1 size).  Each tracer flux is a 6-view weighted read of
the ~12 MB extended tracer stacks — on TPU every statically-shifted
view is a separate HBM pass (no cache), so the weight-map application
alone re-reads the (ntrace, ny, nx) stacks 18 times per edge per
category, and the weight-map/donor-select construction re-reads the
(NGROUPS, ny, nx) geometry planes dozens more.

The integrals are per-edge-local: flux at edge (j, i) reads only the
two (north) / three (east) rows of cells around the edge.  This kernel
tiles the flux region by rows, holds the row window of ALL inputs in
VMEM, and runs the SAME `_integrals` code (imported from remap.py) on
VMEM slices — every shifted view is free, and each stack element is
read from HBM exactly once.  Reference: transport_integrals,
ice_transport_remap.F90:3199-3512.

Row windows under Pallas block semantics: BlockSpec index maps address
whole blocks, so an overlapping window is expressed by passing the SAME
(row-padded) array twice with block indices t and t+1 and concatenating
the two blocks in-kernel — the window [t*BY, t*BY + 2*BY) covers the
BY + span - 1 rows the views need (span = 2 north / 3 east).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice5_tpu.models.transport import remap as rm


def _views_north(F, BY, nx):
    """Six donor views for a north-edge row tile: flux row l reads F rows
    l (B*) and l+1 (T*) (cf. remap._nbr_views_north)."""
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


def integrals_tiled(edge: str, donor, triarea, qx, qy, mcE, mxE, myE,
                    tcE, txE, tyE, tracer_type, parent, ny: int, nx: int,
                    block_rows: int = 8, interpret: bool = False):
    """Transport integrals for one edge set over ALL categories.

    donor/triarea: (NGROUPS, nyr, nxr); qx/qy: (NGROUPS, 3, nyr, nxr);
    mcE/mxE/myE: (ncat, ny+2, nx+2); tcE/txE/tyE: (ncat, ntrace, ny+2,
    nx+2).  Returns (mflx (ncat, nyr, nxr),
    mtflx (ncat, ntrace, nyr, nxr)).
    """
    ncat, ntrace = tcE.shape[0], tcE.shape[1]
    dtype = tcE.dtype
    nyr, nxr = donor.shape[-2:]
    nxE = nx + 2
    BY = block_rows
    nb = pl.cdiv(nyr, BY)
    views = _views_north if edge == "north" else _views_east

    # Window block B is block t+1 of the extended fields, CLAMPED to the
    # last addressable (ragged) row block. No physical row pad is needed
    # (an earlier version jnp.pad-ed the ~57 MB tracer stacks — ~1
    # ms/step of pure HBM copies at gx1 size, xprof): whenever the clamp
    # engages, every row the valid flux rows of that tile read already
    # sits in block A — valid flux rows end at nyr-1 and read rows
    # <= nyr + span - 2 <= nyE - 1, all inside A's ragged block since
    # A then covers [t*BY, nyE). Rows of the window beyond nyE are
    # undefined but only feed flux rows >= nyr, which the ragged output
    # write masks.
    nbB = pl.cdiv(mcE.shape[-2], BY)   # addressable row blocks

    def _bidx(t):
        return jnp.minimum(t + 1, nbB - 1)

    mspecA = pl.BlockSpec((1, BY, nxE), lambda c, t: (c, t, 0),
                          memory_space=pltpu.VMEM)
    mspecB = pl.BlockSpec((1, BY, nxE), lambda c, t: (c, _bidx(t), 0),
                          memory_space=pltpu.VMEM)
    tspecA = pl.BlockSpec((1, ntrace, BY, nxE), lambda c, t: (c, 0, t, 0),
                          memory_space=pltpu.VMEM)
    tspecB = pl.BlockSpec((1, ntrace, BY, nxE),
                          lambda c, t: (c, 0, _bidx(t), 0),
                          memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((rm.NGROUPS, BY, nxr), lambda c, t: (0, t, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((rm.NGROUPS, 3, BY, nxr),
                         lambda c, t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM)

    def kernel(dn, ta, qxr, qyr, mcA, mcB, mxA, mxB, myA, myB,
               tcA, tcB, txA, txB, tyA, tyB, mflx_o, mtflx_o):
        cat2 = lambda a, b: jnp.concatenate([a[0], b[0]], axis=-2)
        Fmc = cat2(mcA, mcB)
        Fmx = cat2(mxA, mxB)
        Fmy = cat2(myA, myB)
        Ftc = cat2(tcA, tcB)
        Ftx = cat2(txA, txB)
        Fty = cat2(tyA, tyB)
        fl = rm._integrals(
            dn[:], ta[:], qxr[:], qyr[:],
            views(Fmc, BY, nx), views(Fmx, BY, nx), views(Fmy, BY, nx),
            views(Ftc, BY, nx), views(Ftx, BY, nx), views(Fty, BY, nx),
            tracer_type, parent)
        mflx_o[0] = fl.mflx
        mtflx_o[0] = jnp.stack(fl.mtflx)

    mflx, mtflx = pl.pallas_call(
        kernel,
        grid=(ncat, nb),
        in_specs=[gspec, gspec, qspec, qspec,
                  mspecA, mspecB, mspecA, mspecB, mspecA, mspecB,
                  tspecA, tspecB, tspecA, tspecB, tspecA, tspecB],
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
    )(donor, triarea, qx, qy, mcE, mcE, mxE, mxE, myE, myE,
      tcE, tcE, txE, txE, tyE, tyE)
    return mflx, mtflx
