"""Fused delta-Eddington shortwave as a Pallas TPU kernel.

Motivation (xprof, gx1-parity step): the XLA delta-Eddington path costs
~10 ms/step, almost all of it HBM traffic — the adding-method solution
lists (6 lists x (klev+2) interfaces x 3 spectral bands x 3 surface
types of (ncat, ny, nx) planes, ~440 MB per surface type) are
materialized by the downward/upward recurrences and re-read by the flux
partition (`_net_k`), because each interface value has multiple
consumers and XLA will not rematerialize the recurrence into one
fusion.  The physics itself is PURELY per-cell (no stencils, no
reductions), so the entire computation — snow/pond surface setup, layer
inherent optical properties, Fresnel interface, adding recursion, flux
partition, surface-fraction mix (reference: ice_shortwave.F90:1607-3680
run_dEdd/shortwave_dEdd/compute_dEdd/solution_dEdd) — tiles perfectly:
one Pallas kernel holds a (BY, nx) block of cells in VMEM, runs the
whole column solve from registers, and writes only the 13 final output
planes.  HBM traffic drops from ~8 GB to ~0.1 GB per step.

The kernel body simply calls the existing, shape-generic
`shortwave_dEdd` (models/radiation/dedd.py) on the VMEM block — the
Pallas path and the XLA path are THE SAME CODE, so there is no second
implementation of the physics to keep in sync.  Equivalence is tested
in tests/test_dedd_pallas.py (CPU interpret mode) and exercised on TPU
by the parity benchmark.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice5_tpu import constants as ct
from cice5_tpu.models.radiation.dedd import shortwave_dEdd, DEddResult


def _pick_by(ny: int) -> int:
    """Largest row-block <= 16 dividing ny (falls back to ceil-grid).

    VMEM bound: the in-kernel liveness of the three adding solutions is
    ~0.9 MB per block row at nx=320 (measured: 28 MB at by=32), so
    by<=16 keeps the scoped allocation under the 16 MB VMEM budget."""
    for by in (16, 12, 8):
        if ny % by == 0:
            return by
    return min(8, ny)


def shortwave_dEdd_tiled(*, nilyr, nslyr, aicen, vicen, vsnon, Tsfcn,
                         apnd, hpnd, coszen, fnidr, swvdr, swvdf, swidr,
                         swidf, R_ice=0.0, R_pnd=0.0, R_snw=1.5,
                         dT_mlt=1.5, rsnw_mlt=1500.0, kalg=0.6, hs0=0.03,
                         hs1=0.03, pndaspect=0.8, pond_scheme="cesm",
                         block_rows: int | None = None,
                         interpret: bool = False) -> DEddResult:
    """Delta-Eddington for ALL categories via one Pallas kernel.

    aicen/vicen/vsnon/Tsfcn/apnd/hpnd: (ncat, ny, nx); coszen/fnidr/
    swvdr/swvdf/swidr/swidf: (ny, nx) shared forcing. Returns DEddResult
    with (ncat, ...) leading axes — the drop-in equivalent of
    `jax.vmap(shortwave_dEdd)` over the category axis.
    """
    ncat, ny, nx = aicen.shape
    dtype = aicen.dtype
    by = block_rows or _pick_by(ny)
    grid = (ncat, pl.cdiv(ny, by))

    cat_spec = pl.BlockSpec((1, by, nx), lambda c, y: (c, y, 0),
                            memory_space=pltpu.VMEM)
    frc_spec = pl.BlockSpec((by, nx), lambda c, y: (y, 0),
                            memory_space=pltpu.VMEM)
    # per-(category, row-block) "any lit ice" flags, computed in XLA on
    # the same criterion shortwave_dEdd uses for its `lit` mask. The
    # whole (ncat, nyb) table rides in SMEM (Mosaic requires SMEM blocks
    # to equal the full array shape) and the kernel picks its entry by
    # program id.
    nyb = pl.cdiv(ny, by)
    flag_spec = pl.BlockSpec((ncat, nyb), lambda c, y: (0, 0),
                             memory_space=pltpu.SMEM)
    lit2 = ((swvdr + swvdf + swidr + swidf) > ct.puny) \
        & (coszen > ct.puny)
    litc = (aicen > ct.puny) & lit2[None]
    if nyb * by != ny:
        litc = jnp.pad(litc, ((0, 0), (0, nyb * by - ny), (0, 0)))
    flags = jnp.any(litc.reshape(ncat, nyb, by, nx),
                    axis=(2, 3)).astype(jnp.int32)

    def lay_spec(L):
        return pl.BlockSpec((1, L, by, nx), lambda c, y: (c, 0, y, 0),
                            memory_space=pltpu.VMEM)

    core = functools.partial(
        shortwave_dEdd, nilyr=nilyr, nslyr=nslyr, R_ice=R_ice,
        R_pnd=R_pnd, R_snw=R_snw, dT_mlt=dT_mlt, rsnw_mlt=rsnw_mlt,
        kalg=kalg, hs0=hs0, hs1=hs1, pndaspect=pndaspect,
        pond_scheme=pond_scheme)

    def kernel(flg, aic, vic, vsn, tsf, ap, hp, cz, fni, svdr, svdf,
               sidr, sidf, *outs):
        # Block-level lit skip: shortwave_dEdd zeroes every output where
        # `lit = aicen>puny & netsw>puny & coszen>puny` is false, so a
        # block with no lit ice cell anywhere produces all-zero outputs
        # and the whole column solve can be skipped (the reference's
        # compressed icells-with-daylight list, ice_shortwave.F90:1607+,
        # expressed at block granularity). On gx1 ice occupies only the
        # polar row bands, so ~70-80% of (category, row-block) blocks
        # skip — this is the dominant remaining dEdd cost.
        lit_blk = flg[pl.program_id(0), pl.program_id(1)]

        @pl.when(lit_blk != 0)
        def _compute():
            r = core(aicen=aic[0], vicen=vic[0], vsnon=vsn[0],
                     Tsfcn=tsf[0], apnd=ap[0], hpnd=hp[0], coszen=cz[:],
                     fnidr=fni[:], swvdr=svdr[:], swvdf=svdf[:],
                     swidr=sidr[:], swidf=sidf[:])
            for o, v in zip(outs, r):
                o[0] = v

        @pl.when(lit_blk == 0)
        def _zero():
            for o in outs:
                o[0] = jnp.zeros(o.shape[1:], o.dtype)

    plane = jax.ShapeDtypeStruct((ncat, ny, nx), dtype)
    out_shape = DEddResult(
        alvdrn=plane, alvdfn=plane, alidrn=plane, alidfn=plane,
        fswsfcn=plane, fswintn=plane, fswthrun=plane,
        Sswabsn=jax.ShapeDtypeStruct((ncat, nslyr, ny, nx), dtype),
        Iswabsn=jax.ShapeDtypeStruct((ncat, nilyr, ny, nx), dtype),
        fswpenln=jax.ShapeDtypeStruct((ncat, nilyr + 1, ny, nx), dtype),
        albicen=plane, albsnon=plane, albpndn=plane, snowfracn=plane)
    out_specs = DEddResult(
        alvdrn=cat_spec, alvdfn=cat_spec, alidrn=cat_spec,
        alidfn=cat_spec, fswsfcn=cat_spec, fswintn=cat_spec,
        fswthrun=cat_spec, Sswabsn=lay_spec(nslyr),
        Iswabsn=lay_spec(nilyr), fswpenln=lay_spec(nilyr + 1),
        albicen=cat_spec, albsnon=cat_spec, albpndn=cat_spec,
        snowfracn=cat_spec)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[flag_spec] + [cat_spec] * 6 + [frc_spec] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # the in-kernel liveness of the three adding solutions is ~1.3 MB
        # per block row at nx=320 (~21 MB at by=16, measured); raise the
        # Mosaic scoped-VMEM cap above its conservative 16 MB default
        # (v5e VMEM is 128 MiB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(flags, aicen, vicen, vsnon, Tsfcn, apnd, hpnd,
      coszen, fnidr, swvdr, swvdf, swidr, swidf)
    return out
