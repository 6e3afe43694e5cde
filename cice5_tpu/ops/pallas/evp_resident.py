"""VMEM-resident EVP subcycling: all ndte iterations in one Pallas call.

Motivation (xprof, gx1-parity step): the XLA `fori_loop` over the EVP
subcycles (models/dynamics/evp.py subcycle_sweep) round-trips its whole
carry — velocities, the 12 stress components and the 8 stress-divergence
combinations, ~20 MB at gx1 size — through HBM on every one of the 120
subcycles (~4 ms/step, pure bandwidth; the arithmetic is ~35 MFLOP per
subcycle).  The full working set (carry + ~25 static planes) is only
~40 MB, so on a single device the entire sweep fits in VMEM: this
kernel loads everything once, runs the SAME `subcycle_sweep` function
(imported from evp.py — one implementation of the physics) for all ndte
iterations from VMEM, and writes only the final state.

Single-device only (topo.axis_x/axis_y must be None): the per-subcycle
ghost ring then reduces to rolls/flips/concats that Mosaic executes
in-register, including the tripole U-fold's flip+roll ghost row.  The
sharded path keeps the XLA loop (one ppermute ring per subcycle) or the
chunked margin-decay scheme (evp_chunked).  Reference for the subcycle
structure: ice_dyn_evp.F90:336-410.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice5_tpu.models.dynamics import evp as evp_mod
from cice5_tpu.parallel import halo as halo_mod

_GR_NAMES = ("dxt", "dyt", "dxhy", "dyhx", "cxp", "cyp", "cxm", "cym",
             "tarear", "tinyarea")


def sweep_resident(p, ndte: int, topo, *, uvel, vvel, stressR, maskR,
                   strengthR, gR, icem_u, aiu, uocn, vocn, waterx,
                   watery, forcex, forcey, umassdti, fm, uarear,
                   uvel_init, vvel_init, Cw, interpret: bool = False):
    """Drop-in replacement for evp.subcycle_sweep on one device."""
    if topo.axis_x is not None or topo.axis_y is not None:
        raise NotImplementedError("sweep_resident: single-device only")
    dtype = uvel.dtype
    ny, nx = uvel.shape
    nyr, nxr = maskR.shape

    cw_arr = hasattr(Cw, "shape") and getattr(Cw, "ndim", 0) > 0
    inputs = [uvel, vvel, stressR, maskR.astype(dtype), strengthR,
              icem_u.astype(dtype), aiu, uocn, vocn, waterx, watery,
              forcex, forcey, umassdti, fm, uarear, uvel_init, vvel_init]
    inputs += [gR[k] for k in _GR_NAMES]
    if cw_arr:
        inputs.append(Cw)

    def kernel(*refs):
        ins, outs = refs[:len(inputs)], refs[len(inputs):]
        (u0, v0, st0, mR, sR, imu, aiu_, uo, vo, wx, wy, fx, fy, umdt,
         fm_, uar, ui, vi) = (r[:] for r in ins[:18])
        gRd = {k: ins[18 + i][:] for i, k in enumerate(_GR_NAMES)}
        cw = ins[-1][:] if cw_arr else Cw
        # Mosaic cannot lower lax.rev; have the tripole fold's x-reversal
        # trace as a permutation-matrix contraction instead (bit-exact).
        halo_mod.FLIP_VIA_MATMUL = True
        try:
            u, v, st, diags = evp_mod.subcycle_sweep(
                p, ndte, topo, uvel=u0, vvel=v0, stressR=st0,
                maskR=mR > 0.5, strengthR=sR, gR=gRd, icem_u=imu > 0.5,
                aiu=aiu_, uocn=uo, vocn=vo, waterx=wx, watery=wy,
                forcex=fx, forcey=fy, umassdti=umdt, fm=fm_, uarear=uar,
                uvel_init=ui, vvel_init=vi, Cw=cw)
        finally:
            halo_mod.FLIP_VIA_MATMUL = False
        for o, val in zip(outs, (u, v, st) + diags):
            o[:] = val

    plane = jax.ShapeDtypeStruct((ny, nx), dtype)
    rplane = jax.ShapeDtypeStruct((nyr, nxr), dtype)
    out_shape = (plane, plane, jax.ShapeDtypeStruct((12, nyr, nxr), dtype),
                 rplane, rplane, rplane, rplane, rplane, plane, plane)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        in_specs=[spec] * len(inputs),
        out_specs=(spec,) * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
    u, v, stress = out[0], out[1], out[2]
    return u, v, stress, tuple(out[3:])
