"""Fused multi-subcycle EVP kernel (Pallas).

The XLA EVP loop (models/dynamics/evp.py) round-trips the full working set
(velocities, 12 stress components, metrics, forcing) through HBM every one
of the ~120 subcycles. This kernel keeps everything VMEM-resident for K
consecutive subcycles:

* the domain is padded by M = K+1 zero rows top/bottom and cut into
  overlapping Y-windows in plain XLA (slices are free) — each window plus
  its M-row margins fits comfortably in VMEM;
* one ``pl.pallas_call`` per window runs K statically-unrolled subcycles
  using the SAME ``stress_kernel`` / ``stepu`` math as the XLA path (the
  halo is the single-device ``extend``: cyclic-x wrap by concatenation —
  exact, since windows span the full x width — and zero y-padding, whose
  contamination travels one row per subcycle and dies inside the margin);
* window cores are reassembled and the next K-chunk begins.

HBM traffic drops from (subcycles x working set) to (chunks x working set
x small margin overhead). Numerics match the XLA loop exactly up to fp
reassociation — asserted in tests/test_evp_fused.py (one subcycle is
bit-exact).

Measured on TPU v5e at gx1 size (320x384, ndte=120): 6.7-7.4 ms vs 6.6 ms
for the XLA fori_loop — XLA already keeps the loop body fused and overlaps
the HBM traffic, so the kernel is an equal-performance alternative kept as
the Pallas reference implementation, not the default.

Single-device only (the sharded path keeps the XLA loop whose per-subcycle
ppermute halos ride ICI); enabled with DynConfig.evp_algorithm="pallas".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice5_tpu import constants as ct
from cice5_tpu.constants import FieldType
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import (EVPResult, _region,
                                           _extend_stress, stress_kernel)
from cice5_tpu.parallel import Topology, extend

_GR_KEYS = ("dxt", "dyt", "dxhy", "dyhx", "cxp", "cyp", "cxm", "cym",
            "tarear", "tinyarea")


def _fused_window_call(p, K, topo1, *, u, v, stress, gr_stack, strengthR,
                       maskRf, ui, vi, uocn, vocn, waterx, watery, forcex,
                       forcey, umassdti, fm, uarear, aiu, icemf,
                       interpret: bool):
    """One Pallas call: K subcycles on one (H, nx) window.

    u..icemf: interior-window fields (H, nx); stress (12, H+1, nx+1);
    gr_stack (10, H+1, nx+1); strengthR/maskRf (H+1, nx+1).
    Returns (u, v, stress, diag5 (5, H+1, nx+1), strint2 (2, H, nx))."""

    def kernel(u_ref, v_ref, stress_ref, gr_ref, strength_ref, mask_ref,
               ui_ref, vi_ref, uocn_ref, vocn_ref, wx_ref, wy_ref,
               fx_ref, fy_ref, md_ref, fm_ref, ua_ref, aiu_ref, ic_ref,
               u_out, v_out, stress_out, diag_out, strint_out):
        uk = u_ref[:]
        vk = v_ref[:]
        stressk = stress_ref[:]
        gR = {k: gr_ref[i] for i, k in enumerate(_GR_KEYS)}
        strengthR = strength_ref[:]
        maskR = mask_ref[:] > 0.5
        icem = ic_ref[:] > 0.5
        uvi, vvi = ui_ref[:], vi_ref[:]
        uo, vo = uocn_ref[:], vocn_ref[:]
        wx, wy = wx_ref[:], wy_ref[:]
        fx, fy = fx_ref[:], fy_ref[:]
        md, fmv, ua, aiuv = md_ref[:], fm_ref[:], ua_ref[:], aiu_ref[:]

        r = s = None
        for _ in range(K):
            uvE = extend(jnp.stack([uk, vk]), topo1)
            r = stress_kernel(p, uvE[0], uvE[1], stressk, maskR=maskR,
                              strengthR=strengthR, gR=gR)
            s = dyn.stepu(p, icemask=icem, aiu=aiuv, strE=r.str8, uocn=uo,
                          vocn=vo, waterx=wx, watery=wy, forcex=fx,
                          forcey=fy, umassdti=md, fm=fmv, uarear=ua,
                          uvel_init=uvi, vvel_init=vvi, uvel=uk, vvel=vk)
            uk, vk, stressk = s.uvel, s.vvel, r.stress

        u_out[:] = uk
        v_out[:] = vk
        stress_out[:] = stressk
        diag_out[:] = jnp.stack([r.divu, r.shear, r.rdg_conv, r.rdg_shear,
                                 r.prs_sig])
        strint_out[:] = jnp.stack([s.strintx, s.strinty])

    H, nx = u.shape
    dt_ = u.dtype
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((H, nx), dt_),
                 jax.ShapeDtypeStruct((H, nx), dt_),
                 jax.ShapeDtypeStruct((12, H + 1, nx + 1), dt_),
                 jax.ShapeDtypeStruct((5, H + 1, nx + 1), dt_),
                 jax.ShapeDtypeStruct((2, H, nx), dt_))
    return pl.pallas_call(
        kernel, out_shape=out_shape,
        in_specs=[vm] * 19, out_specs=(vm,) * 5,
        interpret=interpret,
    )(u, v, stress, gr_stack, strengthR, maskRf, ui, vi, uocn, vocn,
      waterx, watery, forcex, forcey, umassdti, fm, uarear, aiu, icemf)


def evp_fused(dt, p: dyn.EVPParams, grid, topo: Topology, *, aice, vice,
              vsno, strength, strairxT, strairyT, uocn, vocn, uvel, vvel,
              stressp, stressm, stress12, iceumask, ss_tltx=None,
              ss_tlty=None, Cw=ct.dragio, kchunk: int = 10,
              nwin: int = 4) -> EVPResult:
    """EVP driver with the fused Pallas subcycle kernel (same surface as
    models.dynamics.evp.evp; prep mirrors ice_dyn_evp.F90:68-330)."""
    if topo.sharded:
        raise ValueError("evp_fused is single-device; use evp() sharded")
    if topo.ns in ("tripole", "tripoleT"):
        raise NotImplementedError("fused EVP on tripole: use evp()")
    ny, nx = aice.shape
    interpret = jax.devices()[0].platform != "tpu"

    # ---- prep identical to evp() ----
    tmass, icetmask = dyn.icet_mask(aice, vice, vsno, grid.tmask, topo)
    maskR = _region(icetmask.astype(aice.dtype), topo) > 0.5
    aiu = dyn.to_ugrid(aice, grid, topo)
    umass = dyn.to_ugrid(tmass, grid, topo)
    strairx = dyn.to_ugrid(strairxT, grid, topo,
                           kind=FieldType.VECTOR)
    strairy = dyn.to_ugrid(strairyT, grid, topo,
                           kind=FieldType.VECTOR)
    icem_u = grid.umask & (aiu > dyn.A_MIN) & (umass > dyn.M_MIN)
    new_pts = icem_u & (iceumask < 0.5)
    uvel = jnp.where(new_pts, uocn, uvel)
    vvel = jnp.where(new_pts, vocn, vvel)
    uvel = jnp.where(icem_u, uvel, 0.0)
    vvel = jnp.where(icem_u, vvel, 0.0)
    uvel_init, vvel_init = uvel, vvel
    umassdti = jnp.where(icem_u, umass / dt, 0.0)
    fm = grid.fcor * umass
    sgn = jnp.sign(fm)
    waterx = uocn * p.cosw - vocn * p.sinw * sgn
    watery = vocn * p.cosw + uocn * p.sinw * sgn
    if ss_tltx is None:
        strtltx = -fm * vocn
        strtlty = fm * uocn
    else:
        strtltx = -ct.gravit * umass * ss_tltx
        strtlty = -ct.gravit * umass * ss_tlty
    forcex = jnp.where(icem_u, strairx + strtltx, 0.0)
    forcey = jnp.where(icem_u, strairy + strtlty, 0.0)
    gR = {k: _region(getattr(grid, k), topo) for k in _GR_KEYS}
    strengthR = _region(strength, topo)
    stress0 = jnp.concatenate([stressp, stressm, stress12], axis=0)
    stressR = jnp.where(maskR[None], _extend_stress(stress0, topo), 0.0)

    # ---- pad + window + fused chunks ----
    K = kchunk
    M = K + 1
    nchunk, rem = divmod(p.ndte, K)
    assert rem == 0, "ndte must be a multiple of kchunk"
    BS = -(-ny // nwin)                   # interior rows per window

    def padi(f):   # interior (ny, nx) -> (M + ny + M + pad_to_BS, nx)
        extra = nwin * BS - ny
        return jnp.pad(f, ((M, M + extra), (0, 0)))

    def padr(f):   # region (ny+1, nx+1)
        extra = nwin * BS - ny
        return jnp.pad(f, ((M, M + extra), (0, 0)))

    topo1 = Topology(ew=topo.ew, ns="open")
    interior = dict(ui=padi(uvel_init), vi=padi(vvel_init),
                    uocn=padi(uocn), vocn=padi(vocn), waterx=padi(waterx),
                    watery=padi(watery), forcex=padi(forcex),
                    forcey=padi(forcey), umassdti=padi(umassdti),
                    fm=padi(fm), uarear=padi(grid.uarear), aiu=padi(aiu),
                    icemf=padi(icem_u.astype(aice.dtype)))
    gr_pad = jnp.stack([padr(gR[k]) for k in _GR_KEYS])
    strength_pad = padr(strengthR)
    mask_pad = padr(maskR.astype(aice.dtype))

    u_p = padi(uvel)
    v_p = padi(vvel)
    stress_p = jnp.pad(stressR, ((0, 0), (M, M + nwin * BS - ny), (0, 0)))

    H = BS + 2 * M
    diag_p = None
    strint_p = None
    for _ in range(nchunk):
        u_cores, v_cores, s_cores, d_cores, si_cores = [], [], [], [], []
        for w in range(nwin):
            j0 = w * BS
            win_i = {k: jax.lax.dynamic_slice_in_dim(a, j0, H, 0)
                     for k, a in interior.items()}
            out = _fused_window_call(
                p, K, topo1,
                u=jax.lax.dynamic_slice_in_dim(u_p, j0, H, 0),
                v=jax.lax.dynamic_slice_in_dim(v_p, j0, H, 0),
                stress=jax.lax.dynamic_slice_in_dim(stress_p, j0, H + 1, 1),
                gr_stack=jax.lax.dynamic_slice_in_dim(gr_pad, j0, H + 1, 1),
                strengthR=jax.lax.dynamic_slice_in_dim(strength_pad, j0,
                                                       H + 1, 0),
                maskRf=jax.lax.dynamic_slice_in_dim(mask_pad, j0, H + 1, 0),
                interpret=interpret, **win_i)
            uo_, vo_, so_, do_, sio_ = out
            u_cores.append(uo_[M:M + BS])
            v_cores.append(vo_[M:M + BS])
            s_cores.append(so_[:, M:M + BS])
            d_cores.append(do_[:, M:M + BS])
            si_cores.append(sio_[:, M:M + BS])
        u_p = jnp.pad(jnp.concatenate(u_cores, axis=0), ((M, M), (0, 0)))
        v_p = jnp.pad(jnp.concatenate(v_cores, axis=0), ((M, M), (0, 0)))
        core_s = jnp.concatenate(s_cores, axis=1)
        # regenerate the region's north ghost row content by re-padding;
        # window margins recompute it from the zero-padded velocities
        # exactly as the global single-device extend would
        stress_p = jnp.pad(core_s, ((0, 0), (M, M + 1), (0, 0)))
        diag_p = jnp.concatenate(d_cores, axis=1)
        strint_p = jnp.concatenate(si_cores, axis=1)

    u = u_p[M:M + ny]
    v = v_p[M:M + ny]
    stressR_out = jnp.pad(stress_p[:, M:M + ny], ((0, 0), (0, 1), (0, 0)))
    divu, shear, rconv, rshear, prs = [
        jnp.pad(diag_p[i, :ny], ((0, 1), (0, 0))) for i in range(5)]
    strintx = strint_p[0, :ny]
    strinty = strint_p[1, :ny]

    strocnx, strocny, sTx_u, sTy_u = dyn.evp_finish(
        p, icemask=icem_u, uvel=u, vvel=v, uocn=uocn, vocn=vocn, aiu=aiu,
        fm=fm, Cw=Cw)
    strocnxT = dyn.to_tgrid(sTx_u, grid, topo)
    strocnyT = dyn.to_tgrid(sTy_u, grid, topo)

    crop = lambda a: a[..., :ny, :nx]
    return EVPResult(
        uvel=u, vvel=v,
        stressp=crop(stressR_out[0:4]), stressm=crop(stressR_out[4:8]),
        stress12=crop(stressR_out[8:12]),
        iceumask=icem_u.astype(aice.dtype),
        strocnx=strocnx, strocny=strocny,
        strocnxT=strocnxT, strocnyT=strocnyT,
        strairx=strairx, strairy=strairy,
        strintx=strintx, strinty=strinty,
        strtltx=strtltx, strtlty=strtlty,
        divu=crop(divu), shear=crop(shear), rdg_conv=crop(rconv),
        rdg_shear=crop(rshear), prs_sig=crop(prs), fm=fm)
