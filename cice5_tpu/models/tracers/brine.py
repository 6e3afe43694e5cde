"""Dynamic brine height tracer (reference source/ice_brine.F90).

The fbri tracer is the ratio hbr/hin of the brine surface height (measured
from the ice bottom) to the ice thickness. Each step the brine column is
raised by bottom congelation and lowered by top/bottom melt
(``preflushing_changes``, ice_brine.F90:115-210), the ice microstructure
(porosity, brine salinity/density, permeability) is diagnosed on the bio
grid from the mushy-physics constitutive relations
(``compute_microS_mushy``/``prepare_hbrine``, :218-545), and the brine
surface relaxes toward sea level by Darcy flow through the ice
(``update_hbrine``, :546-633).

TPU re-design notes:
* The reference's per-cell ``remap_layers_bgc`` (ice_zbgc_shared.F90:21)
  builds a combined donor/receiver grid walk; here the same piecewise-linear
  profile is sampled at receiver positions with a dense one-hot segment
  select, vectorized over all cells (layer counts are static).
* All ``icells`` compressed loops become masked arithmetic on (ncat, ny, nx)
  or flattened batch arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo import mushy

# ice_brine.F90:31-40
MAXHBR = 1.25         # brine overflows if hbr > maxhbr * hin
VISCOS = 2.1e-6       # kinematic viscosity (m^2/s)
A1, A2, A3 = -21.4, -0.886, -0.012   # brine salinity cubic in T
B1, B2 = 1000.0, 0.8                  # brine density linear in S
# ice_zbgc_shared.F90:110-126
SK_L = 0.03           # skeletal layer thickness (m)
PHI_SK = 0.30         # skeletal layer porosity
EXP_H = 3.0           # hierarchical permeability exponent
K_O = 3.0e-8          # permeability scaling factor (m^2)
RHOSI = 940.0         # average sea-ice density (kg/m^3)
HBR_MIN = 0.01        # minimum brine thickness (m)
THINS = 0.05          # minimum ice thickness for dynamic brine (m)
PHI_SNOW = 0.5        # snow porosity (ice_zbgc.F90:81)
DH_MIN = 0.001        # brine stays within dh_min of sea level (thin ice)


def bio_grids(nilyr: int, nblyr: int):
    """Vertical grids, ice top (0) to bottom (1) (ice_brine.F90:62-91):
    bgrid (nblyr+2 incl. boundary points), igrid (nblyr+1 interfaces),
    cgrid (nilyr layer midpoints of the CICE grid)."""
    zspace = 1.0 / max(1, nblyr)
    bgrid = np.zeros(nblyr + 2)
    bgrid[-1] = 1.0
    for k in range(1, nblyr + 1):
        bgrid[k] = zspace * (k - 0.5)
    igrid = np.zeros(nblyr + 1)
    igrid[-1] = 1.0
    for k in range(1, nblyr):
        igrid[k] = 0.5 * (bgrid[k] + bgrid[k + 1])
    cgrid = (np.arange(1, nilyr + 1) - 0.5) / nilyr
    return bgrid, igrid, cgrid


class Preflush(NamedTuple):
    hin: jnp.ndarray
    hsn: jnp.ndarray
    hbr_old: jnp.ndarray
    dhbr_top: jnp.ndarray
    dhbr_bot: jnp.ndarray
    fbri: jnp.ndarray
    hin_old: jnp.ndarray


def preflushing_changes(aicen, vicen, vsnon, meltb, meltt, congel, snoice,
                        hice_old, fbri, first_ice) -> Preflush:
    """Brine top/bottom boundary changes before flushing
    (ice_brine.F90:115-210). hice_old: previous-step thickness; first_ice:
    1.0 where initialized values should be used."""
    active = aicen > ct.puny
    ar = 1.0 / jnp.maximum(aicen, ct.puny)
    hin = vicen * ar
    hsn = vsnon * ar
    hin_old = jnp.maximum(0.0, hin + meltb + meltt - congel - snoice)
    dhice = hin_old - hice_old               # subl/cond contribution
    dhbr_top = meltt - dhice - snoice
    dhbr_bot = congel - meltb

    fresh = (hice_old < ct.puny) | (hin_old < ct.puny) | (first_ice > 0.5)
    hin_old = jnp.where(fresh, hin, hin_old)
    dhbr_top = jnp.where(fresh | ~active, 0.0, dhbr_top)
    dhbr_bot = jnp.where(fresh | ~active, 0.0, dhbr_bot)
    fbri = jnp.where(fresh & active, 1.0, fbri)
    hbr_old = fbri * hice_old
    hbr_old = jnp.where(fresh, fbri * hin_old, hbr_old)
    return Preflush(hin=hin, hsn=hsn, hbr_old=hbr_old, dhbr_top=dhbr_top,
                    dhbr_bot=dhbr_bot, fbri=fbri, hin_old=hin_old)


def remap_to_bio_grid(tr_lyr, hice, hbr, cgrid, bgrid_pts):
    """Sample the piecewise-linear donor profile through (position, value)
    points at bio-grid positions (ice_zbgc_shared.F90:21-132,
    cice-to-bio branch, nr0 == 0).

    tr_lyr: (..., nilyr) CICE-layer values; returns (..., nblyr+1) values at
    bgrid[0:nblyr+1] positions. Positions measured with the ice/brine offset
    handling of the reference: if hice > hbr the ice column is shifted so
    both start at the brine surface."""
    nilyr = tr_lyr.shape[-1]
    # donor points: n = nilyr + 2 (top pad, layers, bottom pad)
    hmin = jnp.minimum(hbr, hice)
    top = jnp.minimum(jnp.minimum(-hice + hbr, -hbr + hice),
                      0.0)[..., None]
    ice_deeper = (hice > hbr)[..., None]
    cg = jnp.asarray(cgrid, tr_lyr.dtype)
    d_mid = jnp.where(ice_deeper,
                      (cg - 1.0) * hice[..., None] + hbr[..., None],
                      cg * hice[..., None])
    dpos = jnp.concatenate([top, d_mid, hmin[..., None]], axis=-1)
    dval = jnp.concatenate([tr_lyr[..., :1], tr_lyr, tr_lyr[..., -1:]],
                           axis=-1)

    # receiver points: bgrid[0..nblyr]*hbr (or shifted when hbr > hice)
    bg = jnp.asarray(bgrid_pts, tr_lyr.dtype)
    r = jnp.where(ice_deeper, bg * hbr[..., None],
                  (bg - 1.0) * hbr[..., None] + hice[..., None])
    r0 = jnp.where(hice > hbr, jnp.zeros_like(hbr),
                   -hbr + hice)[..., None]
    r = jnp.concatenate([r0, r[..., 1:]], axis=-1)

    # piecewise-linear sample: for each receiver position, one-hot over the
    # nilyr+1 donor segments
    x = r[..., :, None]                       # (..., nr, 1)
    xl = dpos[..., None, :-1]                 # (..., 1, nd-1)
    xr = dpos[..., None, 1:]
    yl = dval[..., None, :-1]
    yr = dval[..., None, 1:]
    denom = jnp.maximum(xr - xl, 1e-20)
    frac = jnp.clip((x - xl) / denom, 0.0, 1.0)
    seg_val = yl + frac * (yr - yl)
    inseg = (x >= xl) & (x <= xr)
    # first matching segment wins; clamp outside the profile
    first = inseg & (jnp.cumsum(inseg, axis=-1) == 1)
    out = jnp.sum(jnp.where(first, seg_val, 0.0), axis=-1)
    below = x[..., 0] > dpos[..., -1:]
    above = x[..., 0] < dpos[..., :1]
    out = jnp.where(jnp.any(first, -1), out,
                    jnp.where(below, dval[..., -1:],
                              jnp.where(above, dval[..., :1], out)))
    return out


class MicroS(NamedTuple):
    kperm: jnp.ndarray       # harmonic-average permeability (m^2)
    zphi_min: jnp.ndarray    # surface porosity
    bTin: jnp.ndarray        # (..., nblyr+2) temperature on bgrid
    bphin: jnp.ndarray       # (..., nblyr+2) porosity on bgrid
    bSin: jnp.ndarray        # (..., nblyr+2) bulk salinity on bgrid
    iphin: jnp.ndarray       # (..., nblyr+1) porosity on igrid
    ibrine_sal: jnp.ndarray  # (..., nblyr+1)
    ibrine_rho: jnp.ndarray  # (..., nblyr+1)


def compute_microS_mushy(zSin, zqin, hice_old, hbr_old, sss, sst,
                         nblyr: int) -> MicroS:
    """Ice microstructure on the bio grid from mushy constitutive relations
    (ice_brine.F90:218-545 compute_microS_mushy + prepare_hbrine).

    zSin/zqin: (..., nilyr) salinity/enthalpy layer profiles."""
    nilyr = zSin.shape[-1]
    bgrid, igrid, cgrid = bio_grids(nilyr, nblyr)
    hbr_old = jnp.minimum(hbr_old, MAXHBR * hice_old)

    bS = remap_to_bio_grid(zSin, hice_old, hbr_old, cgrid, bgrid[:nblyr + 1])
    bq = remap_to_bio_grid(zqin, hice_old, hbr_old, cgrid, bgrid[:nblyr + 1])
    bq = jnp.minimum(0.0, bq)
    bS = jnp.maximum(mushy_min_salin(), bS)
    bT = mushy.temperature_mush(bq, bS)

    # append the ocean point (index nblyr+1)
    bSin = jnp.concatenate([bS, sss[..., None]], axis=-1)
    bTin = jnp.concatenate([bT, sst[..., None]], axis=-1)

    # equilibrium brine salinity/density and porosity
    # (ice_brine.F90:450-467)
    brine_sal = A1 * bTin + A2 * bTin ** 2 + A3 * bTin ** 3
    brine_rho = B1 + B2 * brine_sal
    bphin = jnp.clip(bSin * RHOSI
                     / jnp.maximum(brine_sal * brine_rho, ct.puny),
                     ct.puny, 1.0)
    brine_sal = brine_sal.at[..., -1].set(sss)
    brine_rho = brine_rho.at[..., -1].set(ct.rhow)
    bphin = bphin.at[..., -1].set(1.0)
    kin = K_O * bphin ** EXP_H               # (..., nblyr+2)

    # interface values by distance-weighted averaging (ice_brine.F90:492-520)
    ig = jnp.asarray(igrid, bS.dtype)
    igrp = ig[2:] - ig[1:-1]                 # (nblyr-1,)
    igrm = ig[1:-1] - ig[:-2]
    rigr = 1.0 / (ig[2:] - ig[:-2])
    mid = lambda f: (f[..., 2:nblyr + 1] * igrp
                     + f[..., 1:nblyr] * igrm) * rigr
    ibrine_sal = jnp.concatenate(
        [brine_sal[..., 1:2], mid(brine_sal), brine_sal[..., -1:]], axis=-1)
    ibrine_rho = jnp.concatenate(
        [brine_rho[..., 1:2], mid(brine_rho), brine_rho[..., -1:]], axis=-1)
    iphin = jnp.concatenate(
        [bphin[..., 1:2], jnp.clip(mid(bphin), ct.puny, 1.0),
         bphin[..., nblyr:nblyr + 1]], axis=-1)

    zphi_min = bphin[..., 1]
    # harmonic mean of kin over layers 2..nblyr+1 (1-based), zero if any
    # layer is impermeable (ice_brine.F90:487-531)
    kin_int = kin[..., 1:nblyr + 1]          # (..., nblyr)
    k_min = jnp.min(kin_int, axis=-1)
    ksum = jnp.sum(1.0 / jnp.maximum(kin_int, 1e-30), axis=-1)
    kperm = jnp.where(k_min > 0.0, nblyr / ksum, 0.0)
    return MicroS(kperm=kperm, zphi_min=zphi_min, bTin=bTin, bphin=bphin,
                  bSin=bSin, iphin=iphin, ibrine_sal=ibrine_sal,
                  ibrine_rho=ibrine_rho)


def mushy_min_salin():
    from cice5_tpu.models.thermo import shared as thshared
    return thshared.min_salin


class HbrineResult(NamedTuple):
    hbr: jnp.ndarray
    fbri: jnp.ndarray
    darcy_V: jnp.ndarray
    dhS_top: jnp.ndarray


def update_hbrine(dt, meltb, meltt, melts, hin, hsn, hin_old, hbr_old,
                  dhS_top, dhS_bottom, kperm, zphi_min) -> HbrineResult:
    """Brine surface evolution with Darcy relaxation toward sea level
    (ice_brine.F90:546-633 update_hbrine), dense over all cells."""
    h_ocn = RHOSI / ct.rhow * hin + ct.rhos / ct.rhow * hsn
    thick = (hbr_old > THINS) & (hin_old > THINS)

    # thick branch
    dtop = -jnp.maximum(0.0, jnp.minimum(hin_old - hbr_old, meltt)) \
        * ct.rhoi / ct.rhow
    dtop = dtop - jnp.maximum(0.0, melts) * ct.rhos / ct.rhow
    dhbr = dhS_bottom - dtop
    hbr_t = jnp.maximum(HBR_MIN, hbr_old + dhbr)
    hbrocn = hbr_t - h_ocn
    darcy_coeff = jnp.maximum(0.0, kperm * ct.gravit
                              / (VISCOS * jnp.maximum(hbr_old, ct.puny)))
    phi_eff = jnp.where((hbrocn < 0.0) & (hbr_t >= hin), PHI_SNOW, zphi_min)
    decay = jnp.exp(-darcy_coeff / jnp.maximum(phi_eff, ct.puny) * dt)
    hbrocn_new = hbrocn * decay
    hbr_flushed = jnp.where(
        hbrocn > 0.0,
        jnp.where(hbr_t > THINS,
                  jnp.maximum(THINS, h_ocn + hbrocn_new), hbr_t),
        jnp.where(hbrocn < 0.0,
                  jnp.maximum(HBR_MIN, h_ocn + hbrocn_new), hbr_t))
    hbrocn_fin = hbr_flushed - h_ocn
    darcy_V = -jnp.sign(hbrocn) * (hbrocn - hbrocn_fin) / dt * phi_eff
    dtop_out = dtop + jnp.sign(hbrocn) * (hbrocn - hbrocn_fin)

    # thin branch (ice_brine.F90:621-628)
    hbr_min_thin = jnp.minimum(THINS, hin)
    hbr_thin = jnp.maximum(hbr_min_thin, hbr_old + dhS_bottom - dhS_top)
    dhbr_hin = hbr_thin - h_ocn
    hbr_thin = jnp.where(jnp.abs(dhbr_hin) > DH_MIN,
                         jnp.maximum(hbr_min_thin,
                                     h_ocn + jnp.sign(dhbr_hin) * DH_MIN),
                         hbr_thin)

    hbr = jnp.where(thick, hbr_flushed, hbr_thin)
    darcy = jnp.where(thick, darcy_V, 0.0)
    dtop_fin = jnp.where(thick, dtop_out, dhS_top)
    fbri = hbr / jnp.maximum(hin, ct.puny)
    return HbrineResult(hbr=hbr, fbri=fbri, darcy_V=darcy, dhS_top=dtop_fin)
