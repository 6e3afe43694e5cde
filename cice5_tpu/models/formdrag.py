"""Form drag from ridges, keels, floe edges and melt ponds
(reference source/ice_atmo.F90:644-1023 neutral_drag_coeffs;
Tsamados et al. 2014).

Partitions the neutral atmospheric and oceanic drag coefficients into skin
drag plus form-drag contributions from sails/keels (from the level-ice
tracers), floe edges (Lupkes floe-size parameterization) and pond edges.
Dense masked arithmetic over the grid; per-cell 'if' branches become
jnp.where with guarded denominators.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct

# tunable parameters (ice_atmo.F90:709-744)
CSW = 0.002        # ice-ocean skin drag coefficient
CSA = 0.0005       # ice-air skin drag coefficient
MRDG = 20.0        # atmospheric screening effect (Lu 2011)
MRDGO = 10.0       # oceanic screening effect
BETA = 0.5         # floe-length exponent
LMIN = 8.0         # min floe length (m)
LMAX = 300.0       # max floe length (m)
CFA = 0.2          # floe-edge atmo form-drag ratio
CFW = 0.2          # floe-edge ocean form-drag ratio
CPA = 0.2          # pond-edge form-drag ratio
CRA = 0.2          # ridge local form drag
CRW = 0.2          # keel local form drag
SL = 22.0          # sheltering parameter (Lupkes 2012)
LPMIN = 2.26       # min pond length (m)
LPMAX = 24.63      # max pond length (m)
TANAR = 0.4        # sail slope
TANAK = 0.4        # keel slope
PHIR = 0.8         # ridge porosity
PHIK = 0.8         # keel porosity
HKOVERHR = 4.0     # keel depth / ridge height
DKOVERDR = 1.0     # keel spacing / ridge spacing
SHGB = 0.18        # sheltering (Hanssen/Steele)
ALPHA2 = 0.0       # ridged-area weight
BETA2 = 0.75
OCNRUF = 0.000327  # ocean surface roughness (m)
CAMAX = 0.02       # max atmospheric drag
CWMAX = 0.06       # max oceanic drag


class FormDrag(NamedTuple):
    Cdn_atm: jnp.ndarray
    Cdn_ocn: jnp.ndarray
    Cdn_atm_skin: jnp.ndarray
    Cdn_atm_floe: jnp.ndarray
    Cdn_atm_pond: jnp.ndarray
    Cdn_atm_rdg: jnp.ndarray
    Cdn_ocn_skin: jnp.ndarray
    Cdn_ocn_floe: jnp.ndarray
    Cdn_ocn_keel: jnp.ndarray
    hfreebd: jnp.ndarray
    hdraft: jnp.ndarray
    hridge: jnp.ndarray
    distrdg: jnp.ndarray
    hkeel: jnp.ndarray
    dkeel: jnp.ndarray
    lfloe: jnp.ndarray
    dfloe: jnp.ndarray


def neutral_drag_coeffs(*, aice, vice, vsno, aicen, vicen,
                        apnd=None, hpnd=None, ipnd=None, alvl=None,
                        vlvl=None) -> FormDrag:
    """Neutral drag partition (ice_atmo.F90:644-1023).

    aicen/vicen (ncat, ...); pond/level tracers optional (None -> no pond /
    no ridged-ice contributions beyond defaults)."""
    dtype = aice.dtype
    act = aice > 0.001
    ai = jnp.maximum(aice, 0.001)
    aii = 1.0 / ai
    z = jnp.zeros_like(aice)

    astar = 1.0 / (1.0 - (LMIN / LMAX) ** (1.0 / BETA))
    icerufi = 1.0 / ct.iceruf
    ocnrufi = 1.0 / OCNRUF
    cd_neutral = (ct.vonkar / np.log(ct.zref / ct.iceruf)) ** 2

    # pond aggregates (per unit grid-cell area)
    if apnd is not None:
        apond = jnp.sum(apnd * aicen, axis=0)
    else:
        apond = z

    # draft and freeboard (Eq. 27-28)
    hdraft = (ct.rhoi * vice + ct.rhos * vsno) * aii / ct.rhow
    hfreebd = (vice + vsno) * aii - hdraft
    hi = vice * aii
    over = hdraft >= hi
    hfree_alt = (hdraft * ai * (1.0 - ct.rhoi / ct.rhow)
                 + (vsno - (vice - hdraft * ai) * ct.rhoi / ct.rhos)
                 * (1.0 - ct.rhos / ct.rhow)) * aii
    hfreebd = jnp.where(over, hfree_alt, hfreebd)

    # floe length / spacing (Eq. 13-14)
    lfloe = LMIN * (astar / jnp.maximum(astar - ai, ct.puny)) ** BETA
    dfloe = lfloe * (1.0 / jnp.sqrt(ai) - 1.0)

    # ridged-ice geometry (Eq. 25-26)
    if alvl is not None:
        ardg = jnp.sum((1.0 - alvl) * aicen, axis=0)
        vrdg = jnp.sum((1.0 - vlvl) * vicen, axis=0)
    else:
        ardg = z
        vrdg = z
    has_rdg = act & (ardg > 0.001)
    ardg_s = jnp.maximum(ardg, 0.001)
    hridge = (vrdg / ardg_s * 2.0
              * (ALPHA2 + BETA2 * HKOVERHR / DKOVERDR * TANAR / TANAK)
              / (PHIR + PHIK * TANAR / TANAK * HKOVERHR ** 2 / DKOVERDR))
    distrdg = (2.0 * hridge * ai / ardg_s
               * (ALPHA2 / TANAR + BETA2 / TANAK * HKOVERHR / DKOVERDR))
    hkeel = HKOVERHR * hridge
    dkeel = DKOVERDR * distrdg

    # --- atmo: skin + ridge drag ---
    sail = jnp.maximum(0.0, hridge - hfreebd)
    distrdg_s = jnp.maximum(distrdg, ct.puny)
    cda_skin = jnp.clip(CSA * (1.0 - MRDG * sail / distrdg_s), 0.0, CAMAX)
    cda_skin = jnp.where(has_rdg, cda_skin, CSA)

    sail_ok = has_rdg & (sail > ct.puny)
    sail_s = jnp.maximum(sail, ct.puny)
    sca = 1.0 - jnp.exp(-SHGB * distrdg_s / sail_s)
    cda_rdg = (ai * (CRA * 0.5) * sail / distrdg_s * sca
               * (jnp.log(sail_s * icerufi)
                  / np.log(ct.zref * icerufi)) ** 2)
    cda_rdg = jnp.where(sail_ok, jnp.minimum(cda_rdg, CAMAX), 0.0)

    # --- ocean: skin + keel drag ---
    keel = jnp.maximum(0.0, hkeel - hdraft)
    dkeel_s = jnp.maximum(dkeel, ct.puny)
    cdw_skin = jnp.clip(CSW * (1.0 - MRDGO * keel / dkeel_s), 0.0, CWMAX)
    cdw_skin = jnp.where(has_rdg, cdw_skin, CSW)

    keel_ok = has_rdg & (keel > ct.puny)
    keel_s = jnp.maximum(keel, ct.puny)
    scw = 1.0 - jnp.exp(-SHGB * dkeel_s / keel_s)
    cdw_keel = ((CRW * 0.5) * ai * keel / dkeel_s * scw
                * (jnp.log(keel_s * icerufi)
                   / np.log(ct.zref * icerufi)) ** 2)
    cdw_keel = jnp.where(keel_ok, jnp.clip(cdw_keel, 0.0, CWMAX), 0.0)

    # --- floe edge drag ---
    fb_ok = act & (hfreebd > ct.puny)
    fb_s = jnp.maximum(hfreebd, ct.puny)
    sca_f = 1.0 - jnp.exp(-SL * BETA * (1.0 - ai))
    cda_floe = (CFA * 0.5
                * (jnp.log(fb_s * ocnrufi) / np.log(ct.zref * ocnrufi)) ** 2
                * sca_f * hfreebd / lfloe)
    cda_floe = jnp.where(fb_ok, jnp.clip(cda_floe, 0.0, CAMAX), 0.0)

    dr_ok = act & (hdraft > ct.puny)
    dr_s = jnp.maximum(hdraft, ct.puny)
    cdw_floe = (CFW * 0.5
                * (jnp.log(dr_s * ocnrufi) / np.log(ct.zref * ocnrufi)) ** 2
                * sca_f * hdraft / lfloe)
    cdw_floe = jnp.where(dr_ok, jnp.clip(cdw_floe, 0.0, CWMAX), 0.0)

    # --- pond edge drag ---
    sca_p = jnp.maximum(apond, 0.0) ** (1.0 / (ct.zref * BETA))
    lp = LPMIN * (1.0 - apond) + LPMAX * apond
    cda_pond = (CPA * 0.5 * sca_p * apond * hfreebd / lp
                * (jnp.log(fb_s * ocnrufi) / np.log(ct.zref * ocnrufi)) ** 2)
    cda_pond = jnp.where(fb_ok, jnp.minimum(cda_pond, CAMAX), 0.0)

    # --- totals, with ice-free defaults ---
    cda = jnp.minimum(cda_skin + cda_floe + cda_pond + cda_rdg, CAMAX)
    cdw = jnp.minimum(cdw_skin + cdw_floe + cdw_keel, CWMAX)

    w = lambda x, default: jnp.where(act, x, default)
    return FormDrag(
        Cdn_atm=w(cda, cd_neutral).astype(dtype),
        Cdn_ocn=w(cdw, ct.dragio).astype(dtype),
        Cdn_atm_skin=w(cda_skin, 0.0), Cdn_atm_floe=w(cda_floe, 0.0),
        Cdn_atm_pond=w(cda_pond, 0.0), Cdn_atm_rdg=w(cda_rdg, 0.0),
        Cdn_ocn_skin=w(cdw_skin, 0.0), Cdn_ocn_floe=w(cdw_floe, 0.0),
        Cdn_ocn_keel=w(cdw_keel, 0.0),
        hfreebd=w(hfreebd, 0.0), hdraft=w(hdraft, 0.0),
        hridge=w(jnp.where(has_rdg, hridge, 0.0), 0.0),
        distrdg=w(jnp.where(has_rdg, distrdg, 0.0), 0.0),
        hkeel=w(jnp.where(has_rdg, hkeel, 0.0), 0.0),
        dkeel=w(jnp.where(has_rdg, dkeel, 0.0), 0.0),
        lfloe=w(lfloe, 0.0), dfloe=w(dfloe, 0.0))
