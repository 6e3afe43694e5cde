"""Melt pond tracers: CESM, level-ice, and topographic schemes.

Re-expressions of /root/reference/source/ice_meltpond_cesm.F90
(compute_ponds_cesm :61), ice_meltpond_lvl.F90 (compute_ponds_lvl :79,
brine_permeability :351), and ice_meltpond_topo.F90 (compute_ponds_topo :69,
simplified hypsometry). Dense elementwise per-category updates over batch *B.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo.shared import calculate_Tin_from_qin

HI_MIN = 0.1      # min ice thickness carrying ponds (hi_min for kitd=0 scale)
TD = 2.0          # freeze-up temperature difference (C)
REXP = 0.01       # pond contraction scaling


def compute_ponds_cesm(dt, *, aicen, vicen, vsnon, Tsfcn, apnd, hpnd,
                       meltt, melts, frain, rfrac, pndaspect=0.8):
    """CESM pond scheme (ice_meltpond_cesm.F90:61-261).

    apnd is the pond fraction of ice area; hpnd pond depth (m).
    meltt/melts: per-category melt this step (m). Returns (apnd, hpnd)."""
    has = aicen > ct.puny
    ai = jnp.maximum(aicen, ct.puny)
    hi = jnp.where(has, vicen / ai, 0.0)

    volpn = hpnd * apnd * aicen
    volpn = volpn + rfrac / ct.rhofresh * (
        meltt * ct.rhoi + melts * ct.rhos + frain * dt) * aicen
    Tp = ct.Timelt - TD
    dTs = jnp.maximum(Tp - Tsfcn, 0.0)
    volpn = jnp.maximum(volpn * jnp.exp(REXP * dTs / Tp), 0.0)

    apondn = jnp.minimum(jnp.sqrt(volpn / (pndaspect * ai)), 1.0)
    hpondn = pndaspect * apondn
    hpondn = jnp.minimum(hpondn, 0.9 * hi)
    apondn = apondn * aicen

    thin = hi < HI_MIN
    apondn = jnp.where(thin | ~has, 0.0, apondn)
    hpondn = jnp.where(thin | ~has, 0.0, hpondn)
    return jnp.where(has, apondn / ai, 0.0), hpondn


def brine_permeability(qicen, sicen, Tmlt):
    """Minimum-liquid-fraction permeability (ice_meltpond_lvl.F90:351-404):
    Sbr from Notz (2005) eq 3.6, phi = S/Sbr, perm = 3e-8 min(phi)^3.

    qicen/sicen/Tmlt: (nilyr, *B). Returns perm (*B)."""
    Tin = calculate_Tin_from_qin(qicen, Tmlt)
    Sbr = 1.0 / (1.0e-3 - ct.depressT / jnp.minimum(Tin, -ct.puny))
    phi = sicen / jnp.maximum(Sbr, ct.puny)
    phi = jnp.where(phi < 0.05, 0.0, phi)
    return 3.0e-8 * jnp.min(phi, axis=0) ** 3


class PondsLvlResult(NamedTuple):
    apnd: jnp.ndarray
    hpnd: jnp.ndarray
    ipnd: jnp.ndarray


def compute_ponds_lvl(dt, *, aicen, vicen, vsnon, Tsfcn, alvl, apnd, hpnd,
                      ipnd, meltt, melts, frain, rfrac, Tair, fsurfn, dhs,
                      qicen, sicen, pndaspect=0.8, frzpnd="cesm",
                      dpscale=0.001, ktherm=1) -> PondsLvlResult:
    """Level-ice pond scheme (ice_meltpond_lvl.F90:79-349).

    apnd is the pond fraction of LEVEL ice area (aicen*alvl); ipnd the
    refrozen-lid thickness (frzpnd='hlid')."""
    lvl_area = aicen * alvl
    has = lvl_area > ct.puny ** 2
    ai = jnp.maximum(aicen, ct.puny)
    hi = jnp.where(aicen > ct.puny, vicen / ai, 0.0)
    hs = jnp.where(aicen > ct.puny, vsnon / ai, 0.0)

    volpn = hpnd * lvl_area * apnd
    apondn = apnd * alvl                       # fraction of ice area

    dvn = rfrac / ct.rhofresh * (meltt * ct.rhoi + melts * ct.rhos
                                 + frain * dt) * aicen
    if frzpnd == "cesm":
        Tp = ct.Timelt - TD
        dTs = jnp.maximum(Tp - Tsfcn, 0.0)
        dvn = dvn - volpn * (1.0 - jnp.exp(REXP * dTs / Tp))
        hlid = jnp.zeros_like(hi)
    else:   # 'hlid' Stefan refreezing lid
        hlid = ipnd
        Ts = Tair - ct.Tffresh
        freezing = (dvn == 0.0) & (Ts < 0.0)
        bdt = -2.0 * Ts * ct.kice * dt / (ct.rhoi * ct.Lfresh)
        dhlid_new = 0.5 * jnp.sqrt(jnp.maximum(bdt, 0.0))
        dhlid_ice = 0.5 * bdt / jnp.maximum(hlid, ct.puny)
        dhlid_f = jnp.where(hlid > dhlid_new, dhlid_ice, dhlid_new)
        dhlid_f = jnp.minimum(dhlid_f, hpnd * ct.rhofresh / ct.rhoi)
        # melting of the lid
        dhlid_m = -jnp.minimum(
            jnp.maximum(fsurfn * dt / (ct.rhoi * ct.Lfresh), 0.0), hlid)
        dhlid = jnp.where(freezing, dhlid_f,
                          jnp.where(dvn == 0.0, 0.0, dhlid_m))
        hlid = jnp.maximum(hlid + dhlid, 0.0)
        alid = apondn * aicen
        dvn = dvn - dhlid * alid * ct.rhoi / ct.rhofresh

    volpn = volpn + dvn
    apondn = jnp.where(volpn <= 0.0, 0.0, apondn)
    volpn = jnp.maximum(volpn, 0.0)

    existing = apondn * aicen > ct.puny
    ap_ex = jnp.clip(apondn + 0.5 * dvn
                     / jnp.maximum(pndaspect * apondn * aicen, ct.puny),
                     0.0, alvl)
    hp_ex = jnp.where(ap_ex > ct.puny,
                      volpn / jnp.maximum(ap_ex * aicen, ct.puny), 0.0)
    newp = lvl_area > 10.0 * ct.puny
    ap_new = jnp.minimum(jnp.sqrt(volpn / (pndaspect * ai)), alvl)
    hp_new = pndaspect * ap_new
    apondn = jnp.where(existing, ap_ex, jnp.where(newp, ap_new, 0.0))
    hpondn = jnp.where(existing, hp_ex, jnp.where(newp, hp_new, 0.0))
    apondn = jnp.maximum(apondn, 0.0)

    # nonnegative freeboard limit
    hpondn = jnp.minimum(hpondn, ((ct.rhow - ct.rhoi) * hi - ct.rhos * hs)
                         / ct.rhofresh)
    hpondn = jnp.maximum(hpondn, 0.0)
    apondn = apondn * aicen                      # grid-cell fraction
    volpn = hpondn * apondn
    dead = volpn <= 0.0
    apondn = jnp.where(dead, 0.0, apondn)
    hpondn = jnp.where(dead, 0.0, hpondn)
    hlid = jnp.where(dead, 0.0, hlid)

    # permeability drainage (BL99 only; mushy drains via flushing)
    if ktherm != 2 and dpscale > ct.puny:
        draft = (ct.rhos * hs + ct.rhoi * hi) / ct.rhow + hpondn
        deltah = hpondn + hi - draft
        head = ct.gravit * ct.rhow * jnp.maximum(deltah, 0.0)
        Tmlt = -sicen * ct.depressT
        perm = brine_permeability(qicen, sicen, Tmlt)
        drain = perm * head * dt / (ct.viscosity_dyn
                                    * jnp.maximum(hi, ct.puny)) * dpscale
        deltah2 = jnp.minimum(drain, hpondn)
        do_drain = (hpondn > 0.0)
        dvn2 = jnp.where(do_drain, -deltah2 * apondn, 0.0)
        volpn = volpn + dvn2
        apondn2 = jnp.clip(apondn + 0.5 * dvn2
                           / jnp.maximum(pndaspect * apondn, ct.puny),
                           0.0, lvl_area)
        apondn = jnp.where(do_drain, apondn2, apondn)
        hpondn = jnp.where(apondn > ct.puny,
                           volpn / jnp.maximum(apondn, ct.puny), 0.0)

    thin = (hi < HI_MIN) | ~has
    apondn = jnp.where(thin, 0.0, apondn)
    hpondn = jnp.where(thin, 0.0, hpondn)
    hlid = jnp.where(thin, 0.0, hlid)

    apnd_out = jnp.where(has, apondn / jnp.maximum(lvl_area, ct.puny), 0.0)
    return PondsLvlResult(apnd=apnd_out, hpnd=hpondn, ipnd=hlid)


def compute_ponds_topo_simple(dt, *, aicen, vicen, vsnon, Tsfcn, apnd, hpnd,
                              ipnd, meltt, melts, frain, rfrac):
    """Simplified topographic ponds (ice_meltpond_topo.F90:69): melt water
    accumulates as pond volume, redistributed with a fixed aspect like CESM
    but retained under the hypsometric depth cap (full hypsometry TBD)."""
    apnd2, hpnd2 = compute_ponds_cesm(
        dt, aicen=aicen, vicen=vicen, vsnon=vsnon, Tsfcn=Tsfcn, apnd=apnd,
        hpnd=hpnd, meltt=meltt, melts=melts, frain=frain, rfrac=rfrac)
    return apnd2, hpnd2, jnp.zeros_like(ipnd)
