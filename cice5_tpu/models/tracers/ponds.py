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


# ---------------------------------------------------------------------------
# Topographic melt ponds (Flocco & Feltham 2007 / Flocco et al. 2010)
# Re-expression of ice_meltpond_topo.F90: compute_ponds_topo (:69),
# pond_area (:379), calc_hpond (:651), permeability_phi (:812).
#
# TPU re-structuring: the reference gathers pond cells into index lists and
# runs data-dependent loops (category search, bubble sort of snow levels,
# break-out volume scan). Here ncat is a small static axis, so every
# data-dependent construct becomes a dense masked equivalent: the category
# search is a one-hot argmax, the ncat+2-element sort is a fixed
# compare-swap network, and the sub-layer scan is a cumulative-sum select.
# ---------------------------------------------------------------------------

TD_TOPO = 0.15        # freeze-up temperature difference for topo ponds (p15)
HICEMIN_TOPO = 0.1    # minimum ice thickness carrying topo ponds (m)
MIN_VOLP = 1.0e-4     # minimum pond volume (m)


def permeability_phi(qicen, sicen, Tsfcn, Tf, heat_capacity=True):
    """Liquid fraction + permeability of the ice column
    (ice_meltpond_topo.F90:812-919 permeability_phi).

    qicen/sicen: (nilyr, *B). Returns perm (*B): 3e-8 * min_k(phi)^3 with
    phi from Assur-1958 brine salinity for cold ice (max Tin <= -2 C) and
    Notz-2005 (eq 3.2) otherwise."""
    if heat_capacity:
        Tmlt = -sicen * ct.depressT
        Tin = calculate_Tin_from_qin(qicen, Tmlt)
    else:
        T1 = 0.5 * (Tsfcn + Tf)
        Tin = jnp.broadcast_to(T1, qicen.shape)
    cold = jnp.max(Tin, axis=0) <= -2.0
    Sbr_assur = (-1.2 - 21.8 * Tin - 0.919 * Tin ** 2
                 - 0.01878 * Tin ** 3)
    Sbr_notz = -17.6 * Tin - 0.389 * Tin ** 2 - 0.00362 * Tin ** 3
    Sbr = jnp.where(cold[None], Sbr_assur, Sbr_notz)
    sref = sicen if heat_capacity else ct.ice_ref_salinity
    phi = sref / jnp.maximum(Sbr, ct.puny)
    return 3.0e-8 * jnp.min(phi, axis=0) ** 3


def _calc_hpond(ncat, reduced_aicen, asnon, hsnon, alfan, volp, cum_max_vol):
    """Pond depth from hypsometry (ice_meltpond_topo.F90:651-806 calc_hpond).

    All inputs stacked (ncat, *B) except volp (*B). Returns (hpond (*B),
    m_index (*B int, 0-based highest pond-covered category; -1 if none)).
    """
    B = volp.shape
    dtype = volp.dtype
    BIG = jnp.asarray(1.0e30, dtype)

    # category the water fills up to: first n with volp <= cum_max_vol[n],
    # clamped to ncat-2 (reference m_index = min(ncat-1, m_index), 1-based)
    filled = volp[None] <= cum_max_vol          # (ncat, *B)
    m_index = jnp.argmax(filled, axis=0)        # first True (0 if none)
    m_index = jnp.minimum(m_index, ncat - 2)

    cum_below = jnp.concatenate(
        [jnp.zeros((1,) + B, dtype), cum_max_vol[:-1]], axis=0)
    rem_vol0 = volp - jnp.take_along_axis(
        cum_below, m_index[None], axis=0)[0]

    # per-candidate m (0-based): build hitl/aicetl of fixed length ncat+2
    # with +BIG sentinels beyond the m+2 live entries so the sort network
    # pushes them to the end (reference only sorts indices 0..m+1)
    hponds = []
    L = ncat + 2
    for m in range(ncat - 1):
        hitl = [jnp.zeros(B, dtype)]            # slot 0 (the bare level)
        aicetl = [jnp.zeros(B, dtype)]
        a0_extra = jnp.zeros(B, dtype)
        for n in range(m + 1):                  # categories 1..m_index
            hitl.append(jnp.maximum(jnp.minimum(
                hsnon[n] + alfan[n] - alfan[m],
                alfan[m + 1] - alfan[m]), 0.0))
            aicetl.append(asnon[n])
            a0_extra = a0_extra + (reduced_aicen[n] - asnon[n])
        hitl.append(alfan[m + 1] - alfan[m])    # slot m+2: lid of the layer
        aicetl.append(jnp.zeros(B, dtype))
        aicetl[0] = a0_extra
        while len(hitl) < L:                    # sentinels
            hitl.append(jnp.broadcast_to(BIG, B))
            aicetl.append(jnp.zeros(B, dtype))
        hitl = jnp.stack(hitl)                  # (L, *B)
        aicetl = jnp.stack(aicetl)

        # bubble-sort compare-swap network ascending in hitl (paired aicetl)
        for _ in range(L - 1):
            for i in range(L - 1):
                swap = hitl[i] > hitl[i + 1]
                hi_, hj = hitl[i], hitl[i + 1]
                ai_, aj = aicetl[i], aicetl[i + 1]
                hitl = hitl.at[i].set(jnp.where(swap, hj, hi_))
                hitl = hitl.at[i + 1].set(jnp.where(swap, hi_, hj))
                aicetl = aicetl.at[i].set(jnp.where(swap, aj, ai_))
                aicetl = aicetl.at[i + 1].set(jnp.where(swap, ai_, aj))

        # move up through sub-layers accumulating volume until rem_vol fits
        atot = jnp.sum(aicetl, axis=0)
        # suffix sums of snow-occupied area: sum(aicetl[n:]) for n=1..m+1
        nlive = m + 2                            # live slots 0..m+1
        hvals = []
        cum = jnp.zeros(B, dtype)
        found = jnp.zeros(B, bool)
        hp_m = jnp.zeros(B, dtype)
        for n in range(1, nlive):
            suffix = jnp.sum(aicetl[n:], axis=0)
            area = atot - (ct.rhos / ct.rhow) * suffix
            area = jnp.maximum(area, ct.puny)
            vol = (hitl[n] - hitl[n - 1]) * area
            reach = cum + vol >= rem_vol0
            hit = reach & ~found
            hval = ((rem_vol0 - cum) / area + hitl[n - 1]
                    + alfan[m] - alfan[0])
            # fall-through (shouldn't happen): top of the last sub-layer
            hp_m = jnp.where(hit, hval,
                             jnp.where(found, hp_m,
                                       hitl[n] + alfan[m] - alfan[0]))
            found = found | reach
            cum = cum + vol
        hponds.append(hp_m)

    hpond_by_m = jnp.stack(hponds)              # (ncat-1, *B)
    hpond = jnp.take_along_axis(hpond_by_m, m_index[None], axis=0)[0]
    empty = volp < ct.puny
    hpond = jnp.where(empty, 0.0, hpond)
    m_index = jnp.where(empty, -1, m_index)
    return hpond, m_index


def _pond_area(dt, ncat, *, aice, vice, vsno, aicen, vicen, vsnon,
               qicen, sicen, volp, Tsfcn, Tf, ktherm, heat_capacity=True):
    """Pond area/depth + drainage for pond cells
    (ice_meltpond_topo.F90:379-647 pond_area). Dense over batch *B.

    qicen/sicen: (nilyr, ncat, *B). Returns (volpn, apondn, hpondn (ncat,*B),
    volp, dvolp (*B))."""
    B = aice.shape
    dtype = aice.dtype
    has_n = aicen > ct.puny
    ai_n = jnp.maximum(aicen, ct.puny)
    hicen = jnp.where(has_n, vicen / ai_n, 0.0)
    hsnon = jnp.where(has_n, vsnon / ai_n, 0.0)
    red = jnp.where(has_n, aicen * jnp.maximum(
        0.2, -0.024 * hicen + 0.832), 0.0)
    reduced_aicen = red.at[ncat - 1].set(
        jnp.where(has_n[ncat - 1], 1.0, 0.0))   # n=ncat (:481)
    asnon = reduced_aicen
    alfan = 0.6 * hicen
    betan = 0.4 * hicen

    # cumulative maximum water volume up to each category (:499-534)
    cums = []
    prev = jnp.zeros(B, dtype)
    for n in range(ncat - 1):
        cond = (alfan[n + 1] >= alfan[n]) & (alfan[n + 1] > 0.0)
        val = prev + (alfan[n + 1] - alfan[n]) \
            * jnp.sum(reduced_aicen[:n + 1], axis=0)
        for ns in range(n + 1):
            val = val - (ct.rhos / ct.rhow) * asnon[ns] * jnp.maximum(
                jnp.minimum(hsnon[ns] + alfan[ns] - alfan[n],
                            alfan[n + 1] - alfan[n]), 0.0)
        prev = jnp.where(cond, val, prev)
        cums.append(prev)
    cums.append(prev)                            # last category holds none
    cum_max_vol = jnp.stack(cums)                # (ncat, *B)

    # overflow drainage (:539-549)
    dvolp = jnp.zeros(B, dtype)
    over = volp >= cum_max_vol[ncat - 1]
    drain = jnp.where(over, volp - cum_max_vol[ncat - 1] + ct.puny, 0.0)
    volp = volp - drain
    dvolp = dvolp + drain
    dump = volp < ct.puny
    dvolp = jnp.where(dump, dvolp + volp, dvolp)
    volp = jnp.where(dump, 0.0, volp)

    hpond, m_index = _calc_hpond(ncat, reduced_aicen, asnon, hsnon, alfan,
                                 volp, cum_max_vol)
    narng = jnp.arange(ncat)[(...,) + (None,) * len(B)]
    in_pond = narng <= m_index[None]             # categories with water
    apondn = jnp.where(in_pond, reduced_aicen, 0.0)
    hpondn = jnp.where(in_pond, jnp.maximum(
        hpond[None] - alfan + alfan[0][None], 0.0), 0.0)

    # Darcy drainage through permeable ice (:560-600); BL99/zero-layer only
    # (mushy drains via its own flushing, ktherm==2 skips this (:571))
    if ktherm != 2:
        floe_weight = jnp.where(aice > ct.puny,
                                (vsno * ct.rhos + ct.rhoi * vice
                                 + ct.rhow * volp) / jnp.maximum(aice,
                                                                 ct.puny),
                                0.0)
        hsl_rel = floe_weight / ct.rhow \
            - (jnp.sum(betan * aicen, axis=0) / jnp.maximum(aice, ct.puny)
               + alfan[0])
        pressure_head = ct.gravit * ct.rhow * jnp.maximum(hpond - hsl_rel,
                                                          0.0)
        do_drain = pressure_head > 0.0
        permflag = jnp.zeros(B, bool)
        for n in range(ncat - 1):
            perm = permeability_phi(qicen[:, n], sicen[:, n], Tsfcn[n], Tf,
                                    heat_capacity=heat_capacity)
            live = do_drain & (hicen[n] > 0.0)
            permflag = permflag | (live & (perm > 0.0))
            dr = jnp.where(live,
                           perm * apondn[n] * pressure_head * dt
                           / (ct.viscosity_dyn
                              * jnp.maximum(hicen[n], ct.puny)), 0.0)
            dvolp = dvolp + jnp.minimum(dr, volp)
            volp = jnp.maximum(volp - dr, 0.0)
            dump = live & (volp < ct.puny)
            dvolp = jnp.where(dump, dvolp + volp, dvolp)
            volp = jnp.where(dump, 0.0, volp)

        # recompute pond dimensions where anything drained (:585-597)
        hpond2, m_index2 = _calc_hpond(ncat, reduced_aicen, asnon, hsnon,
                                       alfan, volp, cum_max_vol)
        redo = permflag
        hpond = jnp.where(redo, hpond2, hpond)
        m_index = jnp.where(redo, m_index2, m_index)
        in_pond = narng <= m_index[None]
        apondn2 = jnp.where(in_pond, reduced_aicen, 0.0)
        hpondn2 = jnp.where(in_pond,
                            hpond[None] - alfan + alfan[0][None], 0.0)
        apondn = jnp.where(redo[None], apondn2, apondn)
        hpondn = jnp.where(redo[None], hpondn2, hpondn)

    # pond volume per category; snow in ponds is not melted (:602-637)
    volpn_low = apondn * hpondn \
        - (ct.rhos / ct.rhow) * asnon * jnp.minimum(hsnon, hpondn)
    low = narng < m_index[None]
    volpn = jnp.where(low, volpn_low, 0.0)
    sum_low = jnp.sum(volpn, axis=0)
    is_last = narng == m_index[None]
    top_vol = volp - sum_low
    ok = volp > sum_low
    volpn = jnp.where(is_last, jnp.where(ok[None], top_vol[None], 0.0),
                      volpn)
    hpondn = jnp.where(is_last & ~ok[None], 0.0, hpondn)
    apondn = jnp.where(is_last & ~ok[None], 0.0, apondn)
    # negative remainder: reduce the category below (:629-633)
    neg = (volp + ct.puny < sum_low)
    is_prev = narng == (m_index - 1)[None]
    volpn = jnp.where(is_prev & (neg & (m_index > 0))[None],
                      volpn + top_vol[None], volpn)

    live = apondn > ct.puny
    hpondn = jnp.where(live, volpn / jnp.maximum(apondn, ct.puny), 0.0)
    dvolp = dvolp + jnp.sum(jnp.where(live, 0.0, volpn), axis=0)
    volpn = jnp.where(live, volpn, 0.0)
    apondn = jnp.where(live, apondn, 0.0)
    return volpn, apondn, hpondn, volp, dvolp


class PondsTopoResult(NamedTuple):
    apnd: jnp.ndarray
    hpnd: jnp.ndarray
    ipnd: jnp.ndarray
    dfpond: jnp.ndarray   # net fresh water flux change to ponds (m)
    vuin: jnp.ndarray     # lid ice volume (diagnostic)


def compute_ponds_topo(dt, *, aice, aicen, vice, vicen, vsno, vsnon,
                       meltt, fsurf, Tsfcn, Tf, qicen, sicen,
                       apnd, hpnd, ipnd, ktherm=1,
                       heat_capacity=True) -> PondsTopoResult:
    """Topographic melt ponds (ice_meltpond_topo.F90:69-377
    compute_ponds_topo): hypsometric redistribution of the cell's total
    meltwater over the lowest-lying categories, refrozen lid growth/melt,
    and Darcy drainage.

    Per-cell aggregates: aice, vice, vsno, meltt (cell surface melt, m),
    fsurf (cell surface heat flux, W/m^2), Tf. Per-category: aicen, vicen,
    vsnon, Tsfcn, apnd/hpnd/ipnd tracers. qicen/sicen: (nilyr, ncat, *B).
    """
    ncat = aicen.shape[0]
    B = aice.shape
    dtype = aice.dtype

    volp = jnp.sum(hpnd * apnd * aicen, axis=0)
    vuin = ipnd * apnd * aicen
    dfpond = jnp.zeros(B, dtype)
    Tp = ct.Timelt - TD_TOPO

    # identify pond cells; remove ponds on thin/sparse ice (:203-224)
    hi = jnp.where(aice > ct.puny, vice / jnp.maximum(aice, ct.puny), 0.0)
    haspond = (aice > 0.01) & (hi > HICEMIN_TOPO) \
        & (volp > MIN_VOLP * aice)
    dfpond = jnp.where(haspond, dfpond, -volp)
    vuin = jnp.where(haspond[None], vuin, 0.0)
    volp = jnp.where(haspond, volp, 0.0)

    volpn, apondn, hpondn, volp, dvolp = _pond_area(
        dt, ncat, aice=aice, vice=vice, vsno=vsno, aicen=aicen,
        vicen=vicen, vsnon=vsnon, qicen=qicen, sicen=sicen, volp=volp,
        Tsfcn=Tsfcn, Tf=Tf, ktherm=ktherm, heat_capacity=heat_capacity)
    # outside pond cells the pond fields stay zero
    volpn = jnp.where(haspond[None], volpn, 0.0)
    apondn = jnp.where(haspond[None], apondn, 0.0)
    hpondn = jnp.where(haspond[None], hpondn, 0.0)
    dfpond = dfpond - jnp.where(haspond, dvolp, 0.0)

    # ---- refrozen lid evolution, categories 1..ncat-1 (:240-320) ----
    act = haspond[None] & (jnp.arange(ncat) < ncat - 1)[
        (...,) + (None,) * len(B)]
    rhoi_L = ct.Lfresh * ct.rhoi

    has_lid = vuin > ct.puny
    # (a) melting lid (Tsfcn > Tp)
    melt_br = act & has_lid & (Tsfcn > Tp)
    dvice_m = jnp.minimum(meltt[None] * apondn, vuin)
    apply_m = melt_br & (dvice_m > ct.puny)
    vuin_m = vuin - dvice_m
    volpn_m = volpn + dvice_m
    dfp_m = dvice_m
    # lid fully melted -> pond covered
    gone = apply_m & (vuin_m < ct.puny) & (volpn_m > ct.puny)
    volpn_m = jnp.where(gone, volpn_m + vuin_m, volpn_m)
    dfp_m = jnp.where(gone, dfp_m + vuin_m, dfp_m)
    vuin_m = jnp.where(gone, 0.0, vuin_m)

    # (b) freezing: existing lid grows (Tsfcn <= Tp, pond present)
    frz_br = act & has_lid & ~(Tsfcn > Tp) & (volpn > ct.puny)
    dTice = jnp.maximum(-Tsfcn - TD_TOPO, 0.0)
    omega = ct.kice * dTice / rhoi_L
    vv = vuin / jnp.maximum(aicen, ct.puny)
    dHui = jnp.sqrt(2.0 * omega * dt + vv * vv) - vv
    dvice_f = jnp.minimum(dHui * apondn, volpn)
    apply_f = frz_br & (dvice_f > ct.puny)

    # (c) freezing: new lid forms (no lid yet)
    new_br = act & ~has_lid
    dHui_n = jnp.maximum(-fsurf[None] * dt / rhoi_L, 0.0)
    dvice_n = jnp.minimum(dHui_n * apondn, volpn)
    apply_n = new_br & (dvice_n > ct.puny)

    vuin = jnp.where(apply_m, vuin_m,
                     jnp.where(apply_f, vuin + dvice_f,
                               jnp.where(apply_n, dvice_n, vuin)))
    volpn = jnp.where(apply_m, volpn_m,
                      jnp.where(apply_f, volpn - dvice_f,
                                jnp.where(apply_n, volpn - dvice_n, volpn)))
    dfpond = dfpond + jnp.sum(
        jnp.where(apply_m, dfp_m,
                  jnp.where(apply_f, -dvice_f,
                            jnp.where(apply_n, -dvice_n, 0.0))), axis=0)
    changed = apply_m | apply_f | apply_n
    hpondn = jnp.where(changed,
                       volpn / jnp.maximum(apondn, ct.puny), hpondn)

    # remove lid with no liquid pond (:322-344)
    kill = (aicen > ct.puny) & (volpn < ct.puny) & (vuin > ct.puny)
    vuin = jnp.where(kill, 0.0, vuin)

    # reload tracers (:346-369)
    live = apondn > ct.puny
    ipnd_out = jnp.where(live, vuin / jnp.maximum(apondn, ct.puny), 0.0)
    vuin = jnp.where(live, vuin, 0.0)
    has_n = aicen > ct.puny
    apnd_out = jnp.where(has_n, apondn / jnp.maximum(aicen, ct.puny), 0.0)
    hpnd_out = jnp.where(has_n, hpondn, 0.0)
    ipnd_out = jnp.where(has_n, ipnd_out, 0.0)
    return PondsTopoResult(apnd=apnd_out, hpnd=hpnd_out, ipnd=ipnd_out,
                           dfpond=dfpond, vuin=vuin)
