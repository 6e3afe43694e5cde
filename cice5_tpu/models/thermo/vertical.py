"""Vertical thermodynamics driver: growth, melt, and state update.

TPU-native re-expression of /root/reference/source/ice_therm_vertical.F90:
``thermo_vertical`` (:73) orchestrating init_vertical_profile (:845),
temperature solve (BL99 here; mushy when ktherm=2 lands), thickness_changes
(:1283), freeboard (:2031), adjust_enthalpy (:2177),
conservation_check_vthermo (:2283) and update_state_vthermo (:2417), plus
``frzmlt_bottom_lateral`` (:611).

The reference runs per-block over compressed active-cell lists; here each
routine is dense over an arbitrary batch shape *B (one thickness category per
call; layer axis first), fully vectorized, with masked no-ops for ice-free
cells. The layer-repartition overlap loop (adjust_enthalpy's while over k1,k2)
becomes an O(n^2) branch-free overlap matrix — 49 fused multiply-adds per
column on the VPU instead of data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.ops.blockwrite import set_cat
from cice5_tpu.models.thermo import bl99, shared

# lateral melt parameters (ice_therm_vertical.F90:1352-1360)
FLOEDIAM = 300.0
FLOESHAPE = 0.66
M1 = 1.6e-6
M2 = 1.36
QBOTMAX = -0.5 * ct.rhoi * ct.Lfresh


def frzmlt_bottom_lateral(dt, aice, frzmlt, vicen, vsnon, qicen_tot, qsnon_tot,
                          sst, Tf, strocnxT, strocnyT, ustar_min=0.0005,
                          Cdn_ocn=None):
    """Ocean-ice bottom heat flux, bottom temperature, and lateral-melt
    fraction (ice_therm_vertical.F90:611-837).

    qicen_tot/qsnon_tot: per-category column energies sum_k q_k*v/nlyr
    summed over categories upstream, i.e. etot = sum_n of those (J/m^2).
    Cdn_ocn: form-drag ocean exchange coefficient replacing the 0.006
    McPhee/Maykut constant when fbot_xfer_type='Cdn_ocn'
    (ice_therm_vertical.F90:741-746). Returns (Tbot, fbot, rside).
    """
    Tbot = Tf
    melt = (aice > ct.puny) & (frzmlt < 0.0)

    deltaT = jnp.maximum(sst - Tbot, 0.0)
    ustar = jnp.sqrt(jnp.sqrt(strocnxT ** 2 + strocnyT ** 2) / ct.rhow)
    ustar = jnp.maximum(ustar, ustar_min)
    chio = 0.006 if Cdn_ocn is None else Cdn_ocn
    cpchr = -ct.cp_ocn * ct.rhow * chio
    fbot = cpchr * deltaT * ustar
    fbot = jnp.maximum(fbot, frzmlt)          # frzmlt < fbot < 0

    wlat = M1 * deltaT ** M2
    rside = jnp.clip(wlat * dt * ct.pi / (FLOESHAPE * FLOEDIAM), 0.0, 1.0)

    etot = jnp.sum(qsnon_tot + qicen_tot, axis=0)   # (*B), < 0
    fside = rside * etot / dt

    xtmp = jnp.minimum(frzmlt / (fbot + fside + ct.puny), 1.0)
    fbot = jnp.where(melt, fbot * xtmp, 0.0)
    rside = jnp.where(melt, rside * xtmp, 0.0)
    return Tbot, fbot, rside


def adjust_enthalpy(z1, z2, hlyr, hn, qn):
    """Conservative repartition onto equal layers
    (ice_therm_vertical.F90:2177-2281).

    z1, z2: (nlyr+1, *B) old/new interface depths; qn: (nlyr, *B).
    Branch-free: new-layer quantity = sum over old layers of overlap * q.
    """
    nlyr = qn.shape[0]
    rhlyr = jnp.where(hn > ct.puny, 1.0 / jnp.maximum(hlyr, 1e-30), 0.0)
    # overlap[k2, k1] = max(0, min(z1[k1+1], z2[k2+1]) - max(z1[k1], z2[k2]))
    z1_lo = z1[:-1][None, :]      # (1, nlyr, *B)
    z1_hi = z1[1:][None, :]
    z2_lo = z2[:-1][:, None]      # (nlyr, 1, *B)
    z2_hi = z2[1:][:, None]
    hovlp = jnp.maximum(
        jnp.minimum(z1_hi, z2_hi) - jnp.maximum(z1_lo, z2_lo), 0.0)
    hq = jnp.sum(hovlp * qn[None, :], axis=1)       # (nlyr, *B)
    return hq * rhlyr[None]


def _interface_depths(dz):
    """(nlyr, *B) layer thicknesses -> (nlyr+1, *B) interface depths."""
    zero = jnp.zeros_like(dz[:1])
    return jnp.concatenate([zero, jnp.cumsum(dz, axis=0)], axis=0)


class ThicknessResult(NamedTuple):
    hin: jnp.ndarray
    hsn: jnp.ndarray
    hilyr: jnp.ndarray
    hslyr: jnp.ndarray
    zqin: jnp.ndarray
    zqsn: jnp.ndarray
    zSin: jnp.ndarray
    efinal: jnp.ndarray
    fhocnn: jnp.ndarray
    evapn: jnp.ndarray
    hsn_new: jnp.ndarray
    meltt: jnp.ndarray
    melts: jnp.ndarray
    meltb: jnp.ndarray
    congel: jnp.ndarray
    snoice: jnp.ndarray
    dsnow: jnp.ndarray


def thickness_changes(dt, *, nilyr, nslyr, ktherm, l_brine,
                      hilyr, hslyr, zqin, zqsn, zSin,
                      fbot, Tbot, flatn, fsurfn, fcondtopn, fcondbot,
                      fsnow, sss=None,
                      phi_i_mushy=0.85) -> ThicknessResult:
    """Growth/melt at all surfaces + snowfall + freeboard + repartition
    (ice_therm_vertical.F90:1283-2028). BL99 path (ktherm != 2); the mushy
    qmlt/salinity branches plug into the same budget structure later.
    """
    B = fbot.shape
    dzi = jnp.broadcast_to(hilyr, (nilyr,) + B)
    dzs = jnp.broadcast_to(hslyr, (nslyr,) + B)
    if ktherm == 2:
        from cice5_tpu.models.thermo import mushy
        qmlt = mushy.enthalpy_of_melting(zSin)
    else:
        qmlt = jnp.zeros_like(zqin)
    qm = zqin - qmlt
    emlt_atm = jnp.zeros(B, zqin.dtype)
    emlt_ocn = jnp.zeros(B, zqin.dtype)

    meltt = jnp.zeros(B, zqin.dtype)
    melts = jnp.zeros_like(meltt)
    meltb = jnp.zeros_like(meltt)
    congel = jnp.zeros_like(meltt)
    snoice = jnp.zeros_like(meltt)
    dsnow = jnp.zeros_like(meltt)
    evapn = jnp.zeros_like(meltt)

    # fresh-ice overshoot removal (:1467-1502)
    if not l_brine:
        Ts = shared.snow_temperature(zqsn)
        dhs_f = jnp.where(Ts > 0.0, ct.cp_ice * Ts * dzs / ct.Lfresh, 0.0)
        dzs = dzs - dhs_f
        zqsn = jnp.where(Ts > 0.0, -ct.rhos * ct.Lfresh, zqsn)
        Ti = (ct.Lfresh + zqin / ct.rhoi) / ct.cp_ice
        dhi_f = jnp.where(Ti > 0.0, ct.cp_ice * Ti * dzi / ct.Lfresh, 0.0)
        dzi = dzi - dhi_f
        zqin = jnp.where(Ti > 0.0, -ct.rhoi * ct.Lfresh, zqin)
        qm = zqin

    # energy budgets (:1506-1520)
    wk1 = -flatn * dt
    esub = jnp.maximum(wk1, 0.0)
    econ = jnp.minimum(wk1, 0.0)
    etop_mlt = jnp.maximum((fsurfn - fcondtopn) * dt, 0.0)
    wk2 = (fcondbot - fbot) * dt
    ebot_mlt = jnp.maximum(wk2, 0.0)
    ebot_gro = jnp.minimum(wk2, 0.0)

    # --- condensation (:1528-1546) ---
    hsn0 = jnp.sum(dzs, axis=0)
    has_snow = hsn0 > ct.puny
    dhs_c = jnp.where(has_snow, econ / (zqsn[0] - ct.rhos * ct.Lvap), 0.0)
    dhi_c = jnp.where(has_snow, 0.0, econ / (qm[0] - ct.rhoi * ct.Lvap))
    dzs = set_cat(dzs, 0, dzs[0] + (dhs_c))
    dzi = set_cat(dzi, 0, dzi[0] + (dhi_c))
    evapn = evapn + dhs_c * ct.rhos + dhi_c * ct.rhoi
    emlt_atm = emlt_atm - qmlt[0] * dhi_c

    # --- bottom growth (:1552-1624) ---
    if ktherm == 2:
        from cice5_tpu.models.thermo import mushy
        qbotm = mushy.enthalpy_mush(Tbot, sss)
        qbotp = -ct.Lfresh * ct.rhoi * (1.0 - phi_i_mushy)
        qbot0 = qbotm - qbotp
        dhi_g = ebot_gro / qbotp                  # > 0
        hqtot = dzi[nilyr - 1] * zqin[nilyr - 1] + dhi_g * qbotm
        hstot_s = dzi[nilyr - 1] * zSin[nilyr - 1] + dhi_g * sss
        emlt_ocn = emlt_ocn - qbot0 * dhi_g
        dzi = set_cat(dzi, nilyr - 1, dzi[nilyr - 1] + (dhi_g))
        ok = dzi[nilyr - 1] > ct.puny
        den = jnp.maximum(dzi[nilyr - 1], 1e-30)
        newq = jnp.where(ok, hqtot / den, zqin[nilyr - 1])
        newS = jnp.where(ok, hstot_s / den, zSin[nilyr - 1])
        zqin = set_cat(zqin, nilyr - 1, newq)
        zSin = set_cat(zSin, nilyr - 1, newS)
        qmlt = set_cat(qmlt, nilyr - 1,
                       jnp.where(ok, mushy.enthalpy_of_melting(newS),
                                 qmlt[nilyr - 1]))
        qm = set_cat(qm, nilyr - 1, newq - qmlt[nilyr - 1])
        congel = congel + dhi_g
    elif ktherm == 0:
        # zero layer: new bottom ice carries the latent placeholder only
        # (ice_therm_vertical.F90:1575-1577, heat_capacity=F branch) —
        # any sensible part would violate zerolayer_check
        qbot = jnp.full_like(Tbot, -ct.rhoi * ct.Lfresh)
        dhi_g = ebot_gro / qbot                       # > 0
        hqtot = dzi[nilyr - 1] * zqin[nilyr - 1] + dhi_g * qbot
        dzi = set_cat(dzi, nilyr - 1, dzi[nilyr - 1] + (dhi_g))
        newq = jnp.where(dzi[nilyr - 1] > ct.puny,
                         hqtot / jnp.maximum(dzi[nilyr - 1], 1e-30),
                         zqin[nilyr - 1])
        zqin = set_cat(zqin, nilyr - 1, newq)
        qm = set_cat(qm, nilyr - 1, newq - qmlt[nilyr - 1])
        congel = congel + dhi_g
    else:
        Tmlts_b = -zSin[nilyr - 1] * ct.depressT
        if l_brine:
            Tb = jnp.minimum(Tbot, -ct.puny)
            qbot = -ct.rhoi * (ct.cp_ice * (Tmlts_b - Tb)
                               + ct.Lfresh * (1.0 - Tmlts_b / Tb)
                               - ct.cp_ocn * Tmlts_b)
            qbot = jnp.minimum(qbot, QBOTMAX)
        else:
            qbot = -ct.rhoi * (-ct.cp_ice * Tbot + ct.Lfresh)
        dhi_g = ebot_gro / qbot                       # > 0
        hqtot = dzi[nilyr - 1] * zqin[nilyr - 1] + dhi_g * qbot
        dzi = set_cat(dzi, nilyr - 1, dzi[nilyr - 1] + (dhi_g))
        newq = jnp.where(dzi[nilyr - 1] > ct.puny,
                         hqtot / jnp.maximum(dzi[nilyr - 1], 1e-30),
                         zqin[nilyr - 1])
        zqin = set_cat(zqin, nilyr - 1, newq)
        qm = set_cat(qm, nilyr - 1, newq - qmlt[nilyr - 1])
        congel = congel + dhi_g

    # --- snow: sublimation + top melt, top-down (:1629-1690) ---
    for k in range(nslyr):
        if ktherm == 2:
            # remove internal snow melt (:1633-1645)
            warm = zqsn[k] > -ct.rhos * ct.Lfresh
            dhs_m = jnp.where(
                warm,
                jnp.maximum(-dzs[k],
                            -((zqsn[k] + ct.rhos * ct.Lfresh)
                              / (ct.rhos * ct.Lfresh)) * dzs[k]), 0.0)
            dzs = set_cat(dzs, k, dzs[k] + (dhs_m))
            zqsn = set_cat(zqsn, k,
                           jnp.where(warm, -ct.rhos * ct.Lfresh, zqsn[k]))
            melts = melts - dhs_m
        qsub = zqsn[k] - ct.rhos * ct.Lvap
        dhs = jnp.maximum(-dzs[k], esub / qsub)
        dzs = set_cat(dzs, k, dzs[k] + (dhs))
        esub = jnp.maximum(esub - dhs * qsub, 0.0)
        evapn = evapn + dhs * ct.rhos

        qk = jnp.minimum(zqsn[k], -ct.puny)
        dhs2 = jnp.maximum(-dzs[k], etop_mlt / qk)
        dzs = set_cat(dzs, k, dzs[k] + (dhs2))
        etop_mlt = jnp.maximum(etop_mlt - dhs2 * qk, 0.0)
        melts = melts - dhs2

    # --- ice: sublimation + top melt, top-down (:1692-1733) ---
    for k in range(nilyr):
        qsub = qm[k] - ct.rhoi * ct.Lvap
        dhi = jnp.maximum(-dzi[k], esub / qsub)
        dzi = set_cat(dzi, k, dzi[k] + (dhi))
        esub = jnp.maximum(esub - dhi * qsub, 0.0)
        evapn = evapn + dhi * ct.rhoi
        emlt_ocn = emlt_ocn - qmlt[k] * dhi

        qneg = qm[k] < 0.0
        qmk = jnp.where(qneg, qm[k], 0.0)
        dhi2 = jnp.where(qneg,
                         jnp.maximum(-dzi[k], etop_mlt / jnp.minimum(qmk, -1e-30)),
                         -dzi[k])
        emlt_ocn = emlt_ocn - jnp.maximum(zqin[k], qmlt[k]) * dhi2
        dzi = set_cat(dzi, k, dzi[k] + (dhi2))
        etop_mlt = jnp.maximum(etop_mlt - dhi2 * qmk, 0.0)
        meltt = meltt - dhi2
        qm = set_cat(qm, k, qmk)
    # --- ice: bottom melt, bottom-up (:1735-1760) ---
    for k in reversed(range(nilyr)):
        qneg = qm[k] < 0.0
        qmk = jnp.where(qneg, qm[k], 0.0)
        dhi = jnp.where(qneg,
                        jnp.maximum(-dzi[k], ebot_mlt / jnp.minimum(qmk, -1e-30)),
                        -dzi[k])
        emlt_ocn = emlt_ocn - jnp.maximum(zqin[k], qmlt[k]) * dhi
        dzi = set_cat(dzi, k, dzi[k] + (dhi))
        ebot_mlt = jnp.maximum(ebot_mlt - dhi * qmk, 0.0)
        meltb = meltb - dhi
        qm = set_cat(qm, k, qmk)
    # --- snow: bottom melt (only once ice gone) ---
    for k in reversed(range(nslyr)):
        qk = jnp.minimum(zqsn[k], -ct.puny)
        dhs = jnp.maximum(-dzs[k], ebot_mlt / qk)
        dzs = set_cat(dzs, k, dzs[k] + (dhs))
        ebot_mlt = jnp.maximum(ebot_mlt - dhs * qk, 0.0)
        melts = melts - dhs

    fhocnn = fbot + (esub + etop_mlt + ebot_mlt) / dt

    # --- snowfall (:1764-1795) ---
    hsn_new = jnp.where(fsnow > 0.0, fsnow / ct.rhos * dt, 0.0)
    hstot = dzs[0] + hsn_new
    q0 = jnp.where(hstot > 0.0,
                   jnp.minimum((dzs[0] * zqsn[0]
                                + hsn_new * (-ct.rhos * ct.Lfresh))
                               / jnp.maximum(hstot, 1e-30),
                               -ct.rhos * ct.Lfresh),
                   zqsn[0])
    zqsn = set_cat(zqsn, 0, q0)
    dzs = set_cat(dzs, 0, jnp.where(hstot > 0.0, hstot, dzs[0]))
    hin = jnp.sum(dzi, axis=0)
    hsn = jnp.sum(dzs, axis=0)
    dsnow = hsn - hslyr * nslyr   # includes new snow; freeboard adjusts below

    # --- freeboard: snow-to-ice conversion (:2031-2174), ktherm != 2 ---
    if ktherm != 2:
        wk1 = hsn - hin * (ct.rhow - ct.rhoi) / ct.rhos
        below = (wk1 > ct.puny) & (hsn > ct.puny)
        dhsn_tot = jnp.where(below, jnp.minimum(wk1 * ct.rhoi / ct.rhow, hsn), 0.0)
        dhin = dhsn_tot * ct.rhos / ct.rhoi
        active_fb = dhin > ct.puny
        hqs = jnp.zeros_like(hin)
        dhsn_rem = dhsn_tot
        for k in reversed(range(nslyr)):
            dhs = jnp.where(active_fb, jnp.minimum(dhsn_rem, dzs[k]), 0.0)
            hsn = hsn - dhs
            dsnow = dsnow - dhs
            dzs = set_cat(dzs, k, dzs[k] + (-dhs))
            dhsn_rem = jnp.maximum(dhsn_rem - dhs, 0.0)
            hqs = hqs + dhs * zqsn[k]
        wk2 = dzi[0] + dhin
        hin = jnp.where(active_fb, hin + dhin, hin)
        zqin = set_cat(zqin, 0, jnp.where(
            active_fb, (dzi[0] * zqin[0] + hqs) / jnp.maximum(wk2, 1e-30),
            zqin[0]))
        dzi = set_cat(dzi, 0, jnp.where(active_fb, wk2, dzi[0]))
        snoice = snoice + jnp.where(active_fb, dhin, 0.0)

    # --- repartition into equal layers (:1845-1957) ---
    hin = jnp.maximum(hin, 0.0)
    hsn = jnp.maximum(hsn, 0.0)
    hilyr_new = hin / nilyr
    hslyr_new = hsn / nslyr

    zi1 = _interface_depths(jnp.maximum(dzi, 0.0))
    zi1 = set_cat(zi1, nilyr, hin)
    zi2 = _interface_depths(jnp.broadcast_to(hilyr_new, (nilyr,) + B))
    zi2 = set_cat(zi2, nilyr, hin)
    zqin = adjust_enthalpy(zi1, zi2, hilyr_new, hin, zqin)
    if ktherm == 2:
        zSin = adjust_enthalpy(zi1, zi2, hilyr_new, hin, zSin)

    if nslyr > 1:
        zs1 = _interface_depths(jnp.maximum(dzs, 0.0))
        zs1 = set_cat(zs1, nslyr, hsn)
        zs2 = _interface_depths(jnp.broadcast_to(hslyr_new, (nslyr,) + B))
        zs2 = set_cat(zs2, nslyr, hsn)
        zqsn = adjust_enthalpy(zs1, zs2, hslyr_new, hsn, zqsn)

    if ktherm == 2:
        # remove very thin snow layers (:1959-1974)
        thin = hsn <= ct.puny
        fhocnn = fhocnn + jnp.where(
            thin, jnp.sum(zqsn, axis=0) * hsn / (nslyr * dt), 0.0)
        zqsn = jnp.where(thin[None], -ct.rhos * ct.Lfresh, zqsn)
        hslyr_new = jnp.where(thin, 0.0, hslyr_new)

    # --- final energy (:1977-2006) ---
    efinal = -evapn * ct.Lvap
    efinal = efinal + jnp.sum(hslyr_new[None] * zqsn, axis=0)
    efinal = efinal + jnp.sum(hilyr_new[None] * zqin, axis=0)
    evapn = evapn / dt
    if ktherm == 2:
        fhocnn = fhocnn + emlt_ocn / dt
        efinal = efinal + emlt_atm

    return ThicknessResult(
        hin=hin, hsn=hsn, hilyr=hilyr_new, hslyr=hslyr_new,
        zqin=zqin, zqsn=zqsn, zSin=zSin, efinal=efinal, fhocnn=fhocnn,
        evapn=evapn,
        hsn_new=hsn_new, meltt=meltt, melts=melts, meltb=meltb,
        congel=congel, snoice=snoice, dsnow=dsnow)


class ThermoVerticalResult(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    Tsf: jnp.ndarray
    zqin: jnp.ndarray
    zqsn: jnp.ndarray
    zSin: jnp.ndarray
    fsensn: jnp.ndarray
    flatn: jnp.ndarray
    flwoutn: jnp.ndarray
    fsurfn: jnp.ndarray
    fcondtopn: jnp.ndarray
    fswsfc: jnp.ndarray
    evapn: jnp.ndarray
    freshn: jnp.ndarray
    fsaltn: jnp.ndarray
    fhocnn: jnp.ndarray
    meltt: jnp.ndarray
    melts: jnp.ndarray
    meltb: jnp.ndarray
    congel: jnp.ndarray
    snoice: jnp.ndarray
    dsnow: jnp.ndarray
    ferr: jnp.ndarray
    converged: jnp.ndarray


def thermo_vertical(dt, cfg, *, aicen, vicen, vsnon, Tsfcn, zqin, zqsn, zSin,
                    flw, potT, Qa, rhoa, fsnow, shcoef, lhcoef,
                    fswsfc, fswint, Sswabs, Iswabs,
                    fbot, Tbot, sss, hpond=None, apond=None,
                    fsurfn_f=None, fcondtopn_f=None, flatn_f=None,
                    fsensn_f=None) -> ThermoVerticalResult:
    """Full vertical thermo update for ONE category slab over batch *B
    (ice_therm_vertical.F90:73-536 thermo_vertical).

    Inputs are per-category fields; mask = aicen > puny. cfg is ModelConfig.
    """
    nilyr, nslyr = cfg.nilyr, cfg.nslyr
    th = cfg.thermo
    # l_brine also requires heat capacity (ice_therm_vertical.F90:562-566)
    l_brine = th.saltmax > shared.min_salin and th.ktherm != 0
    mask = aicen > ct.puny

    ai = jnp.maximum(aicen, ct.puny)
    hin = jnp.where(mask, vicen / ai, 0.0)
    hsn = jnp.where(mask, vsnon / ai, 0.0)
    hilyr = hin / nilyr
    hslyr = hsn / nslyr

    Tmlts = -zSin * ct.depressT
    zTin = shared.calculate_Tin_from_qin(zqin, Tmlts, l_brine)
    # snow temperature, guarded for thin snow (hs_min)
    l_snow = hsn > ct.hs_min
    zTsn = jnp.where(l_snow[None], shared.snow_temperature(zqsn), 0.0)
    zTsn = jnp.minimum(zTsn, 0.0)
    Tsf = Tsfcn

    einit = (jnp.sum(hslyr[None] * jnp.where(l_snow[None], zqsn,
                                             shared.snow_enthalpy(zTsn)),
                     axis=0)
             + jnp.sum(hilyr[None] * zqin, axis=0))

    worki, works = hin, hsn

    if th.ktherm == 2:
        # NOTE calc_Tsfc=False semantics: the reference's mushy solver has
        # no prescribed-flux matrix variant — thermo_vertical calls
        # temperature_changes_salinity unconditionally and the coupler's
        # fsurfn_f/fcondtopn_f are simply not consumed by the solver
        # (ice_therm_vertical.F90:316-343; only BL99 has the know-Tsfc
        # matrices, ice_therm_bl99.F90:1484). We reproduce that behavior
        # exactly: mushy + calc_Tsfc=False solves its own surface.
        from cice5_tpu.models.thermo import mushy as mushy_mod
        if hpond is None:
            hpond = jnp.zeros_like(Tsf)
            apond = jnp.zeros_like(Tsf)
        mr = mushy_mod.temperature_changes_salinity(
            dt, nilyr=nilyr, nslyr=nslyr, mask=mask, rhoa=rhoa, flw=flw,
            potT=potT, Qa=Qa, shcoef=shcoef, lhcoef=lhcoef, fswsfc=fswsfc,
            fswint=fswint, Sswabs=Sswabs, Iswabs=Iswabs, hilyr=hilyr,
            hslyr=hslyr, zqin=zqin, zSin=zSin, zqsn=zqsn, hpond=hpond,
            apond=apond, Tsf=Tsf, Tbot=Tbot, sss=sss,
            dSdt_slow_mode=th.dSdt_slow_mode,
            phi_c_slow_mode=th.phi_c_slow_mode,
            a_rapid_mode=th.a_rapid_mode,
            Rac_rapid_mode=th.Rac_rapid_mode,
            aspect_rapid_mode=th.aspect_rapid_mode,
            dtemp_errmax=th.dTemp_errmax, nit_max=th.nit_max_picard)
        # pack into the BL99Result-compatible view used below
        class _R:
            pass
        r = _R()
        r.Tsf = mr.Tsf
        r.zqin = mr.zqin
        r.zqsn = mr.zqsn
        r.fsensn = mr.fsensn
        r.flatn = mr.flatn
        r.flwoutn = mr.flwoutn
        r.fsurfn = mr.fsurfn
        r.fcondtopn = mr.fcondtopn
        r.fcondbot = mr.fcondbot
        r.fswsfc = fswsfc
        r.fswint = fswint
        r.converged = mr.converged
        zSin_cur = mr.zSin
        hilyr = mr.hilyr     # flood_ice may have changed layer thicknesses
        hslyr = mr.hslyr
        snoice_m = mr.snoice
        fadvocn = mr.fadvocn
    elif th.ktherm == 0:
        # Semtner zero-layer: solve the surface balance only; enthalpies
        # stay at the latent-only values (ice_therm_vertical.F90:369-400)
        from cice5_tpu.models.thermo import zerolayer
        zr = zerolayer.zerolayer_temperature(
            dt, mask=mask, rhoa=rhoa, flw=flw, potT=potT, Qa=Qa,
            shcoef=shcoef, lhcoef=lhcoef, fswsfc=fswsfc, hilyr=hilyr,
            hslyr=hslyr, nilyr=nilyr, nslyr=nslyr, Tsf=Tsf, Tbot=Tbot,
            ksno=th.ksno)

        class _R:
            pass
        r = _R()
        r.Tsf = zr.Tsf
        r.zqin = jnp.full_like(zqin, -ct.rhoi * ct.Lfresh)
        r.zqsn = jnp.full_like(zqsn, -ct.rhos * ct.Lfresh)
        r.fsensn = zr.fsensn
        r.flatn = zr.flatn
        r.flwoutn = zr.flwoutn
        r.fsurfn = zr.fsurfn
        r.fcondtopn = zr.fcondtopn
        r.fcondbot = zr.fcondbot
        r.fswsfc = fswsfc
        r.fswint = jnp.zeros_like(fswsfc)
        r.converged = zr.converged
        zSin_cur = zSin
        snoice_m = jnp.zeros_like(Tsf)
        fadvocn = jnp.zeros_like(Tsf)
        einit = (jnp.sum(hslyr[None] * r.zqsn, axis=0)
                 + jnp.sum(hilyr[None] * r.zqin, axis=0))
    else:
        r = bl99.temperature_changes(
            dt, nilyr=nilyr, nslyr=nslyr, conduct=th.conduct, ksno=th.ksno,
            l_brine=l_brine, mask=mask, rhoa=rhoa, flw=flw, potT=potT, Qa=Qa,
            shcoef=shcoef, lhcoef=lhcoef, fswsfc=fswsfc, fswint=fswint,
            Sswabs=Sswabs, Iswabs=Iswabs, hilyr=hilyr, hslyr=hslyr,
            zTin=zTin, zSin=zSin, zTsn=zTsn, Tsf=Tsf, Tbot=Tbot, einit=einit,
            calc_Tsfc=th.calc_Tsfc, fsurfn_f=fsurfn_f,
            fcondtopn_f=fcondtopn_f, flatn_f=flatn_f, fsensn_f=fsensn_f)
        zSin_cur = zSin
        snoice_m = jnp.zeros_like(Tsf)
        fadvocn = jnp.zeros_like(Tsf)

    tc = thickness_changes(
        dt, nilyr=nilyr, nslyr=nslyr, ktherm=th.ktherm, l_brine=l_brine,
        hilyr=hilyr, hslyr=hslyr, zqin=r.zqin, zqsn=r.zqsn, zSin=zSin_cur,
        fbot=fbot, Tbot=Tbot, flatn=r.flatn, fsurfn=r.fsurfn,
        fcondtopn=r.fcondtopn, fcondbot=r.fcondbot, fsnow=fsnow, sss=sss,
        phi_i_mushy=th.phi_i_mushy)

    # conservation check (ice_therm_vertical.F90:2283-2400)
    einp = (r.fsurfn - r.flatn + r.fswint - tc.fhocnn
            - fsnow * ct.Lfresh - fadvocn) * dt
    ferr = jnp.where(mask, jnp.abs(tc.efinal - einit - einp) / dt, 0.0)

    # water/salt fluxes (:447-476)
    dhi = tc.hin - worki
    dhs = tc.hsn - works - tc.hsn_new
    freshn = tc.evapn - (ct.rhoi * dhi + ct.rhos * dhs) / dt
    fsaltn = -ct.rhoi * dhi * ct.ice_ref_salinity * 0.001 / dt

    # update state (update_state_vthermo :2417-2530): zero everything if the
    # ice melted entirely.
    gone = ~mask | (tc.hin <= 0.0)
    aicen_new = jnp.where(gone & mask, 0.0, aicen)
    vicen_new = jnp.where(mask, jnp.where(gone, 0.0, aicen * tc.hin), vicen)
    vsnon_new = jnp.where(mask, jnp.where(gone, 0.0, aicen * tc.hsn), vsnon)
    Tsf_new = jnp.where(mask, jnp.where(gone, Tbot, r.Tsf), Tsfcn)
    zqin_new = jnp.where(mask[None], jnp.where(gone[None], 0.0, tc.zqin), zqin)
    zqsn_new = jnp.where(mask[None], jnp.where(gone[None], 0.0, tc.zqsn), zqsn)
    zSin_new = jnp.where(mask[None], jnp.where(gone[None], 0.0, tc.zSin), zSin)

    z = jnp.zeros_like(aicen)
    msk = lambda x: jnp.where(mask, x, 0.0)
    return ThermoVerticalResult(
        aicen=aicen_new, vicen=vicen_new, vsnon=vsnon_new, Tsf=Tsf_new,
        zqin=zqin_new, zqsn=zqsn_new, zSin=zSin_new,
        fsensn=msk(r.fsensn), flatn=msk(r.flatn), flwoutn=msk(r.flwoutn),
        fsurfn=msk(r.fsurfn), fcondtopn=msk(r.fcondtopn),
        fswsfc=msk(r.fswsfc),
        evapn=msk(tc.evapn), freshn=msk(freshn), fsaltn=msk(fsaltn),
        fhocnn=msk(tc.fhocnn + fadvocn),
        meltt=msk(tc.meltt), melts=msk(tc.melts), meltb=msk(tc.meltb),
        congel=msk(tc.congel), snoice=msk(tc.snoice + snoice_m),
        dsnow=msk(tc.dsnow),
        ferr=ferr, converged=r.converged)
