"""Mechanical redistribution (ridging).

TPU-native re-expression of /root/reference/source/ice_mechred.F90:
ridge_ice (:101, iterate-until-area-conserved driver), asum_ridging (:758),
ridge_prep (:820), ridge_itd (:936, participation + ridge-ITD functions),
ridge_shift (:1303, donor/receiver redistribution), ridge_check (:2040).

The reference's compressed cell lists and per-category shiftflags become
dense masked arithmetic; the donor loop (n) x receiver loop (nr) is a static
ncat x ncat double loop of fused vector ops; the outer iterate-until-
conserved loop is a ``lax.while_loop`` (normally 1-2 trips).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.state import TracerRegistry, DEP_AICE, DEP_VICE, DEP_VSNO, DEP_TRCR
from cice5_tpu.models.thermo.itd import tracer_weights, compute_tracers

# ridging parameters (ice_mechred.F90:66-84)
CS = 0.25          # fraction of shear energy contributing to ridging
FSNOWRDG = 0.5     # snow fraction that survives ridging
GSTAR = 0.15       # max G(h) participating (krdg_partic=0)
ASTAR = 0.05       # e-folding scale (krdg_partic=1)
MAXRAFT = 1.0      # max thickness of rafting ice (m)
HSTAR = 25.0       # mean ridge thickness parameter (krdg_redist=0)
NITERMAX = 20


class RidgeITD(NamedTuple):
    aksum: jnp.ndarray      # (*B)
    apartic0: jnp.ndarray   # (*B) open-water participation
    apartic: jnp.ndarray    # (ncat, *B)
    hrmin: jnp.ndarray
    hrmax: jnp.ndarray
    hrexp: jnp.ndarray
    krdg: jnp.ndarray


def ridge_itd(aicen, vicen, aice0, *, krdg_partic=1, krdg_redist=1,
              mu_rdg=4.0) -> RidgeITD:
    """Participation and ridge-ITD functions (ice_mechred.F90:936-1290)."""
    ncat = aicen.shape[0]
    # cumulative distribution Gsum(-1..ncat)
    a0 = jnp.where(aice0 > ct.puny, aice0, 0.0)
    an = jnp.where(aicen > ct.puny, aicen, 0.0)
    csum = jnp.concatenate([a0[None], a0[None] + jnp.cumsum(an, axis=0)],
                           axis=0)                     # (ncat+1, *B), G(0..ncat)
    total = jnp.maximum(csum[-1], ct.puny)
    G = csum / total                                   # G(0..ncat)
    Gm1 = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)  # G(n-1)

    if krdg_partic == 0:
        Gstari = 1.0 / GSTAR
        full = G < GSTAR
        partial = (~full) & (Gm1 < GSTAR)
        ap = jnp.where(full,
                       Gstari * (G - Gm1) * (2.0 - (Gm1 + G) * Gstari),
                       jnp.where(partial,
                                 Gstari * (GSTAR - Gm1)
                                 * (2.0 - (Gm1 + GSTAR) * Gstari), 0.0))
    else:
        astari = 1.0 / ASTAR
        xtmp = 1.0 / (1.0 - jnp.exp(-astari))
        eG = jnp.exp(-G * astari) * xtmp
        eGm1 = jnp.concatenate([jnp.full_like(eG[:1], xtmp), eG[:-1]], axis=0)
        ap = eGm1 - eG
    apartic0 = ap[0]
    apartic = ap[1:]

    hi = jnp.where(an > ct.puny, vicen / jnp.maximum(an, ct.puny), 0.0)
    hi = jnp.maximum(hi, ct.puny)
    has = an > ct.puny
    hrmin = jnp.where(has, jnp.minimum(2.0 * hi, hi + MAXRAFT), 0.0)
    if krdg_redist == 0:
        hrmax = jnp.where(has, jnp.maximum(2.0 * jnp.sqrt(HSTAR * hi),
                                           hrmin + ct.puny), 0.0)
        krdg = jnp.where(has, 0.5 * (hrmin + hrmax) / hi, 1.0)
        hrexp = jnp.zeros_like(hrmin)
    else:
        hrexp = jnp.where(has, mu_rdg * jnp.sqrt(hi), 0.0)
        krdg = jnp.where(has, (hrmin + hrexp) / hi, 1.0)
        hrmax = jnp.zeros_like(hrmin)

    aksum = apartic0 + jnp.sum(apartic * (1.0 - 1.0 / krdg), axis=0)
    return RidgeITD(aksum=aksum, apartic0=apartic0, apartic=apartic,
                    hrmin=hrmin, hrmax=hrmax, hrexp=hrexp, krdg=krdg)


class RidgeResult(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    trcrn: jnp.ndarray
    aice0: jnp.ndarray
    dardg1dt: jnp.ndarray
    dardg2dt: jnp.ndarray
    dvirdgdt: jnp.ndarray
    opening: jnp.ndarray
    fresh: jnp.ndarray      # snow mass melted into ocean (kg/m^2/s)
    fhocn: jnp.ndarray      # heat flux to melt that snow (W/m^2)
    faero_ocn: jnp.ndarray  # (n_aero, *B) aerosol in the unretained snow
                            # fraction, to ocean (kg/m^2/s;
                            # ice_mechred.F90:1704-1711 maero)
    dfpond: jnp.ndarray     # topo-pond water lost with ridged area (m;
                            # ice_mechred.F90:1713-1717 mpond -> fpond)
    dflux_bio: jnp.ndarray  # (nbtrcr, *B) skeletal-BGC mass crushed out
                            # by area reduction, to ocean (mmol/m^2/s) —
                            # conservation completion: the reference's
                            # area-rooted tracer redistribution loses
                            # (ardg1-ardg2)/a * amount without any flux
                            # (ice_mechred.F90:1770-1788)
    catdiag: jnp.ndarray    # per-category mechred history diagnostics,
                            # (9, ncat, *B) when cat_diags else (0,...):
                            # [dardg1ndt, dardg2ndt, dvirdgndt, araftn,
                            #  vraftn, aparticn, krdgn, aredistn,
                            #  vredistn] (ice_mechred.F90:660-700
                            #  ardg1nn/araftn, :1260-1280 aparticn/krdgn,
                            #  :1921-1930 aredistn/vredistn)
    asum_err: jnp.ndarray   # |asum - 1| after final iteration
    niter: jnp.ndarray      # iterations taken (ice_mechred.F90 niter;
    # normally 1-2 — perf diagnostic for the while-loop cost)


def _phi_sk(tr: TracerRegistry) -> float:
    """Porosity factor converting skeletal-BGC slot amounts (conc*sk_l
    per unit area) to physical mass, the flux_bio unit convention
    (ice_algae.F90:464)."""
    if tr.nbtrcr == 0:
        return 1.0
    from cice5_tpu.models.tracers.brine import PHI_SK
    return PHI_SK


def _chain_root_and_parents(tr: TracerRegistry, it):
    parents = []
    q = it
    while tr.depend[q] >= DEP_TRCR:
        q = tr.depend[q] - DEP_TRCR
        parents.append(q)
    return tr.depend[q], parents


def ridge_ice(dt, tr: TracerRegistry, hin_max, nilyr, nslyr, *, aicen,
              vicen, vsnon, trcrn, aice0, rdg_conv, rdg_shear,
              krdg_partic=1, krdg_redist=1, mu_rdg=4.0,
              ndtd=1, tr_pond_topo=False, cat_diags=False) -> RidgeResult:
    """Full ridging driver (ice_mechred.F90:101-757 ridge_ice).

    The iteration works entirely in conserved-AMOUNT space: ``atrcrn =
    tracer_weights * trcrn`` is built once before the loop, the body
    transfers amounts (donor removal is uniformly ``afrac * atrcrn[n]``;
    receiver gains are per-dependency-class scalar coefficients times
    ``atrcrn[n]``), and ``compute_tracers`` inverts back to values once
    after the loop — the reference's per-iteration values<->amounts
    roundtrip (ice_mechred.F90:1399-1502 region) is a fixed point of the
    amounts, so skipping it inside the loop changes nothing above the
    sub-puny zap level. The first iteration is peeled out of the
    ``while_loop`` (the scale-aware closure test converges in one trip
    almost everywhere, so the loop body normally never executes and the
    peeled trip fuses with the surrounding step)."""
    ncat = aicen.shape[0]
    B = aicen.shape[1:]
    dtype = aicen.dtype
    na = tr.n_aero

    # static per-slot receiver dependency-class masks: exactly one of
    # (area, ice-volume, snow-volume) per slot, zero for tracers lost in
    # ridging (level-ice and pond families, ice_mechred.F90 ridge_shift)
    mA = [0.0] * tr.ntrcr
    mV = [0.0] * tr.ntrcr
    mS = [0.0] * tr.ntrcr
    for it in range(tr.ntrcr):
        root, parents = _chain_root_and_parents(tr, it)
        if (tr.nt_alvl in parents or tr.nt_apnd in parents
                or it == tr.nt_alvl or it == tr.nt_vlvl):
            continue   # level-ice & pond tracers lost in ridging
        if root == DEP_AICE:
            # every non-excluded area-rooted slot is parentless (ponds,
            # the only parented area chains, are excluded above), so the
            # value-space reference amount farea*ardg2*t equals
            # (farea*ardg2/a_init) * atrcrn
            assert not parents
            mA[it] = 1.0
        elif root == DEP_VICE:
            mV[it] = 1.0
        else:
            mS[it] = 1.0
    maskA = jnp.asarray(mA, dtype)[:, None, None]
    maskV = jnp.asarray(mV, dtype)[:, None, None]
    maskS = jnp.asarray(mS, dtype)[:, None, None]
    # plain floats: numpy scalars would strongly promote f32 arrays under x64
    hmax = [float(h) for h in hin_max]
    hmax[ncat] = 1.0e8          # ridge_prep: all ridged ice thinner than top

    asum = aice0 + jnp.sum(aicen, axis=0)
    closing_net = CS * rdg_shear + rdg_conv
    divu_adv = (1.0 - asum) / dt
    closing_net = jnp.where(divu_adv < 0.0,
                            jnp.maximum(closing_net, -divu_adv), closing_net)
    opning = closing_net + divu_adv

    z = jnp.zeros(B, dtype)

    class Carry(NamedTuple):
        niter: jnp.ndarray
        aicen: jnp.ndarray
        vicen: jnp.ndarray
        vsnon: jnp.ndarray
        atrcrn: jnp.ndarray      # conserved tracer AMOUNTS (weights*trcrn)
        aice0: jnp.ndarray
        closing_net: jnp.ndarray
        opning: jnp.ndarray
        done: jnp.ndarray
        ardg1: jnp.ndarray
        ardg2: jnp.ndarray
        virdg: jnp.ndarray
        aopen: jnp.ndarray
        msnow_mlt: jnp.ndarray
        esnow_mlt: jnp.ndarray
        maero: jnp.ndarray       # (n_aero, *B) aerosol mass to ocean
        mpond: jnp.ndarray       # (*B) topo-pond water volume to ocean
        mbio: jnp.ndarray        # (nbtrcr, *B) BGC amount to ocean
        catdiag: jnp.ndarray     # (9 or 0, ncat, *B) per-cat diagnostics

    def cond(c: Carry):
        return (c.niter < NITERMAX) & jnp.any(~c.done)

    def body(c: Carry) -> Carry:
        active = ~c.done
        aicen, vicen, vsnon, atrcrn = c.aicen, c.vicen, c.vsnon, c.atrcrn
        aice0 = c.aice0

        r = ridge_itd(aicen, vicen, aice0, krdg_partic=krdg_partic,
                      krdg_redist=krdg_redist, mu_rdg=mu_rdg)

        # gross closing, limited by open water / category availability
        closing_gross = c.closing_net / jnp.maximum(r.aksum, ct.puny)
        opn = c.opning
        wk = r.apartic0 * closing_gross * dt
        fac = jnp.where((r.apartic0 > 0.0) & (wk > aice0),
                        aice0 / jnp.maximum(wk, ct.puny), 1.0)
        closing_gross = closing_gross * fac
        opn = opn * fac
        for n in range(ncat):
            wk = r.apartic[n] * closing_gross * dt
            lim = (aicen[n] > ct.puny) & (r.apartic[n] > 0.0) & (wk > aicen[n])
            fac = jnp.where(lim, aicen[n] / jnp.maximum(wk, ct.puny), 1.0)
            closing_gross = closing_gross * fac
            opn = opn * fac
        closing_gross = jnp.where(active, closing_gross, 0.0)
        opn = jnp.where(active, opn, 0.0)

        aice0 = jnp.maximum(
            aice0 - r.apartic0 * closing_gross * dt + opn * dt, 0.0)
        aopen = c.aopen + opn * dt

        a_init, v_init, s_init = aicen, vicen, vsnon

        ardg1_d = c.ardg1
        ardg2_d = c.ardg2
        virdg_d = c.virdg
        msnow = c.msnow_mlt
        esnow = c.esnow_mlt
        maero = c.maero
        mpond = c.mpond
        mbio = c.mbio

        # accumulate all donor/receiver updates in Python lists and apply
        # them as ONE stacked add per array: .at[n, it].add chains made
        # every update a full-array materialization (ncat*ncat*ntrcr of
        # them), the hottest region of the ridging profile
        d_aicen = [None] * ncat
        d_vicen = [None] * ncat
        d_vsnon = [None] * ncat
        d_atrcr = [None] * ncat     # (ntrcr, *B) amount deltas per category

        def acc(lst, i, val):
            lst[i] = val if lst[i] is None else lst[i] + val

        if cat_diags:
            cd_ardg1 = [None] * ncat
            cd_ardg2 = [None] * ncat
            cd_virdg = [None] * ncat
            cd_araft = [None] * ncat
            cd_vraft = [None] * ncat
            cd_reda = [None] * ncat
            cd_redv = [None] * ncat

        qs0, qs1 = tr.nt_qsno, tr.nt_qsno + nslyr
        for n in range(ncat):
            ridging = ((a_init[n] > ct.puny) & (r.apartic[n] > 0.0)
                       & (closing_gross > 0.0))
            ardg1n = jnp.where(ridging,
                               jnp.minimum(r.apartic[n] * closing_gross * dt,
                                           a_init[n]), 0.0)
            ardg2n = ardg1n / jnp.maximum(r.krdg[n], ct.puny)
            afrac = ardg1n / jnp.maximum(a_init[n], ct.puny)
            virdgn = v_init[n] * afrac
            vsrdgn = s_init[n] * afrac

            acc(d_aicen, n, -ardg1n)
            acc(d_vicen, n, -virdgn)
            acc(d_vsnon, n, -vsrdgn)

            ardg1_d = ardg1_d + ardg1n
            ardg2_d = ardg2_d + ardg2n
            virdg_d = virdg_d + virdgn
            msnow = msnow + ct.rhos * vsrdgn * (1.0 - FSNOWRDG)
            # snow enthalpy amount leaving with the melted snow fraction:
            # vsrdgn*qsno = afrac * (vsnon*qsno) = afrac * atrcrn[qsno]
            esnow = esnow + (1.0 - FSNOWRDG) / nslyr * afrac \
                * jnp.sum(atrcrn[n, qs0:qs1], axis=0)
            # aerosol in the unretained snow fraction goes to the ocean:
            # vsrdgn*(1-fsnowrdg)*conc == afrac*(1-FSNOWRDG)*amount
            # (ice_mechred.F90:1704-1711)
            if na:
                a0 = tr.nt_aero
                sno_amt = jnp.stack(
                    [atrcrn[n, a0 + 4 * it] + atrcrn[n, a0 + 4 * it + 1]
                     for it in range(na)])
                maero = maero + (1.0 - FSNOWRDG) * afrac[None] * sno_amt
            # ridged topo-pond water drains to the ocean: ardg1n*apnd*hpnd
            # == afrac * (aicen*apnd*hpnd) == afrac*amount[hpnd]
            # (ice_mechred.F90:1713-1717)
            if tr_pond_topo and tr.nt_hpnd >= 0:
                mpond = mpond + afrac * atrcrn[n, tr.nt_hpnd]
            # BGC: donor loses afrac*amount; receiver additions are
            # subtracted below, leaving the net area-crush loss
            if tr.nbtrcr:
                bio_amt = jnp.stack([atrcrn[n, s] for s in tr.nt_bgc])
                mbio = mbio + afrac[None] * bio_amt
            if cat_diags:
                # per-donor ridging amounts + rafting mask (rafting when
                # hrmin hits the 2h branch, i.e. hi <= maxraft;
                # ice_mechred.F90:1227 mraft, :671 araftn = mraft*ardg2n)
                hi_n = jnp.where(a_init[n] > ct.puny,
                                 v_init[n] / jnp.maximum(a_init[n],
                                                         ct.puny), 0.0)
                mraft = (hi_n <= MAXRAFT).astype(dtype)
                cd_ardg1[n] = ardg1n
                cd_ardg2[n] = ardg2n
                cd_virdg[n] = virdgn
                cd_araft[n] = mraft * ardg2n
                cd_vraft[n] = mraft * virdgn

            # donor-side removal: a fraction afrac of every conserved
            # amount leaves the donor category, uniformly across slots
            acc(d_atrcr, n, (-afrac)[None] * atrcrn[n])

            # receiver-side redistribution
            dhr = jnp.maximum(r.hrmax[n] - r.hrmin[n], ct.puny)
            dhr2 = jnp.maximum(r.hrmax[n] ** 2 - r.hrmin[n] ** 2, ct.puny)
            for nr in range(ncat):
                if krdg_redist == 0:
                    out = (r.hrmin[n] >= hmax[nr + 1]) | \
                        (r.hrmax[n] <= hmax[nr])
                    hL = jnp.maximum(r.hrmin[n], hmax[nr])
                    hR = jnp.minimum(r.hrmax[n], hmax[nr + 1])
                    hL = jnp.where(out, 0.0, hL)
                    hR = jnp.where(out, 0.0, hR)
                    farea = (hR - hL) / dhr
                    fvol = (hR * hR - hL * hL) / dhr2
                else:
                    hi1 = r.hrmin[n]
                    hexp = jnp.maximum(r.hrexp[n], ct.puny)
                    if nr < ncat - 1:
                        out = hi1 >= hmax[nr + 1]
                        hL = jnp.maximum(hi1, hmax[nr])
                        hR = hmax[nr + 1]
                        expL = jnp.exp(-(hL - hi1) / hexp)
                        expR = jnp.exp(-(hR - hi1) / hexp)
                        farea = jnp.where(out, 0.0, expL - expR)
                        fvol = jnp.where(
                            out, 0.0,
                            ((hL + hexp) * expL - (hR + hexp) * expR)
                            / (hi1 + hexp))
                    else:
                        hL = jnp.maximum(hi1, hmax[nr])
                        expL = jnp.exp(-(hL - hi1) / hexp)
                        farea = expL
                        fvol = (hL + hexp) * expL / (hi1 + hexp)

                acc(d_aicen, nr, farea * ardg2n)
                acc(d_vicen, nr, fvol * virdgn)
                acc(d_vsnon, nr, fvol * vsrdgn * FSNOWRDG)

                # receiver amounts: per-dependency-class coefficients
                # times the donor amounts (see masks above); cA equals
                # the reference's farea*ardg2*t for parentless area slots
                cA = farea * ardg2n / jnp.maximum(a_init[n], ct.puny)
                cV = fvol * afrac
                cS = fvol * afrac * FSNOWRDG
                coeff = (maskA * cA[None] + maskV * cV[None]
                         + maskS * cS[None])
                acc(d_atrcr, nr, coeff * atrcrn[n])
                if tr.nbtrcr:
                    mbio = mbio - cA[None] * bio_amt
                if cat_diags:
                    # redistribution into receiver nr (f_aredistn:
                    # farea*ardg2n, f_vredistn: fvol*virdgn)
                    acc(cd_reda, nr, farea * ardg2n)
                    acc(cd_redv, nr, fvol * virdgn)

        zB = jnp.zeros(B, dtype)
        aicen = aicen + jnp.stack([d if d is not None else zB
                                   for d in d_aicen])
        vicen = vicen + jnp.stack([d if d is not None else zB
                                   for d in d_vicen])
        vsnon = vsnon + jnp.stack([d if d is not None else zB
                                   for d in d_vsnon])
        atrcrn = atrcrn + jnp.stack(
            [d if d is not None else jnp.zeros((tr.ntrcr,) + B, dtype)
             for d in d_atrcr])

        catdiag = c.catdiag
        if cat_diags:
            zz = jnp.zeros(B, dtype)
            stk = lambda lst: jnp.stack([x if x is not None else zz
                                         for x in lst])
            catdiag = catdiag.at[:5].add(jnp.stack(
                [stk(cd_ardg1), stk(cd_ardg2), stk(cd_virdg),
                 stk(cd_araft), stk(cd_vraft)]))
            # participation/mean-ridge-thickness: the final iteration's
            # ridge_itd values (overwritten each trip, ice_mechred.F90:397)
            catdiag = catdiag.at[5].set(r.apartic)
            catdiag = catdiag.at[6].set(r.krdg)
            catdiag = catdiag.at[7].add(stk(cd_reda))
            catdiag = catdiag.at[8].add(stk(cd_redv))

        # convergence check (ridge_check, ice_mechred.F90:2040-2093)
        asum2 = aice0 + jnp.sum(aicen, axis=0)
        # scale-aware convergence: the reference tolerance (puny=1e-11,
        # ice_mechred.F90:2040-2093) is below the f32 rounding floor of
        # the category sum itself, so in f32 the loop would only stop
        # when the state stops changing bit-for-bit (~4 iterations at
        # gx1, measured); |asum-1| within a few ulps IS converged
        eps_sum = 8.0 * jnp.finfo(asum2.dtype).eps
        ok = jnp.abs(asum2 - 1.0) < jnp.maximum(ct.puny, eps_sum)
        divadv = (1.0 - asum2) / dt
        closing_new = jnp.where(ok, 0.0, jnp.maximum(0.0, -divadv))
        opning_new = jnp.where(ok, 0.0, jnp.maximum(0.0, divadv))

        return Carry(
            niter=c.niter + 1, aicen=aicen, vicen=vicen, vsnon=vsnon,
            atrcrn=atrcrn, aice0=aice0, closing_net=closing_new,
            opning=opning_new, done=c.done | ok,
            ardg1=ardg1_d, ardg2=ardg2_d, virdg=virdg_d, aopen=aopen,
            msnow_mlt=msnow, esnow_mlt=esnow, maero=maero, mpond=mpond,
            mbio=mbio, catdiag=catdiag)

    atrcrn0 = tracer_weights(tr, aicen, vicen, vsnon, trcrn) * trcrn
    init = Carry(niter=jnp.zeros((), jnp.int32), aicen=aicen, vicen=vicen,
                 vsnon=vsnon, atrcrn=atrcrn0, aice0=aice0,
                 closing_net=closing_net, opning=opning,
                 done=jnp.zeros(B, bool),
                 ardg1=z, ardg2=z, virdg=z, aopen=z, msnow_mlt=z,
                 esnow_mlt=z, maero=jnp.zeros((na,) + B, dtype), mpond=z,
                 mbio=jnp.zeros((tr.nbtrcr,) + B, dtype),
                 catdiag=jnp.zeros(((9 if cat_diags else 0), ncat) + B,
                                   dtype))
    # peel the first trip: it always runs, fuses with the surrounding
    # step, and leaves the while_loop a no-op wherever closure converges
    # in one iteration (the common case under the scale-aware tolerance)
    f = jax.lax.while_loop(cond, body, body(init))

    trcrn_f = compute_tracers(tr, f.atrcrn, f.aicen, f.vicen, f.vsnon)
    dti = 1.0 / dt
    dti_th = 1.0 / (ndtd * dt)
    asum_f = f.aice0 + jnp.sum(f.aicen, axis=0)
    return RidgeResult(
        aicen=f.aicen, vicen=f.vicen, vsnon=f.vsnon, trcrn=trcrn_f,
        aice0=f.aice0,
        dardg1dt=f.ardg1 * dti, dardg2dt=f.ardg2 * dti,
        dvirdgdt=f.virdg * dti, opening=f.aopen * dti,
        fresh=f.msnow_mlt * dti_th, fhocn=f.esnow_mlt * dti_th,
        faero_ocn=f.maero * dti_th, dfpond=f.mpond,
        dflux_bio=f.mbio * _phi_sk(tr) * dti_th,
        catdiag=(f.catdiag.at[:3].multiply(dti) if cat_diags
                 else f.catdiag),
        asum_err=jnp.abs(asum_f - 1.0), niter=f.niter)
