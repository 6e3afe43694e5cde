"""Elastic-viscous-plastic (EVP) sea-ice dynamics.

TPU-native re-expression of /root/reference/source/ice_dyn_evp.F90: the
``evp(dt)`` driver (:68) and the 4-corner bilinear ``stress`` kernel
(:520-849), with the momentum solve from ice_dyn_shared.F90:623 (stepu).

Key TPU design decisions vs the reference's MPI structure:

* The reference exchanges (uvel, vvel) by MPI halo every one of the ~120
  subcycles (ice_dyn_evp.F90:392-399) and computes stresses redundantly on
  the N/E ghost rows so stepu's stress divergence needs no second exchange.
  Here the same scheme becomes ONE ghost-ring `extend` (a pair of ppermutes
  under shard_map) of the stacked (u, v) per subcycle; the stress kernel runs
  on the (ny+1, nx+1) "region" covering interior + N/E ghost row/col, and the
  momentum update consumes static slices of that region.
* All 12 stress components stay resident across subcycles as a single
  (12, ny+1, nx+1) array threaded through `lax.fori_loop` — XLA keeps the
  loop body fused; the Pallas fused-subcycle kernel (ops/pallas) replaces
  this loop on the hot path.
* Gathered icellt/icellu lists become dense masks; masked cells compute
  zeros (no gathers, no data-dependent shapes).

The per-cell math (strain rates, Delta, replacement pressure, relaxation,
stress-divergence combinations) follows ice_dyn_evp.F90:627-849 exactly so
that single-column/gx3 trajectories are comparable to the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.constants import FieldLoc, FieldType
from cice5_tpu.parallel import Topology, extend
from cice5_tpu.models.dynamics import shared as dyn

P027, P055, P111, P166, P222, P25, P333, P5 = (
    0.027777777777777776, 0.05555555555555555, 0.1111111111111111,
    0.16666666666666666, 0.2222222222222222, 0.25, 0.3333333333333333, 0.5)


class StressResult(NamedTuple):
    stress: jnp.ndarray   # (12, nyr, nxr) updated stress components
    str8: jnp.ndarray     # (8, nyr, nxr) stress-divergence combinations
    divu: jnp.ndarray
    shear: jnp.ndarray
    rdg_conv: jnp.ndarray
    rdg_shear: jnp.ndarray
    prs_sig: jnp.ndarray


def stress_kernel(p: dyn.EVPParams, uvE, vvE, stress, *, maskR, strengthR,
                  gR) -> StressResult:
    """One EVP stress relaxation step on the region grid
    (ice_dyn_evp.F90:520-849 'stress').

    uvE/vvE: extended velocities (ny+2, nx+2). stress: (12, nyr, nxr) with
    component order [sp1..4, sm1..4, s12_1..4]. maskR: icetmask on region.
    gR: dict of region metric arrays (dxt, dyt, dxhy, dyhx, cxp, cyp, cxm,
    cym, tarear, tinyarea).
    """
    dxt, dyt = gR["dxt"], gR["dyt"]
    dxhy, dyhx = gR["dxhy"], gR["dyhx"]
    tarear, tinyarea = gR["tarear"], gR["tinyarea"]

    # --- strain rates * area (ice_dyn_evp.F90:627-655) ---
    ((divune, divunw, divusw, divuse),
     (tensionne, tensionnw, tensionsw, tensionse),
     (shearne, shearnw, shearsw, shearse)) = strain_rates(uvE, vvE, gR)

    ecci = p.ecci
    Deltane = jnp.sqrt(divune ** 2 + ecci * (tensionne ** 2 + shearne ** 2))
    Deltanw = jnp.sqrt(divunw ** 2 + ecci * (tensionnw ** 2 + shearnw ** 2))
    Deltase = jnp.sqrt(divuse ** 2 + ecci * (tensionse ** 2 + shearse ** 2))
    Deltasw = jnp.sqrt(divusw ** 2 + ecci * (tensionsw ** 2 + shearsw ** 2))

    # ridging/diagnostic terms (:667-677) — cheap, kept every subcycle, the
    # caller uses only the final iteration's values (matching ksub == ndte)
    divu = P25 * (divune + divunw + divuse + divusw) * tarear
    Delta_avg = P25 * (Deltane + Deltanw + Deltase + Deltasw) * tarear
    rdg_conv = -jnp.minimum(divu, 0.0)
    rdg_shear = P5 * (Delta_avg - jnp.abs(divu))
    shear = P25 * tarear * jnp.sqrt(
        (tensionne + tensionnw + tensionse + tensionsw) ** 2
        + (shearne + shearnw + shearse + shearsw) ** 2)

    # --- replacement pressure / Delta (:683-699) ---
    tiny = jnp.maximum(tinyarea, 1e-30)
    c0ne = strengthR / jnp.maximum(Deltane, tiny)
    c0nw = strengthR / jnp.maximum(Deltanw, tiny)
    c0sw = strengthR / jnp.maximum(Deltasw, tiny)
    c0se = strengthR / jnp.maximum(Deltase, tiny)
    prs_sig = c0ne * Deltane

    c1ne, c1nw = c0ne * p.arlx1i, c0nw * p.arlx1i
    c1sw, c1se = c0sw * p.arlx1i, c0se * p.arlx1i
    c0ne, c0nw = c1ne * ecci, c1nw * ecci
    c0sw, c0se = c1sw * ecci, c1se * ecci

    d1 = p.denom1
    sp1 = (stress[0] + c1ne * (divune - Deltane)) * d1
    sp2 = (stress[1] + c1nw * (divunw - Deltanw)) * d1
    sp3 = (stress[2] + c1sw * (divusw - Deltasw)) * d1
    sp4 = (stress[3] + c1se * (divuse - Deltase)) * d1
    sm1 = (stress[4] + c0ne * tensionne) * d1
    sm2 = (stress[5] + c0nw * tensionnw) * d1
    sm3 = (stress[6] + c0sw * tensionsw) * d1
    sm4 = (stress[7] + c0se * tensionse) * d1
    s121 = (stress[8] + c0ne * shearne * P5) * d1
    s122 = (stress[9] + c0nw * shearnw * P5) * d1
    s123 = (stress[10] + c0sw * shearsw * P5) * d1
    s124 = (stress[11] + c0se * shearse * P5) * d1

    m = maskR
    z = jnp.zeros_like(sp1)
    comps = [jnp.where(m, s, z) for s in
             (sp1, sp2, sp3, sp4, sm1, sm2, sm3, sm4, s121, s122, s123, s124)]

    str8 = stress_divergence(comps, dxt, dyt, dxhy, dyhx, maskR)
    stress_new = jnp.stack(comps)
    return StressResult(stress=stress_new, str8=str8, divu=divu, shear=shear,
                        rdg_conv=rdg_conv, rdg_shear=rdg_shear,
                        prs_sig=prs_sig)


def strain_rates(uvE, vvE, gR):
    """4-corner strain rates * area (ice_dyn_evp.F90:627-655; identical in
    ice_dyn_eap.F90:1196-1228). Returns (div, tension, shear) tuples in
    corner order (ne, nw, sw, se)."""
    u00, uW = uvE[1:, 1:], uvE[1:, :-1]
    uS, uSW = uvE[:-1, 1:], uvE[:-1, :-1]
    v00, vW = vvE[1:, 1:], vvE[1:, :-1]
    vS, vSW = vvE[:-1, 1:], vvE[:-1, :-1]
    dxt, dyt = gR["dxt"], gR["dyt"]
    cxp, cyp, cxm, cym = gR["cxp"], gR["cyp"], gR["cxm"], gR["cym"]

    divune = cyp * u00 - dyt * uW + cxp * v00 - dxt * vS
    divunw = cym * uW + dyt * u00 + cxp * vW - dxt * vSW
    divusw = cym * uSW + dyt * uS + cxm * vSW + dxt * vW
    divuse = cyp * uS - dyt * uSW + cxm * vS + dxt * v00

    tensionne = -cym * u00 - dyt * uW + cxm * v00 + dxt * vS
    tensionnw = -cyp * uW + dyt * u00 + cxm * vW + dxt * vSW
    tensionsw = -cyp * uSW + dyt * uS + cxp * vSW - dxt * vW
    tensionse = -cym * uS - dyt * uSW + cxp * vS - dxt * v00

    shearne = -cym * v00 - dyt * vW - cxm * u00 - dxt * uS
    shearnw = -cyp * vW + dyt * v00 - cxm * uW - dxt * uSW
    shearsw = -cyp * vSW + dyt * vS - cxp * uSW + dxt * uW
    shearse = -cym * vS - dyt * vSW - cxp * uS + dxt * u00

    return ((divune, divunw, divusw, divuse),
            (tensionne, tensionnw, tensionsw, tensionse),
            (shearne, shearnw, shearsw, shearse))


def stress_divergence(comps, dxt, dyt, dxhy, dyhx, maskR):
    """Stress-divergence combinations str1..str8 for the momentum equation
    (ice_dyn_evp.F90:722-849; identical block in ice_dyn_eap.F90:1369-1465).
    comps: 12 region arrays [sp1..4, sm1..4, s12_1..4]."""
    sp1, sp2, sp3, sp4, sm1, sm2, sm3, sm4, s121, s122, s123, s124 = comps
    m = maskR
    z = jnp.zeros_like(sp1)

    ssigpn = sp1 + sp2
    ssigps = sp3 + sp4
    ssigpe = sp1 + sp4
    ssigpw = sp2 + sp3
    ssigp1 = (sp1 + sp3) * P055
    ssigp2 = (sp2 + sp4) * P055

    ssigmn = sm1 + sm2
    ssigms = sm3 + sm4
    ssigme = sm1 + sm4
    ssigmw = sm2 + sm3
    ssigm1 = (sm1 + sm3) * P055
    ssigm2 = (sm2 + sm4) * P055

    ssig12n = s121 + s122
    ssig12s = s123 + s124
    ssig12e = s121 + s124
    ssig12w = s122 + s123
    ssig121 = (s121 + s123) * P111
    ssig122 = (s122 + s124) * P111

    csigpne = P111 * sp1 + ssigp2 + P027 * sp3
    csigpnw = P111 * sp2 + ssigp1 + P027 * sp4
    csigpsw = P111 * sp3 + ssigp2 + P027 * sp1
    csigpse = P111 * sp4 + ssigp1 + P027 * sp2

    csigmne = P111 * sm1 + ssigm2 + P027 * sm3
    csigmnw = P111 * sm2 + ssigm1 + P027 * sm4
    csigmsw = P111 * sm3 + ssigm2 + P027 * sm1
    csigmse = P111 * sm4 + ssigm1 + P027 * sm2

    csig12ne = P222 * s121 + ssig122 + P055 * s123
    csig12nw = P222 * s122 + ssig121 + P055 * s124
    csig12sw = P222 * s123 + ssig122 + P055 * s121
    csig12se = P222 * s124 + ssig121 + P055 * s122

    str12ew = P5 * dxt * (P333 * ssig12e + P166 * ssig12w)
    str12we = P5 * dxt * (P333 * ssig12w + P166 * ssig12e)
    str12ns = P5 * dyt * (P333 * ssig12n + P166 * ssig12s)
    str12sn = P5 * dyt * (P333 * ssig12s + P166 * ssig12n)

    strp_n = P25 * dyt * (P333 * ssigpn + P166 * ssigps)
    strm_n = P25 * dyt * (P333 * ssigmn + P166 * ssigms)
    str1 = -strp_n - strm_n - str12ew + dxhy * (-csigpne + csigmne) \
        + dyhx * csig12ne
    str2 = strp_n + strm_n - str12we + dxhy * (-csigpnw + csigmnw) \
        + dyhx * csig12nw

    strp_s = P25 * dyt * (P333 * ssigps + P166 * ssigpn)
    strm_s = P25 * dyt * (P333 * ssigms + P166 * ssigmn)
    str3 = -strp_s - strm_s + str12ew + dxhy * (-csigpse + csigmse) \
        + dyhx * csig12se
    str4 = strp_s + strm_s + str12we + dxhy * (-csigpsw + csigmsw) \
        + dyhx * csig12sw

    strp_e = P25 * dxt * (P333 * ssigpe + P166 * ssigpw)
    strm_e = P25 * dxt * (P333 * ssigme + P166 * ssigmw)
    str5 = -strp_e + strm_e - str12ns - dyhx * (csigpne + csigmne) \
        + dxhy * csig12ne
    str6 = strp_e - strm_e - str12sn - dyhx * (csigpse + csigmse) \
        + dxhy * csig12se

    strp_w = P25 * dxt * (P333 * ssigpw + P166 * ssigpe)
    strm_w = P25 * dxt * (P333 * ssigmw + P166 * ssigme)
    str7 = -strp_w + strm_w + str12ns - dyhx * (csigpnw + csigmnw) \
        + dxhy * csig12nw
    str8c = strp_w - strm_w + str12sn - dyhx * (csigpsw + csigmsw) \
        + dxhy * csig12sw

    return jnp.stack([jnp.where(m, s, z) for s in
                      (str1, str2, str3, str4, str5, str6, str7, str8c)])


class EVPResult(NamedTuple):
    uvel: jnp.ndarray
    vvel: jnp.ndarray
    stressp: jnp.ndarray
    stressm: jnp.ndarray
    stress12: jnp.ndarray
    iceumask: jnp.ndarray
    strocnx: jnp.ndarray
    strocny: jnp.ndarray
    strocnxT: jnp.ndarray   # on T grid, for thermo/coupling
    strocnyT: jnp.ndarray
    strairx: jnp.ndarray
    strairy: jnp.ndarray
    strintx: jnp.ndarray
    strinty: jnp.ndarray
    strtltx: jnp.ndarray
    strtlty: jnp.ndarray
    divu: jnp.ndarray
    shear: jnp.ndarray
    rdg_conv: jnp.ndarray
    rdg_shear: jnp.ndarray
    prs_sig: jnp.ndarray
    fm: jnp.ndarray   # mass-weighted Coriolis fcor*umass (kg/m^2/s), for
    # the strcorx/strcory history diagnostics (fm*vvel / -fm*uvel,
    # ice_history.F90:1473-1478)


def _region(field_2d, topo, loc=FieldLoc.CENTER, kind=FieldType.SCALAR):
    """(ny, nx) -> (ny+1, nx+1) region incl. N/E ghost row/col."""
    return extend(field_2d, topo, loc=loc, kind=kind)[..., 1:, 1:]


# one-sided metric coefficients map onto their PARTNERS under the
# 180-degree tripole fold: ghost cyp = -cym(image) etc. (definitions
# ice_grid.F90:356-367; validated by tests/test_tripole_oracle.py's
# doubled-domain equivalence)
_METRIC_FOLD = {"cxp": ("cxm", -1.0), "cxm": ("cxp", -1.0),
                "cyp": ("cym", -1.0), "cym": ("cyp", -1.0),
                "dxhy": ("dxhy", -1.0), "dyhx": ("dyhx", -1.0)}


def _region_metrics(grid, topo, names):
    """Ghost-extended metric dict with fold-correct partner ghosts."""
    out = {}
    tri = topo.ns in ("tripole", "tripoleT")
    for k in names:
        f = getattr(grid, k)
        if tri and k in _METRIC_FOLD:
            pname, s = _METRIC_FOLD[k]
            out[k] = extend(f, topo, fold_partner=getattr(grid, pname),
                            fold_sign=s)[..., 1:, 1:]
        else:
            out[k] = _region(f, topo)
    return out


# tripole fold swaps the stress corner partners NE<->SW, NW<->SE for each
# of (stressp, stressm, stress12) (ice_dyn_evp.F90:416-481
# ice_HaloUpdate_stress pairs)
_TRIPOLE_STRESS_PERM = (2, 3, 0, 1, 6, 7, 4, 5, 10, 11, 8, 9)


def _extend_stress(stress0, topo):
    """Seed the (12, ny+1, nx+1)-region ghost ring for the stress state;
    on tripole grids the north ghost row holds the folded PARTNER corner
    component (ice_HaloUpdate_stress, mpi/ice_boundary.F90:5564)."""
    E1 = extend(stress0, topo)
    if topo.ns != "tripole":
        return E1[:, 1:, 1:]
    import jax.lax as lax
    E2 = extend(stress0[jnp.asarray(_TRIPOLE_STRESS_PERM)], topo)
    north = E2[:, -1:, :]
    if topo.axis_y is not None:
        is_top = (lax.axis_index(topo.axis_y)
                  == lax.axis_size(topo.axis_y) - 1)
        north = jnp.where(is_top, north, E1[:, -1:, :])
    return jnp.concatenate([E1[:, :-1, :], north], axis=1)[:, 1:, 1:]


def subcycle_sweep(p: dyn.EVPParams, ndte: int, topo: Topology, *, uvel,
                   vvel, stressR, maskR, strengthR, gR, icem_u, aiu, uocn,
                   vocn, waterx, watery, forcex, forcey, umassdti, fm,
                   uarear, uvel_init, vvel_init, Cw):
    """The ndte-iteration EVP stress/momentum subcycling
    (ice_dyn_evp.F90:336-410) as a pure function of the prepared fields.

    Shared by the XLA fori_loop path and the VMEM-resident Pallas kernel
    (ops/pallas/evp_resident.py), which runs this exact function on
    VMEM-held arrays. Returns (u, v, stressR, diags) where diags =
    (divuR, shearR, rdg_convR, rdg_shearR, prs_sigR, strintx, strinty).
    """
    def body(k, carry):
        u, v, stress, _ = carry
        uvE = extend(jnp.stack([u, v]), topo, loc=FieldLoc.NECORNER,
                     kind=FieldType.VECTOR)
        r = stress_kernel(p, uvE[0], uvE[1], stress, maskR=maskR,
                          strengthR=strengthR, gR=gR)
        s = dyn.stepu(p, icemask=icem_u, aiu=aiu, strE=r.str8, uocn=uocn,
                      vocn=vocn, waterx=waterx, watery=watery,
                      forcex=forcex, forcey=forcey, umassdti=umassdti,
                      fm=fm, uarear=uarear, uvel_init=uvel_init,
                      vvel_init=vvel_init, uvel=u, vvel=v, Cw=Cw)
        return (s.uvel, s.vvel, r.stress,
                (r.divu, r.shear, r.rdg_conv, r.rdg_shear, r.prs_sig,
                 s.strintx, s.strinty))
    zR = jnp.zeros(maskR.shape, uvel.dtype)
    z2 = jnp.zeros_like(uvel)
    init = (uvel, vvel, stressR, (zR, zR, zR, zR, zR, z2, z2))
    return jax.lax.fori_loop(0, ndte, body, init)


def evp(dt, p: dyn.EVPParams, grid, topo: Topology, *, aice, vice, vsno,
        strength, strairxT, strairyT, uocn, vocn, uvel, vvel,
        stressp, stressm, stress12, iceumask,
        ss_tltx=None, ss_tlty=None, Cw=ct.dragio,
        resident: bool = False) -> EVPResult:
    """EVP dynamics driver (ice_dyn_evp.F90:68-517 evp).

    stressp/stressm/stress12: (4, ny, nx) from State. strength: T-grid ice
    strength (precomputed; ice_mechred.F90 ice_strength). uocn/vocn on the
    U grid. Returns updated velocity/stress state + coupling stresses.
    """
    ny, nx = aice.shape

    # --- prep1: masses + masks ---
    tmass, icetmask = dyn.icet_mask(aice, vice, vsno, grid.tmask, topo)
    maskR = _region(icetmask.astype(aice.dtype), topo) > 0.5

    # --- T -> U interpolation ---
    aiu = dyn.to_ugrid(aice, grid, topo)
    umass = dyn.to_ugrid(tmass, grid, topo)
    strairx = dyn.to_ugrid(strairxT, grid, topo,
                           kind=FieldType.VECTOR)
    strairy = dyn.to_ugrid(strairyT, grid, topo,
                           kind=FieldType.VECTOR)

    # --- prep2 ---
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
        strtltx = -fm * vocn          # geostrophic tilt (uncoupled default)
        strtlty = fm * uocn
    else:
        strtltx = -ct.gravit * umass * ss_tltx
        strtlty = -ct.gravit * umass * ss_tlty
    forcex = jnp.where(icem_u, strairx + strtltx, 0.0)
    forcey = jnp.where(icem_u, strairy + strtlty, 0.0)

    # --- region metric arrays (ghosts valid via halo exchange, once) ---
    gR = _region_metrics(grid, topo, ("dxt", "dyt", "dxhy", "dyhx", "cxp",
                                      "cyp", "cxm", "cym", "tarear",
                                      "tinyarea"))
    strengthR = _region(strength, topo)

    # --- stress state on the region grid; ghost ring seeded by exchange ---
    stress0 = jnp.concatenate([stressp, stressm, stress12], axis=0)
    stressR = _extend_stress(stress0, topo)
    stressR = jnp.where(maskR[None], stressR, 0.0)

    # --- subcycling loop (ice_dyn_evp.F90:336-410) ---
    sweep_kw = dict(uvel=uvel, vvel=vvel, stressR=stressR, maskR=maskR,
                    strengthR=strengthR, gR=gR, icem_u=icem_u, aiu=aiu,
                    uocn=uocn, vocn=vocn, waterx=waterx, watery=watery,
                    forcex=forcex, forcey=forcey, umassdti=umassdti,
                    fm=fm, uarear=grid.uarear, uvel_init=uvel_init,
                    vvel_init=vvel_init, Cw=Cw)
    if resident:
        from cice5_tpu.ops.pallas.evp_resident import sweep_resident
        u, v, stressR, diags = sweep_resident(p, p.ndte, topo, **sweep_kw)
    else:
        u, v, stressR, diags = subcycle_sweep(p, p.ndte, topo, **sweep_kw)
    divuR, shearR, rconvR, rshearR, prsR, strintx, strinty = diags

    strocnx, strocny, sTx_u, sTy_u = dyn.evp_finish(
        p, icemask=icem_u, uvel=u, vvel=v, uocn=uocn, vocn=vocn, aiu=aiu,
        fm=fm, Cw=Cw)
    strocnxT = dyn.to_tgrid(sTx_u, grid, topo)
    strocnyT = dyn.to_tgrid(sTy_u, grid, topo)

    crop = lambda a: a[..., :ny, :nx]
    return EVPResult(
        uvel=u, vvel=v,
        stressp=crop(stressR[0:4]), stressm=crop(stressR[4:8]),
        stress12=crop(stressR[8:12]),
        iceumask=icem_u.astype(aice.dtype),
        strocnx=strocnx, strocny=strocny,
        strocnxT=strocnxT, strocnyT=strocnyT,
        strairx=strairx, strairy=strairy,
        strintx=strintx, strinty=strinty,
        strtltx=strtltx, strtlty=strtlty,
        divu=crop(divuR), shear=crop(shearR), rdg_conv=crop(rconvR),
        rdg_shear=crop(rshearR), prs_sig=crop(prsR), fm=fm)


def evp_chunked(dt, p: dyn.EVPParams, grid, topo: Topology, *, aice, vice,
                vsno, strength, strairxT, strairyT, uocn, vocn, uvel, vvel,
                stressp, stressm, stress12, iceumask, ss_tltx=None,
                ss_tlty=None, Cw=ct.dragio, K: int = 10) -> EVPResult:
    """Comm/compute-overlapped EVP: K subcycles per halo exchange.

    The reference's scaling killer is one (u,v) halo exchange per subcycle
    (ndte=120 latency-bound exchanges per dynamics step,
    ice_dyn_evp.F90:336-410; CMHB-2014 Fig. 3). Here a K-ring margin of
    (u, v, 12 stress components) is exchanged ONCE per K subcycles
    (`extend_wide`, one ppermute pair per mesh axis), the margin is
    recomputed redundantly, and validity decays one ring per subcycle —
    interior results are identical to the per-subcycle-exchange loop (the
    margin-decay light cone never reaches the interior). Exchange count:
    ndte/K instead of ndte.

    Tripole (U-fold) north seams are supported: the W-deep margin above
    the fold is filled with the fold image — velocities as NECORNER
    vectors, stress through the corner-partner permutation, one-sided
    metric coefficients through their partners — and then evolves
    mirror-equivalently (the kernel is fold-equivariant; validated
    against the doubled-domain oracle, tests/test_tripole_oracle.py).
    Requires ndte % K == 0 and K <= local shard extent.
    """
    if topo.ns == "tripoleT":
        raise NotImplementedError("evp_chunked: T-fold grids; use evp()")
    if p.ndte % K != 0:
        raise ValueError(f"ndte={p.ndte} not divisible by K={K}")
    from cice5_tpu.parallel import extend_wide, extend_wide_groups
    ny, nx = aice.shape
    W = K
    nchunks = p.ndte // K

    # --- prep identical to evp() on the local domain ---
    tmass, icetmask = dyn.icet_mask(aice, vice, vsno, grid.tmask, topo)
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

    # --- static fields extended once per call (one wide exchange),
    # grouped by tripole fold treatment: T-centered scalars + partner
    # metrics / U-point scalars / U-point vectors ---
    dtype = aice.dtype
    g = grid
    centerA = [g.dxt, g.dyt, g.tarear, g.tinyarea, strength,
               icetmask.astype(dtype)]
    centerM = [g.dxhy, g.dyhx, g.cxp, g.cyp, g.cxm, g.cym]
    centerM_partner = [-g.dxhy, -g.dyhx, -g.cxm, -g.cym, -g.cxp, -g.cyp]
    uscal = [umassdti, fm, g.uarear, icem_u.astype(dtype), aiu]
    uvec = [uocn, vocn, waterx, watery, forcex, forcey, uvel, vvel]
    statics = jnp.stack(centerA + centerM + uscal + uvec)
    nC, nM, nS = len(centerA), len(centerM), len(uscal)
    groups = [
        (slice(0, nC + nM), FieldLoc.CENTER, FieldType.SCALAR,
         jnp.stack(centerA + centerM_partner), 1.0),
        (slice(nC + nM, nC + nM + nS), FieldLoc.NECORNER,
         FieldType.SCALAR, None, 1.0),
        (slice(nC + nM + nS, nC + nM + nS + len(uvec)),
         FieldLoc.NECORNER, FieldType.VECTOR, None, 1.0),
    ]
    SW = extend_wide_groups(statics, topo, W, groups)
    topoI = Topology(ew="open", ns="open")   # inner: no comm, zero rims
    met_names = ("dxt", "dyt", "tarear", "tinyarea", None, None,
                 "dxhy", "dyhx", "cxp", "cyp", "cxm", "cym")
    gRw = {k: extend(SW[i], topoI)[1:, 1:]
           for i, k in enumerate(met_names) if k is not None}
    strengthRw = extend(SW[4], topoI)[1:, 1:]
    maskRw = extend(SW[5], topoI)[1:, 1:] > 0.5
    o = nC + nM
    umassdtiW, fmW, uarearW = SW[o], SW[o + 1], SW[o + 2]
    icem_uW = SW[o + 3] > 0.5
    aiuW = SW[o + 4]
    o += nS
    uocnW, vocnW = SW[o], SW[o + 1]
    waterxW, wateryW = SW[o + 2], SW[o + 3]
    forcexW, forceyW = SW[o + 4], SW[o + 5]
    uvel_initW, vvel_initW = SW[o + 6], SW[o + 7]

    def body_inner(k, carry):
        u, v, stress, _ = carry
        uvE = extend(jnp.stack([u, v]), topoI)
        r = stress_kernel(p, uvE[0], uvE[1], stress, maskR=maskRw,
                          strengthR=strengthRw, gR=gRw)
        s = dyn.stepu(p, icemask=icem_uW, aiu=aiuW, strE=r.str8,
                      uocn=uocnW, vocn=vocnW, waterx=waterxW,
                      watery=wateryW, forcex=forcexW, forcey=forceyW,
                      umassdti=umassdtiW, fm=fmW, uarear=uarearW,
                      uvel_init=uvel_initW, vvel_init=vvel_initW,
                      uvel=u, vvel=v, Cw=Cw)
        return (s.uvel, s.vvel, r.stress,
                (r.divu, r.shear, r.rdg_conv, r.rdg_shear, r.prs_sig,
                 s.strintx, s.strinty))

    zRw = jnp.zeros((ny + 2 * W + 1, nx + 2 * W + 1), dtype)
    z2w = jnp.zeros((ny + 2 * W, nx + 2 * W), dtype)

    tri = topo.ns == "tripole"
    perm = jnp.asarray(_TRIPOLE_STRESS_PERM)

    def chunk_body(c, carry):
        u, v, stress0, _ = carry   # u/v (ny,nx); stress0 (12,ny,nx)
        S = jnp.concatenate([u[None], v[None], stress0])
        if tri:
            SE = extend_wide_groups(S, topo, W, [
                (slice(0, 2), FieldLoc.NECORNER, FieldType.VECTOR,
                 None, 1.0),
                (slice(2, 14), FieldLoc.CENTER, FieldType.SCALAR,
                 stress0[perm], 1.0),
            ])
        else:
            SE = extend_wide(S, topo, W)       # ONE exchange per chunk
        uW_, vW_ = SE[0], SE[1]
        stressRW = extend(SE[2:], topoI)[:, 1:, 1:]
        stressRW = jnp.where(maskRw[None], stressRW, 0.0)
        init = (uW_, vW_, stressRW, (zRw, zRw, zRw, zRw, zRw, z2w, z2w))
        uW2, vW2, stressRW2, diags = jax.lax.fori_loop(
            0, K, body_inner, init)
        cropi = lambda a: a[..., W:W + ny, W:W + nx]
        stress_new = cropi(stressRW2)
        return (cropi(uW2), cropi(vW2), stress_new,
                tuple(cropi(d) for d in diags))

    stress0 = jnp.concatenate([stressp, stressm, stress12], axis=0)
    z2 = jnp.zeros_like(uvel)
    init = (uvel, vvel, stress0, (z2, z2, z2, z2, z2, z2, z2))
    u, v, stress_f, diags = jax.lax.fori_loop(0, nchunks, chunk_body, init)
    divu, shear, rconv, rshear, prs, strintx, strinty = diags

    strocnx, strocny, sTx_u, sTy_u = dyn.evp_finish(
        p, icemask=icem_u, uvel=u, vvel=v, uocn=uocn, vocn=vocn, aiu=aiu,
        fm=fm, Cw=Cw)
    strocnxT = dyn.to_tgrid(sTx_u, grid, topo)
    strocnyT = dyn.to_tgrid(sTy_u, grid, topo)

    return EVPResult(
        uvel=u, vvel=v,
        stressp=stress_f[0:4], stressm=stress_f[4:8],
        stress12=stress_f[8:12],
        iceumask=icem_u.astype(dtype),
        strocnx=strocnx, strocny=strocny,
        strocnxT=strocnxT, strocnyT=strocnyT,
        strairx=strairx, strairy=strairy,
        strintx=strintx, strinty=strinty,
        strtltx=strtltx, strtlty=strtlty,
        divu=divu, shear=shear, rdg_conv=rconv,
        rdg_shear=rshear, prs_sig=prs, fm=fm)
