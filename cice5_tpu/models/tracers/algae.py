"""Skeletal-layer biogeochemistry (reference source/ice_algae.F90).

A single 3-cm porous skeletal layer at the ice bottom carries algal nitrogen
plus optional nutrient and sulfur-cycle tracers (mmol per m^2 of the layer,
i.e. concentration*sk_l). Each step: seed new ice from ocean concentrations,
exchange with the ocean through a growth/melt-dependent piston velocity
(Jin et al. 2006 or constant), run the NPZD-style source/sink chemistry
``algal_dyn`` (ice_algae.F90:458-800), and flux the remainder to the ocean.

All reference per-cell compressed loops become dense masked arithmetic; the
nbtrcr tracer set rides a leading axis with per-tracer flags (PVflag/cling)
as constant vectors from the registry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.models.tracers.brine import PHI_SK, SK_L

# stoichiometry + fractions (ice_zbgc_shared.F90:84-89)
R_C2N = 7.0          # algal C : N (mole/mole)
R_chl2N = 3.0        # chlorophyll : N (mg/mmol)
R_S2N = 0.03         # algal S : N (mole/mole)
R_Si2N = 1.5         # algal Si : N (mole/mole; ice_algae.F90:33)
FR_RESP = 0.05       # respiration fraction

# piston-velocity parameters (ice_algae.F90:292-302)
PVC = 1.0e-6
PV_SCALE_GROWTH = 0.5
PV_SCALE_MELT = 0.05
MJ1, MJ2, MJ3 = 9.667e-9, 38.8, 1.04e7
PV_FRAC_MAX = 0.9

# ocean default concentrations (ice_zbgc.F90:385-390)
OCEAN_BIO_DEFAULT = {"N": 0.15, "NO": 5.0, "C": R_C2N * 0.15,
                     "chl": R_chl2N * 0.15, "NH": 1.0, "Sil": 10.0,
                     "DMSPp": R_S2N * 0.15, "DMSPd": R_S2N * 0.15,
                     "DMS": 0.0}


def default_ocean_bio(tr, shape, dtype=jnp.float32):
    """(nbtrcr, *shape) ocean concentrations in registry nlt order."""
    return jnp.stack([jnp.full(shape, OCEAN_BIO_DEFAULT[n], dtype)
                      for n in tr.bgc_names])


class AlgalDynResult(NamedTuple):
    react: jnp.ndarray    # (nbtrcr, ...) reaction increments (mmol/m^3)
    grow_N: jnp.ndarray   # specific growth rate (1/s)


def algal_dyn(dt, tr, fswthru, conc) -> AlgalDynResult:
    """Algal N / nutrient / sulfur source-sink chemistry
    (ice_algae.F90:458-800 algal_dyn). conc: (nbtrcr, ...) layer
    concentrations * sk_l (mmol/m^2)."""
    # parameters (ice_algae.F90:516-545)
    T_bot = -1.8
    chlabs = 9.0e-4
    mu_max = 1.5
    T_max = -1.8
    op_dep_min = 0.1
    grow_Tdep = 0.0633
    fr_graze = 0.1
    fr_graze_s = 0.5
    fr_graze_a = 0.5
    fr_graze_e = 0.5
    alpha2max = 0.8
    K_Nit, K_Am, K_Sil = 1.0, 1.0, 4.0
    mort_pre = 0.0208
    mort_Tdep = 0.03
    fr_mort2min = 1.0
    max_loss = 0.9
    fr_excrt_2S = 1.0
    y_sk_DMS = 1.0
    t_sk_conv = 10.0
    t_sk_ox = 10.0
    secday = 86400.0

    name2i = {n: i for i, n in enumerate(tr.bgc_names)}
    get = lambda n: (conc[name2i[n]] / SK_L if n in name2i
                     else jnp.zeros_like(fswthru))
    Nin = get("N")
    NOin = get("NO")
    NHin = get("NH")
    Silin = get("Sil")
    DMSPdin = get("DMSPd")
    DMSin = get("DMS")
    chlin = R_chl2N * Nin

    # light limitation through self-shading chlorophyll (:669-689)
    op_dep = chlabs * chlin
    Iavg = jnp.where(op_dep > op_dep_min,
                     fswthru * (1.0 - jnp.exp(-op_dep))
                     / jnp.maximum(op_dep, ct.puny),
                     fswthru)
    L_lim = 1.0 - jnp.exp(-alpha2max * Iavg)

    # nutrient limitation (:695-705)
    Nit_lim = NOin / (NOin + K_Nit)
    Am_lim = (NHin / (NHin + K_Am)) if "NH" in name2i else 0.0
    N_lim = jnp.minimum(1.0, Nit_lim + Am_lim) if "NH" in name2i else Nit_lim
    Sil_lim = Silin / (Silin + K_Sil) if "Sil" in name2i else 1.0

    # growth and uptake (:707-733)
    growmax_N = mu_max / secday \
        * jnp.exp(grow_Tdep * (T_bot - T_max)) * Nin
    grow_N = jnp.minimum(jnp.minimum(L_lim, N_lim), Sil_lim) * growmax_N
    potU_Am = Am_lim * growmax_N
    U_Am = jnp.minimum(grow_N, potU_Am)
    U_Nit = grow_N - U_Am
    U_Sil = R_Si2N * grow_N
    if "Sil" in name2i:
        U_Sil = jnp.minimum(U_Sil, max_loss * Silin / dt)
    U_Nit = jnp.minimum(U_Nit, max_loss * NOin / dt)
    U_Am = jnp.minimum(U_Am, max_loss * NHin / dt)
    grow_N = jnp.minimum(U_Sil / R_Si2N, U_Nit + U_Am)
    if "NH" in name2i:
        fr_Am = jnp.where(grow_N > 0.0,
                          jnp.minimum(U_Am / jnp.maximum(grow_N, ct.puny),
                                      1.0), 0.5)
    else:
        fr_Am = jnp.zeros_like(grow_N)
    fr_Nit = 1.0 - fr_Am
    U_Nit = fr_Nit * grow_N
    U_Am = fr_Am * grow_N
    U_Sil = R_Si2N * grow_N

    resp = FR_RESP * grow_N
    graze = fr_graze * grow_N
    mort = mort_pre * jnp.exp(mort_Tdep * (T_bot - T_max)) * Nin / secday
    nitrif = 0.0

    specific_growth = jnp.where(Nin > 0.0,
                                grow_N / jnp.maximum(Nin, ct.puny), grow_N)

    # source/removal terms (:757-800)
    N_s = grow_N * dt
    N_r_g = graze * dt
    N_r_r = resp * dt
    N_r_mo = mort * dt
    N_r = N_r_g + N_r_r + N_r_mo

    NO_s = nitrif * dt
    NO_r = U_Nit * dt
    NH_s = N_r_r + fr_graze_e * fr_graze_a * N_r_g + fr_mort2min * N_r_mo
    NH_r = U_Am * dt + nitrif * dt
    Sil_r = U_Sil * dt

    DMSPd_s = (fr_graze_s * R_S2N * N_r_g
               + fr_excrt_2S * fr_graze_e * fr_graze_a * R_S2N * N_r_g
               + fr_mort2min * R_S2N * N_r_mo)
    DMSPd_r_c = DMSPdin * dt / (t_sk_conv * secday)
    DMS_s = y_sk_DMS * DMSPd_r_c
    DMS_r = DMSin * dt / (t_sk_ox * secday)

    terms = {"N": N_s - N_r, "NO": NO_s - NO_r, "C": R_C2N * (N_s - N_r),
             "chl": jnp.zeros_like(N_s), "NH": NH_s - NH_r,
             "Sil": -Sil_r, "DMSPp": jnp.zeros_like(N_s),
             "DMSPd": DMSPd_s - DMSPd_r_c, "DMS": DMS_s - DMS_r}
    react = jnp.stack([terms[n] for n in tr.bgc_names])
    return AlgalDynResult(react=react, grow_N=specific_growth)


class SklBgcResult(NamedTuple):
    conc: jnp.ndarray       # (nbtrcr, ...) updated layer concentrations
    flux_bio: jnp.ndarray   # (nbtrcr, ...) flux to ocean (mmol/m^2/s)
    grow_N: jnp.ndarray     # specific growth rate (1/s)


def skl_biogeochemistry(dt, tr, *, conc, ocean_bio, aicen, meltb, congel,
                        fswthru, first_ice,
                        flux_type: str = "Jin2006") -> SklBgcResult:
    """Skeletal-layer BGC update (ice_algae.F90:196-455
    skl_biogeochemistry). conc: (nbtrcr, ...) tracers; ocean_bio:
    (nbtrcr, ...) ocean concentrations; first_ice: 1.0 seeds from ocean."""
    nb = tr.nbtrcr
    dtype = conc.dtype
    active = (aicen > ct.puny)[None]
    rphi = 1.0 / PHI_SK
    name2i = {n: i for i, n in enumerate(tr.bgc_names)}
    iN = name2i["N"]

    # seed newly formed ice from the ocean (:305-335)
    conc = jnp.where(active & (first_ice > 0.5)[None],
                     ocean_bio * SK_L * rphi, conc)
    conc = jnp.where(active, conc, 0.0)

    # piston velocity (:356-408)
    ice_growth = (congel - meltb) / dt
    if flux_type == "Jin2006":
        pv_grow = -jnp.minimum(
            jnp.abs(PV_SCALE_GROWTH
                    * (MJ1 + MJ2 * ice_growth - MJ3 * ice_growth ** 2)),
            PV_FRAC_MAX * SK_L / dt)
        pv_melt = jnp.minimum(
            jnp.abs(PV_SCALE_MELT
                    * (MJ2 * ice_growth - MJ3 * ice_growth ** 2)),
            PV_FRAC_MAX * SK_L / dt)
        PVt = jnp.where(ice_growth > 0.0, pv_grow, pv_melt)
        f_meltn = jnp.where(ice_growth < 0.0,
                            PVt * conc[iN] / SK_L, 0.0)
        congel_alg = jnp.where(
            (ice_growth > 0.0)
            & (conc[iN] < ocean_bio[iN] * SK_L / PHI_SK),
            (ocean_bio[iN] * SK_L / PHI_SK - conc[iN]) / dt, 0.0)
    else:   # constant
        PVt = jnp.where(ice_growth > 0.0, -PVC, 0.0)
        congel_alg = jnp.where(
            (ice_growth >= 0.0)
            & (conc[iN] / SK_L < ocean_bio[iN] / PHI_SK),
            (ocean_bio[iN] * SK_L / PHI_SK - conc[iN]) / dt, 0.0)
        f_meltn = jnp.where(ice_growth < 0.0,
                            jnp.minimum(1.0, meltb / SK_L) * conc[iN] / dt,
                            0.0)

    # chemistry
    dyn = algal_dyn(dt, tr, fswthru, conc)

    # combine boundary fluxes (:410-440)
    shape1 = (nb,) + (1,) * (conc.ndim - 1)
    pvflag = jnp.asarray(tr.bgc_type, dtype).reshape(shape1)
    cling = jnp.asarray([1.0 if n == "N" else 0.0 for n in tr.bgc_names],
                        dtype).reshape(shape1)
    pvsgn = jnp.sign(PVt)[None] * pvflag
    cinit_tmp = jnp.maximum(0.0, conc + dyn.react * SK_L)
    flux = (pvsgn * PVt[None] * cinit_tmp / SK_L
            - pvsgn * jnp.minimum(0.0, PVt)[None] * ocean_bio) \
        + f_meltn[None] * cling \
        - jnp.where(jnp.arange(nb).reshape(shape1) == iN,
                    congel_alg[None], 0.0)
    flux = jnp.where(cinit_tmp < flux * dt,
                     cinit_tmp / dt * (1.0 - ct.puny), flux)
    conc_new = cinit_tmp - flux * dt
    flux_bio = jnp.where(active, flux * PHI_SK, 0.0)

    # derived tracers track algal N (:445-452)
    if "C" in name2i:
        conc_new = conc_new.at[name2i["C"]].set(conc_new[iN] * R_C2N)
    if "chl" in name2i:
        conc_new = conc_new.at[name2i["chl"]].set(conc_new[iN] * R_chl2N)
    conc_new = jnp.where(active, conc_new, conc)
    return SklBgcResult(conc=conc_new, flux_bio=flux_bio,
                        grow_N=jnp.where(active[0], dyn.grow_N, 0.0))
