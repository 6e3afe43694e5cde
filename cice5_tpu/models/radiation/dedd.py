"""Delta-Eddington multiple-scattering shortwave radiation.

TPU-native re-expression of the Briegleb & Light delta-Eddington solver in
/root/reference/source/ice_shortwave.F90: run_dEdd (:1251),
shortwave_dEdd (:1607), compute_dEdd (:2034, layer IOP setup incl. snow
grain-radius tables and R_ice/R_pnd/R_snw tuning), solution_dEdd (:3270,
inhomogeneous-layer adding method with Fresnel refraction layer),
shortwave_dEdd_set_snow (:3782) / set_pond (:3893), and compute_coszen
(ice_orbital.F90:63).

Dense re-design: the reference loops compressed cell lists per surface type
(bare/snow/pond) with inner spectral and per-layer loops. Here all three
surface types are computed for ALL cells as three dense passes, weighted by
their fractional areas; the 3 spectral bands and the adding recursion over
the klev+1 radiation layers are static unrolls; the 32-entry snow IOP tables
become jnp.interp lookups. Transparent layers fall out of the same formulas
(R=0, T=1), so no control flow survives into XLA.

The klev = nslyr + nilyr + 1 radiation layers follow the reference exactly:
[snow SSL, rest of snow layers | pond layers] + [ice SSL, DL, interior].
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct

NSPINT = 3
HS_SSL = 0.040       # snow surface scattering layer thickness (m)
HI_SSL = 0.050       # ice SSL thickness (m)
HPMIN = 0.005        # minimum allowed melt pond depth (m)
HP0 = 0.200          # pond depth below which transition to bare ice
TRMIN = 0.001
EXP_MIN = math.exp(-10.0)
REFINDX = 1.310
CP063, CP455 = 0.063, 0.455

# snow grain radius table (ice_shortwave.F90 rsnw_tab etc.)
RSNW_TAB = np.array([5, 7, 10, 15, 20, 30, 40, 50, 65, 80, 100, 120, 140,
                     170, 200, 240, 290, 350, 420, 500, 570, 660, 760, 870,
                     1000, 1100, 1250, 1400, 1600, 1800, 2000, 2500],
                    np.float64)
QS_TAB = np.array([
    [2.131798, 2.187756, 2.267358], [2.104499, 2.148345, 2.236078],
    [2.081580, 2.116885, 2.175067], [2.062595, 2.088937, 2.130242],
    [2.051403, 2.072422, 2.106610], [2.039223, 2.055389, 2.080586],
    [2.032383, 2.045751, 2.066394], [2.027920, 2.039388, 2.057224],
    [2.023444, 2.033137, 2.048055], [2.020412, 2.028840, 2.041874],
    [2.017608, 2.024863, 2.036046], [2.015592, 2.022021, 2.031954],
    [2.014083, 2.019887, 2.028853], [2.012368, 2.017471, 2.025353],
    [2.011092, 2.015675, 2.022759], [2.009837, 2.013897, 2.020168],
    [2.008668, 2.012252, 2.017781], [2.007627, 2.010813, 2.015678],
    [2.006764, 2.009577, 2.013880], [2.006037, 2.008520, 2.012382],
    [2.005528, 2.007807, 2.011307], [2.005025, 2.007079, 2.010280],
    [2.004562, 2.006440, 2.009333], [2.004155, 2.005898, 2.008523],
    [2.003794, 2.005379, 2.007795], [2.003555, 2.005041, 2.007329],
    [2.003264, 2.004624, 2.006729], [2.003037, 2.004291, 2.006230],
    [2.002776, 2.003929, 2.005700], [2.002590, 2.003627, 2.005276],
    [2.002395, 2.003391, 2.004904], [2.002071, 2.002922, 2.004241]])
WS_TAB = np.array([
    [0.9999994, 0.9999673, 0.9954589], [0.9999992, 0.9999547, 0.9938576],
    [0.9999990, 0.9999382, 0.9917989], [0.9999985, 0.9999123, 0.9889724],
    [0.9999979, 0.9998844, 0.9866190], [0.9999970, 0.9998317, 0.9823021],
    [0.9999960, 0.9997800, 0.9785269], [0.9999951, 0.9997288, 0.9751601],
    [0.9999936, 0.9996531, 0.9706974], [0.9999922, 0.9995783, 0.9667577],
    [0.9999903, 0.9994798, 0.9621007], [0.9999885, 0.9993825, 0.9579541],
    [0.9999866, 0.9992862, 0.9541924], [0.9999838, 0.9991434, 0.9490959],
    [0.9999810, 0.9990025, 0.9444940], [0.9999772, 0.9988171, 0.9389141],
    [0.9999726, 0.9985890, 0.9325819], [0.9999670, 0.9983199, 0.9256405],
    [0.9999605, 0.9980117, 0.9181533], [0.9999530, 0.9976663, 0.9101540],
    [0.9999465, 0.9973693, 0.9035031], [0.9999382, 0.9969939, 0.8953134],
    [0.9999289, 0.9965848, 0.8865789], [0.9999188, 0.9961434, 0.8773350],
    [0.9999068, 0.9956323, 0.8668233], [0.9998975, 0.9952464, 0.8589990],
    [0.9998837, 0.9946782, 0.8476493], [0.9998699, 0.9941218, 0.8367318],
    [0.9998515, 0.9933966, 0.8227881], [0.9998332, 0.9926888, 0.8095131],
    [0.9998148, 0.9919968, 0.7968620], [0.9997691, 0.9903277, 0.7677887]])
GS_TAB = np.array([
    [0.859913, 0.848003, 0.824415], [0.867130, 0.858150, 0.848445],
    [0.873381, 0.867221, 0.861714], [0.878368, 0.874879, 0.874036],
    [0.881462, 0.879661, 0.881299], [0.884361, 0.883903, 0.890184],
    [0.885937, 0.886256, 0.895393], [0.886931, 0.887769, 0.899072],
    [0.887894, 0.889255, 0.903285], [0.888515, 0.890236, 0.906588],
    [0.889073, 0.891127, 0.910152], [0.889452, 0.891750, 0.913100],
    [0.889730, 0.892213, 0.915621], [0.890026, 0.892723, 0.918831],
    [0.890238, 0.893099, 0.921540], [0.890441, 0.893474, 0.924581],
    [0.890618, 0.893816, 0.927701], [0.890762, 0.894123, 0.930737],
    [0.890881, 0.894397, 0.933568], [0.890975, 0.894645, 0.936148],
    [0.891035, 0.894822, 0.937989], [0.891097, 0.895020, 0.939949],
    [0.891147, 0.895212, 0.941727], [0.891189, 0.895399, 0.943339],
    [0.891225, 0.895601, 0.944915], [0.891248, 0.895745, 0.945950],
    [0.891277, 0.895951, 0.947288], [0.891299, 0.896142, 0.948438],
    [0.891323, 0.896388, 0.949762], [0.891340, 0.896623, 0.950916],
    [0.891356, 0.896851, 0.951945], [0.891386, 0.897399, 0.954156]])

# ice/pond IOPs per band (ice_shortwave.F90 *_mn arrays)
KI_SSL_MN = (1000.1, 1003.7, 7042.0)
WI_SSL_MN = (0.9999, 0.9963, 0.9088)
GI_SSL_MN = (0.94, 0.94, 0.94)
KI_DL_MN = (100.2, 107.7, 1309.0)
WI_DL_MN = (0.9980, 0.9287, 0.0305)
GI_DL_MN = (0.94, 0.94, 0.94)
KI_INT_MN = (20.2, 27.7, 1445.0)
WI_INT_MN = (0.9901, 0.7223, 0.0277)
GI_INT_MN = (0.94, 0.94, 0.94)
KI_P_SSL_MN = (70.2, 77.7, 1309.0)
WI_P_SSL_MN = (0.9972, 0.9009, 0.0305)
GI_P_SSL_MN = (0.94, 0.94, 0.94)
KI_P_INT_MN = (20.2, 27.7, 1445.0)
WI_P_INT_MN = (0.9901, 0.7223, 0.0277)
GI_P_INT_MN = (0.94, 0.94, 0.94)
KW = (0.20, 12.0, 729.0)

GAUSPT = (0.9894009, 0.9445750, 0.8656312, 0.7554044,
          0.6178762, 0.4580168, 0.2816036, 0.0950125)
GAUSWT = (0.0271525, 0.0622535, 0.0951585, 0.1246290,
          0.1495960, 0.1691565, 0.1826034, 0.1894506)


def _tune(kmn, wmn, Rtune, fp, fm):
    """Scattering-coefficient tuning (ice_shortwave.F90:2560-2650)."""
    f = fp if Rtune >= 0 else fm
    sigp = max(kmn * wmn * (1.0 + f * Rtune), 0.0)
    k = sigp + kmn * (1.0 - wmn)
    return k, sigp / k


# present-epoch default orbital parameters — a shr_orb_params evaluation
# at the present epoch (csm_share/shr_orb_mod.F90; CESM standard set).
# For a specific model year, evaluate the Berger-1978 secular series with
# radiation/orbital.py shr_orb_params (ShortwaveConfig.iyear_orb wires it)
# and pass the result to shr_orb_decl/compute_coszen.
ORB_ECCEN = 0.016715      # eccentricity
ORB_OBLIQR = 0.409215     # obliquity (radians)
ORB_LAMBM0 = -0.032437    # mean longitude of perihelion at v.e. (rad)
ORB_MVELPP = 4.937458     # moving vernal equinox long. of perihelion + pi

VE_DAY = 80.5             # calendar day of the vernal equinox (shr_orb)


def shr_orb_decl(calday, eccen=ORB_ECCEN, obliqr=ORB_OBLIQR,
                 lambm0=ORB_LAMBM0, mvelpp=ORB_MVELPP):
    """Solar declination + earth-sun distance factor for an elliptical
    orbit (csm_share/shr_orb_mod.F90 shr_orb_decl; ice_orbital.F90 uses
    this through compute_coszen). Returns (declin [rad], eccf = (r0/r)^2).
    """
    lambm = lambm0 + (calday - VE_DAY) * 2.0 * ct.pi / 365.0
    lmm = lambm - mvelpp
    sinl = jnp.sin(lmm)
    lamb = lambm + eccen * (
        2.0 * sinl + eccen * (1.25 * jnp.sin(2.0 * lmm)
                              + eccen * ((13.0 / 12.0) * jnp.sin(3.0 * lmm)
                                         - 0.25 * sinl)))
    invrho = (1.0 + eccen * jnp.cos(lamb - mvelpp)) / (1.0 - eccen ** 2)
    declin = jnp.arcsin(jnp.sin(obliqr) * jnp.sin(lamb))
    return declin, invrho ** 2


def solar_declination(yday, orb=None):
    """Solar declination (radians) from the elliptical-orbit solution.
    orb: optional OrbitalParams (radiation/orbital.py shr_orb_params) for
    a specific year; None uses the present-epoch module constants."""
    if orb is None:
        return shr_orb_decl(yday)[0]
    return shr_orb_decl(yday, eccen=orb.eccen, obliqr=orb.obliqr,
                        lambm0=orb.lambm0, mvelpp=orb.mvelpp)[0]


def compute_coszen(tlat, tlon, yday, sec, orb=None):
    """Cosine solar zenith angle (ice_orbital.F90:63-143 compute_coszen,
    declination from shr_orb_decl)."""
    delta = solar_declination(yday, orb)
    hour_angle = (sec / ct.secday - 0.5) * 2.0 * ct.pi + tlon
    return (jnp.sin(tlat) * jnp.sin(delta)
            + jnp.cos(tlat) * jnp.cos(delta) * jnp.cos(hour_angle))


def _interp_table(x, xp_np, fp_np):
    """Branchless piecewise-linear table lookup.

    jnp.interp lowers to gathers, which are pathologically slow on TPU
    (~50 ms per call at gx1 size); for a small monotone table the exact
    identity y = fp[0] + sum_k (fp[k+1]-fp[k]) * clip((x-xp[k])/dx_k, 0, 1)
    is a short chain of fused elementwise ops instead."""
    import numpy as _np
    xp = _np.asarray(xp_np, _np.float64)
    fp = _np.asarray(fp_np, _np.float64)
    y = jnp.full_like(x, float(fp[0]))
    for k in range(len(xp) - 1):
        dfk = float(fp[k + 1] - fp[k])
        inv = 1.0 / float(xp[k + 1] - xp[k])
        y = y + dfk * jnp.clip((x - float(xp[k])) * inv, 0.0, 1.0)
    return y


def set_snow(aicen, vsnon, Tsfc, *, R_snw, rsnw_mlt, dT_mlt, hs0):
    """Snow fraction/grain radius (shortwave_dEdd_set_snow :3782)."""
    mask = aicen > ct.puny
    hs = jnp.where(mask, vsnon / jnp.maximum(aicen, ct.puny), 0.0)
    fs = jnp.where(hs >= ct.hs_min,
                   jnp.minimum(hs / hs0, 1.0) if hs0 > ct.puny
                   else jnp.ones_like(hs), 0.0)
    dTs = ct.Timelt - Tsfc
    fT = -jnp.minimum(dTs / dT_mlt - 1.0, 0.0)
    # Python float, NOT np scalar: an np.float64 would promote the f32 state
    # under jax_enable_x64 (see CLAUDE.md numerical conventions)
    rsnw_nm = float(np.clip(500.0 - R_snw * 250.0, 100.0, rsnw_mlt))
    rsnw = jnp.clip(rsnw_nm + (rsnw_mlt - rsnw_nm) * fT, 100.0, rsnw_mlt)
    return fs, hs, rsnw


def _dedd_solution(tau, w0, g, coszen, srftyp: int, nslyr: int,
                   albodr, albodf):
    """Adding method over klev+1 layers (solution_dEdd :3270-3580).

    tau/w0/g: (klev+1, *B). Returns (trndir, trntdr, trndif, rupdir,
    rupdif, rdndif) each (klev+2, *B).

    Thin wrapper over the case-batched kernel (single case)."""
    out = _dedd_solution_cases(
        tau[None], w0[None], g[None], coszen,
        kfrsnl_cases=(0 if srftyp == 2 else nslyr + 2,),
        albodr_cases=(albodr,), albodf_cases=(albodf,))
    return tuple(a[:, 0] for a in out)


class LayerProps(NamedTuple):
    """Per-layer direct/diffuse reflection-transmission properties
    (the per-layer block of solution_dEdd :3340-3560)."""
    rdir: jnp.ndarray
    tdir: jnp.ndarray
    rdif_a: jnp.ndarray
    rdif_b: jnp.ndarray
    tdif_a: jnp.ndarray
    tdif_b: jnp.ndarray
    trnlay: jnp.ndarray


def _alpha(w, uu, gg, e):
    return 0.75 * w * uu * ((1.0 + gg * (1.0 - w))
                            / (1.0 - e * e * uu * uu))


def _agamm(w, uu, gg, e):
    return 0.5 * w * ((1.0 + 3.0 * gg * (1.0 - w) * uu * uu)
                      / (1.0 - e * e * uu * uu))


def _layer_props(tau_k, w0_k, g_k, mu0n) -> LayerProps:
    """Delta-scaled single-layer R/T incl. 8-point Gaussian re-integration
    of the diffuse properties (solution_dEdd :3430-3560). This carries the
    exp/Gauss cost — callers deduplicate identical layers before calling."""
    ftot = g_k * g_k
    ts = (1.0 - w0_k * ftot) * tau_k
    ws = (1.0 - ftot) * w0_k / jnp.maximum(1.0 - w0_k * ftot, ct.puny)
    gs = (g_k - ftot) / jnp.maximum(1.0 - ftot, ct.puny)
    ws = jnp.minimum(ws, 1.0 - ct.puny)    # guard el at w=1
    lm = jnp.sqrt(3.0 * (1.0 - ws) * (1.0 - ws * gs))
    ue = 1.5 * (1.0 - ws * gs) / jnp.maximum(lm, ct.puny)
    # guard resonance 1 - lm^2 mu^2 = 0
    safe_mu = lambda m: jnp.where(jnp.abs(1.0 - lm * lm * m * m) < 1e-6,
                                  m * (1.0 + 1e-3), m)
    mu0n_s = safe_mu(mu0n)
    extins = jnp.maximum(EXP_MIN, jnp.exp(-lm * ts))
    ne = ((ue + 1.0) ** 2 / extins) - ((ue - 1.0) ** 2 * extins)
    rdif_a = (ue ** 2 - 1.0) * (1.0 / extins - extins) / ne
    tdif_a = 4.0 * ue / ne
    trnlay = jnp.maximum(EXP_MIN, jnp.exp(-ts / mu0n_s))
    alp = _alpha(ws, mu0n_s, gs, lm)
    gam = _agamm(ws, mu0n_s, gs, lm)
    apg, amg = alp + gam, alp - gam
    rdir = apg * rdif_a + amg * (tdif_a * trnlay - 1.0)
    tdir = apg * tdif_a + (amg * rdif_a - apg + 1.0) * trnlay

    # gaussian re-integration of diffuse R/T (:3530-3560)
    R1, T1 = rdif_a, tdif_a
    swt = smr = smt = 0.0
    for mu_g, gwt in zip(GAUSPT, GAUSWT):
        mu_s = safe_mu(jnp.asarray(mu_g, ts.dtype))
        trn = jnp.maximum(EXP_MIN, jnp.exp(-ts / mu_s))
        alp = _alpha(ws, mu_s, gs, lm)
        gam = _agamm(ws, mu_s, gs, lm)
        apg, amg = alp + gam, alp - gam
        rdr = apg * R1 + amg * T1 * trn - amg
        tdr = apg * T1 + amg * R1 * trn - apg * trn + trn
        swt = swt + mu_g * gwt
        smr = smr + mu_g * gwt * rdr
        smt = smt + mu_g * gwt * tdr
    rdif_a = smr / swt
    tdif_a = smt / swt
    return LayerProps(rdir=rdir, tdir=tdir, rdif_a=rdif_a, rdif_b=rdif_a,
                      tdif_a=tdif_a, tdif_b=tdif_a, trnlay=trnlay)


def _fresnel(p: LayerProps, mu0, mu0n_below) -> LayerProps:
    """Combine the Fresnel refraction interface onto the top of a layer
    (solution_dEdd :3565-3620)."""
    R1f = (mu0 - REFINDX * mu0n_below) / (mu0 + REFINDX * mu0n_below)
    R2f = (REFINDX * mu0 - mu0n_below) / (REFINDX * mu0 + mu0n_below)
    T1f = 2.0 * mu0 / (mu0 + REFINDX * mu0n_below)
    T2f = 2.0 * mu0 / (REFINDX * mu0 + mu0n_below)
    Rf_dir = 0.5 * (R1f * R1f + R2f * R2f)
    Tf_dir = 0.5 * (T1f * T1f + T2f * T2f) * REFINDX * mu0n_below / mu0
    Rf_dif_a, Tf_dif_a = CP063, 1.0 - CP063
    Rf_dif_b, Tf_dif_b = CP455, 1.0 - CP455
    rintfc = 1.0 / (1.0 - Rf_dif_b * p.rdif_a)
    return LayerProps(
        tdir=Tf_dir * p.tdir
        + Tf_dir * p.rdir * Rf_dif_b * rintfc * p.tdif_a,
        rdir=Rf_dir + Tf_dir * p.rdir * rintfc * Tf_dif_b,
        rdif_a=Rf_dif_a + Tf_dif_a * p.rdif_a * rintfc * Tf_dif_b,
        rdif_b=p.rdif_b + p.tdif_b * Rf_dif_b * rintfc * p.tdif_a,
        tdif_a=p.tdif_a * rintfc * Tf_dif_a,
        tdif_b=p.tdif_b * rintfc * Tf_dif_b,
        trnlay=Tf_dir * p.trnlay)


def _adding(props, albodr, albodf, shape_ref):
    """Downward/upward adding combination over the layer stack
    (solution_dEdd :3640-3680) with the TRMIN dark gate.

    props: list of klev+1 LayerProps (entries may be SHARED between k —
    deduplicated layers); shape_ref: a (C, *B) array fixing the case/batch
    shape. Returns 6 lists of length klev+2: (trndir, trntdr, trndif,
    rupdir, rupdif, rdndif)."""
    klev = len(props) - 1
    one = jnp.ones_like(shape_ref)
    zero = jnp.zeros_like(shape_ref)
    trndir, trntdr, trndif, rdndif = [one], [one], [one], [zero]
    masked = []
    for k, p in enumerate(props):
        lit = trntdr[k] > TRMIN
        z = lambda x: jnp.where(lit, x, 0.0)
        p = LayerProps(*[z(x) for x in p])
        masked.append(p)
        trndir.append(trndir[k] * p.trnlay)
        refkm1 = 1.0 / (1.0 - rdndif[k] * p.rdif_a)
        tdrrdir = trndir[k] * p.rdir
        tdndif = trntdr[k] - trndir[k]
        trntdr.append(trndir[k] * p.tdir
                      + (tdndif + tdrrdir * rdndif[k]) * refkm1 * p.tdif_a)
        rdndif.append(p.rdif_b + p.tdif_b * rdndif[k] * refkm1 * p.tdif_a)
        trndif.append(trndif[k] * refkm1 * p.tdif_a)

    rupdir = [None] * (klev + 2)
    rupdif = [None] * (klev + 2)
    rupdir[klev + 1] = albodr * one
    rupdif[klev + 1] = albodf * one
    for k in range(klev, -1, -1):
        p = masked[k]
        refkp1 = 1.0 / (1.0 - p.rdif_b * rupdif[k + 1])
        rupdir[k] = p.rdir + (p.trnlay * rupdir[k + 1]
                              + (p.tdir - p.trnlay) * rupdif[k + 1]) \
            * refkp1 * p.tdif_b
        rupdif[k] = p.rdif_a + p.tdif_a * rupdif[k + 1] * refkp1 * p.tdif_b
    return trndir, trntdr, trndif, rupdir, rupdif, rdndif


def _dedd_solution_cases(tau, w0, g, coszen, *, kfrsnl_cases,
                         albodr_cases, albodf_cases):
    """Case-batched adding method (solution_dEdd :3270-3580).

    TPU re-structuring: the reference solves each (surface type, spectral
    band) column independently — thousands of tiny elementwise ops. Here a
    leading case axis C batches all solutions through ONE op sequence;
    per-case statics (Fresnel layer index, ocean albedo) become constant
    masks. tau/w0/g: (klev+1, C, *B). Returns 6 arrays (klev+2, C, *B).

    (Generic path; shortwave_dEdd uses the deduplicated-layer fast path.)
    """
    klev = tau.shape[0] - 1
    C = tau.shape[1]
    nb = tau.ndim - 2
    cshape = (C,) + (1,) * nb
    mu0_flat = jnp.maximum(coszen, 0.01)
    mu0 = jnp.broadcast_to(mu0_flat, tau.shape[1:])
    mu0n_below = jnp.sqrt(1.0 - (1.0 - mu0 ** 2) / (REFINDX * REFINDX))
    kf = jnp.asarray(kfrsnl_cases, jnp.int32).reshape(cshape)
    albodr = jnp.asarray(albodr_cases, tau.dtype).reshape(cshape)
    albodf = jnp.asarray(albodf_cases, tau.dtype).reshape(cshape)

    props = []
    for k in range(klev + 1):
        mu0n = jnp.where(k >= kf, mu0n_below, mu0)
        p = _layer_props(tau[k], w0[k], g[k], mu0n)
        pf = _fresnel(p, mu0, mu0n_below)
        is_f = (k == kf)
        props.append(LayerProps(*[jnp.where(is_f, a, b)
                                  for a, b in zip(pf, p)]))

    out = _adding(props, albodr, albodf, mu0)
    return tuple(jnp.stack(lst) for lst in out)


class DEddFluxes(NamedTuple):
    avdr: jnp.ndarray
    avdf: jnp.ndarray
    aidr: jnp.ndarray
    aidf: jnp.ndarray
    fsfc: jnp.ndarray
    fint: jnp.ndarray
    fthru: jnp.ndarray
    Sabs: jnp.ndarray     # (nslyr, *B)
    Iabs: jnp.ndarray     # (nilyr, *B)
    fthrul: jnp.ndarray   # (nilyr+1, *B) penetrating SW at ice interfaces


def _build_bands(*, nilyr, nslyr, srftyp, fnidr, hs, rsnw, hi, hp,
                 R_ice, R_pnd, kalg, B, dtype):
    """Layer inherent optical properties for all 3 spectral bands of one
    surface type (the dzk/IOP setup of compute_dEdd :2034-2860).
    Returns (tau, w0, g) each (klev+1, NSPINT, *B)."""
    klev = nslyr + nilyr + 1
    kii = nslyr + 1

    # tuned ice/pond IOPs (python scalars per band)
    iops = []
    for ns in range(NSPINT):
        k_ssl, w_ssl = _tune(KI_SSL_MN[ns], WI_SSL_MN[ns], R_ice, 0.15, 0.15)
        k_dl, w_dl = _tune(KI_DL_MN[ns], WI_DL_MN[ns], R_ice, 0.15, 0.15)
        k_int, w_int = _tune(KI_INT_MN[ns], WI_INT_MN[ns], R_ice, 0.15, 0.15)
        k_pssl, w_pssl = _tune(KI_P_SSL_MN[ns], WI_P_SSL_MN[ns], R_pnd,
                               2.0, 0.5)
        k_pint, w_pint = _tune(KI_P_INT_MN[ns], WI_P_INT_MN[ns], R_pnd,
                               2.0, 0.5)
        iops.append(dict(k_ssl=k_ssl, w_ssl=w_ssl, g_ssl=GI_SSL_MN[ns],
                         k_dl=k_dl, w_dl=w_dl, g_dl=GI_DL_MN[ns],
                         k_int=k_int, w_int=w_int, g_int=GI_INT_MN[ns],
                         k_pssl=k_pssl, w_pssl=w_pssl, g_pssl=GI_P_SSL_MN[ns],
                         k_pint=k_pint, w_pint=w_pint, g_pint=GI_P_INT_MN[ns]))

    # layer thicknesses dzk (ice part; snow/pond part set per srftyp)
    dz_s = hs / nslyr
    dzk = [None] * (klev + 1)
    dzk[0] = jnp.minimum(HS_SSL, dz_s / 2.0)
    dzk[1] = dz_s - dzk[0]
    for k in range(2, nslyr + 1):
        dzk[k] = dz_s
    dz_i = hi / nilyr
    dz_ssl = jnp.minimum(jnp.minimum(HI_SSL, hi / 30.0), dz_i / 2.0)
    dzk[kii] = dz_ssl
    dzk[kii + 1] = dz_i - dz_ssl
    for k in range(kii + 2, klev + 1):
        dzk[k] = dz_i
    if srftyp == 2:
        dz_p = hp / (nslyr + 1)
        for k in range(0, nslyr + 1):
            dzk[k] = dz_p

    fr_adj = 1.0 * fnidr + 0.8 * (1.0 - fnidr)    # snow grain factor

    # --- build the 3 spectral bands' layer optics, then solve them all in
    # ONE case-batched adding pass (see _dedd_solution_cases) ---
    band_tau, band_w0, band_g = [], [], []
    for ns in range(NSPINT):
        io = iops[ns]
        taus, w0s, gs = [], [], []
        # --- layers above the ice ---
        if srftyp == 0:
            for k in range(0, nslyr + 1):
                taus.append(jnp.zeros(B, dtype))
                w0s.append(jnp.zeros(B, dtype))
                gs.append(jnp.zeros(B, dtype))
        elif srftyp == 1:
            frsnw = fr_adj * rsnw
            Qs = _interp_table(frsnw, RSNW_TAB, QS_TAB[:, ns])
            ws_t = _interp_table(frsnw, RSNW_TAB, WS_TAB[:, ns])
            gs_t = _interp_table(frsnw, RSNW_TAB, GS_TAB[:, ns])
            ks_coef = Qs * ((ct.rhos / 917.0) * 3.0
                            / (4.0 * frsnw * 1.0e-6))
            for k in range(0, nslyr + 1):
                taus.append(ks_coef * dzk[k])
                w0s.append(ws_t)
                gs.append(gs_t)
        else:   # pond water
            for k in range(0, nslyr + 1):
                taus.append(KW[ns] * dzk[k])
                w0s.append(jnp.zeros(B, dtype))
                gs.append(jnp.zeros(B, dtype))

        # --- sea ice layers ---
        if srftyp <= 1:
            taus.append(io["k_ssl"] * dzk[kii])
            w0s.append(jnp.full(B, io["w_ssl"], dtype))
            gs.append(jnp.full(B, io["g_ssl"], dtype))
            fs_dl = 0.25 * nilyr
            taus.append(io["k_dl"] * dzk[kii + 1] * fs_dl)
            w0s.append(jnp.full(B, io["w_dl"], dtype))
            gs.append(jnp.full(B, io["g_dl"], dtype))
            for k in range(kii + 2, klev):
                taus.append(io["k_int"] * dzk[k])
                w0s.append(jnp.full(B, io["w_int"], dtype))
                gs.append(jnp.full(B, io["g_int"], dtype))
            # lowest layer: add algae absorption in visible
            kabs = io["k_int"] * (1.0 - io["w_int"])
            if ns == 0:
                kabs = kabs + kalg * (0.50 / jnp.maximum(dzk[klev], ct.puny))
            sig = io["k_int"] * io["w_int"]
            taus.append((kabs + sig) * dzk[klev])
            w0s.append(sig / (sig + kabs) * jnp.ones(B, dtype)
                       if ns != 0 else sig / (sig + kabs))
            gs.append(jnp.full(B, io["g_int"], dtype))
        else:   # ponded ice, with thin-pond transition (:2800-2860)
            tr = jnp.clip((hp - HPMIN) / max(HP0 - HPMIN, 1e-6), 0.0, 1.0)
            blend = jnp.where((hp >= HPMIN) & (hp <= HP0), hp / HP0, 1.0)
            # SSL
            sig_i = io["k_ssl"] * io["w_ssl"]
            sig_p = io["k_pssl"] * io["w_pssl"]
            sig = sig_i + (sig_p - sig_i) * blend
            kext = sig + io["k_pssl"] * (1.0 - io["w_pssl"])
            taus.append(kext * dzk[kii])
            w0s.append(sig / kext)
            gs.append(jnp.full(B, io["g_pint"], dtype))
            # DL
            fs_dl = 0.25 * nilyr
            sig_i = io["k_dl"] * io["w_dl"] * fs_dl
            sig_p = io["k_pint"] * io["w_pint"]
            sig = sig_i + (sig_p - sig_i) * blend
            kext = sig + io["k_pint"] * (1.0 - io["w_pint"])
            taus.append(kext * dzk[kii + 1])
            w0s.append(sig / kext)
            gs.append(jnp.full(B, io["g_pint"], dtype))
            for k in range(kii + 2, klev + 1):
                sig_i = io["k_int"] * io["w_int"]
                sig_p = io["k_pint"] * io["w_pint"]
                sig = sig_i + (sig_p - sig_i) * blend
                kext = sig + io["k_pint"] * (1.0 - io["w_pint"])
                taus.append(kext * dzk[k])
                w0s.append(sig / kext)
                gs.append(jnp.full(B, io["g_pint"], dtype))

        band_tau.append(jnp.stack([jnp.broadcast_to(t, B) for t in taus]))
        band_w0.append(jnp.stack([jnp.broadcast_to(w, B) for w in w0s]))
        band_g.append(jnp.stack([jnp.broadcast_to(x, B) for x in gs]))

    return (jnp.stack(band_tau, axis=1), jnp.stack(band_w0, axis=1),
            jnp.stack(band_g, axis=1))


def _net_fluxes(trndirA, trntdrA, trndifA, rupdirA, rupdifA, rdndifA):
    """Interface net down fluxes (:2880-2910), batched over cases."""
    refkA = 1.0 / (1.0 - rdndifA * rupdifA)
    dfdirA = (trndirA + (trntdrA - trndirA) * (1.0 - rupdifA) * refkA
              - trndirA * rupdirA * (1.0 - rdndifA) * refkA)
    dfdirA = jnp.where(dfdirA < ct.puny, 0.0, dfdirA)
    dfdifA = trndifA * (1.0 - rupdifA) * refkA
    dfdifA = jnp.where(dfdifA < ct.puny, 0.0, dfdifA)
    return dfdirA, dfdifA


def _net_k(sol, k):
    """Net downward direct/diffuse flux factors at interface k
    (the per-k kernel of :2880-2910), computed lazily from the adding
    lists — avoids materializing (klev+2, C, *B) stacks in HBM."""
    trndir, trntdr, trndif, rupdir, rupdif, rdndif = sol
    refk = 1.0 / (1.0 - rdndif[k] * rupdif[k])
    dfdir = trndir[k] + (trntdr[k] - trndir[k]) * (1.0 - rupdif[k]) * refk \
        - trndir[k] * rupdir[k] * (1.0 - rdndif[k]) * refk
    dfdir = jnp.where(dfdir < ct.puny, 0.0, dfdir)
    dfdif = trndif[k] * (1.0 - rupdif[k]) * refk
    dfdif = jnp.where(dfdif < ct.puny, 0.0, dfdif)
    return dfdir, dfdif


def _partition_sol(*, nilyr, nslyr, srftyp, fnidr, swvdr, swvdf, swidr,
                   swidf, sol, B, dtype) -> DEddFluxes:
    """Flux partition reading the adding-solution LISTS lazily (same math
    as _partition; sol entries are (NSPINT, *B)).

    Every output is an elementwise expression of the band-weighted TOTAL
    net flux at each interface, computed once per k — no sequential
    .at[].add chains (each of which forced a separate fusion that
    rematerialized the adding recurrences; this line was the single
    hottest region of the gx1-parity step profile)."""
    klev = nslyr + nilyr + 1
    ksrf = 1 if srftyp == 1 else nslyr + 2
    wghtns2 = 0.67 + (0.78 - 0.67) * (1.0 - fnidr)
    wghtns3 = 1.0 - wghtns2
    rupdirL, rupdifL = sol[3], sol[4]

    avdr = rupdirL[0][0]
    avdf = rupdifL[0][0]
    aidr = rupdirL[0][1] * wghtns2 + rupdirL[0][2] * wghtns3
    aidf = rupdifL[0][1] * wghtns2 + rupdifL[0][2] * wghtns3

    # net_tot[k]: band-weighted total net downward flux at interface k;
    # net_vs[k]: the visible-band (ns=0) component alone (for fswpenl)
    net_tot = [None] * (klev + 2)
    net_vs = [None] * (klev + 2)
    for k in range(klev + 2):
        dfdir, dfdif = _net_k(sol, k)
        net_vs[k] = dfdir[0] * swvdr + dfdif[0] * swvdf
        nir = (wghtns2 * dfdir[1] + wghtns3 * dfdir[2]) * swidr \
            + (wghtns2 * dfdif[1] + wghtns3 * dfdif[2]) * swidf
        net_tot[k] = net_vs[k] + nir

    fsfc = net_tot[0] - net_tot[ksrf]
    fint = net_tot[ksrf] - net_tot[klev + 1]
    fthru = net_tot[klev + 1]

    if srftyp == 1:
        Sabs = jnp.stack([net_tot[k] - net_tot[k + 1]
                          for k in range(1, nslyr + 1)])
    else:
        Sabs = jnp.zeros((nslyr,) + B, dtype)

    iabs_l = []
    for k in range(nslyr + 2, nslyr + 2 + nilyr):
        km, kp = k, k + 1
        if srftyp == 1 and k == nslyr + 2:
            km, kp = k - 1, k + 1
        iabs_l.append(net_tot[km] - net_tot[kp])
    Iabs = jnp.stack(iabs_l)

    fthrul = jnp.stack([net_vs[k] for k in range(nslyr + 2, klev + 2)])

    return DEddFluxes(avdr=avdr, avdf=avdf, aidr=aidr, aidf=aidf,
                      fsfc=fsfc, fint=fint, fthru=fthru, Sabs=Sabs,
                      Iabs=Iabs, fthrul=fthrul)


def _partition(*, nilyr, nslyr, srftyp, fnidr, swvdr, swvdf, swidr, swidf,
               dfdirA, dfdifA, rupdirA, rupdifA, B, dtype) -> DEddFluxes:
    """Per-band flux partition into surface/internal/penetrating
    absorption (compute_dEdd :2860-3050). dfdirA etc: (klev+2, NSPINT, *B)
    for this surface type."""
    klev = nslyr + nilyr + 1
    ksrf = 1 if srftyp == 1 else nslyr + 2
    wghtns2 = 0.67 + (0.78 - 0.67) * (1.0 - fnidr)
    wghtns3 = 1.0 - wghtns2

    avdr = avdf = aidr = aidf = jnp.zeros(B, dtype)
    fsfc = fint = fthru = jnp.zeros(B, dtype)
    Sabs = jnp.zeros((nslyr,) + B, dtype)
    Iabs = jnp.zeros((nilyr,) + B, dtype)
    fthrul = jnp.zeros((nilyr + 1,) + B, dtype)

    for ns in range(NSPINT):
        dfdir, dfdif = dfdirA[:, ns], dfdifA[:, ns]
        rupdir, rupdif = rupdirA[:, ns], rupdifA[:, ns]

        if ns == 0:
            swdr, swdf, wght = swvdr, swvdf, 1.0
            avdr = rupdir[0]
            avdf = rupdif[0]
        else:
            swdr, swdf = swidr, swidf
            wght = wghtns2 if ns == 1 else wghtns3
            aidr = aidr + rupdir[0] * wght
            aidf = aidf + rupdif[0] * wght

        net = lambda k: dfdir[k] * swdr + dfdif[k] * swdf
        tmp0 = net(0) * wght
        tmpks = net(ksrf) * wght
        tmpkl = net(klev + 1) * wght
        fsfc = fsfc + tmp0 - tmpks
        fint = fint + tmpks - tmpkl
        fthru = fthru + tmpkl

        if srftyp == 1:
            for k in range(1, nslyr + 1):
                Sabs = Sabs.at[k - 1].add((net(k) - net(k + 1)) * wght)
        for k in range(nslyr + 2, nslyr + 2 + nilyr):
            km, kp = k, k + 1
            if srftyp == 1 and k == nslyr + 2:
                km, kp = k - 1, k + 1
            Iabs = Iabs.at[k - nslyr - 2].add((net(km) - net(kp)) * wght)
        if ns == 0:
            for k in range(nslyr + 2, klev + 2):
                fthrul = fthrul.at[k - nslyr - 2].set(net(k))

    return DEddFluxes(avdr=avdr, avdf=avdf, aidr=aidr, aidf=aidf,
                      fsfc=fsfc, fint=fint, fthru=fthru, Sabs=Sabs,
                      Iabs=Iabs, fthrul=fthrul)


def compute_dEdd(*, nilyr, nslyr, srftyp, coszen, fnidr, swvdr, swvdf,
                 swidr, swidf, hs, rsnw, hi, hp, R_ice=0.0, R_pnd=0.0,
                 kalg=0.6) -> DEddFluxes:
    """Layer IOP setup + band-batched solution + flux partition for one
    surface type over all cells (compute_dEdd :2034-3050)."""
    B = coszen.shape
    dtype = coszen.dtype
    tau, w0, g = _build_bands(
        nilyr=nilyr, nslyr=nslyr, srftyp=srftyp, fnidr=fnidr, hs=hs,
        rsnw=rsnw, hi=hi, hp=hp, R_ice=R_ice, R_pnd=R_pnd, kalg=kalg,
        B=B, dtype=dtype)
    kf = 0 if srftyp == 2 else nslyr + 2
    sol = _dedd_solution_cases(
        tau, w0, g, coszen, kfrsnl_cases=(kf,) * NSPINT,
        albodr_cases=(0.01, 0.0, 0.0), albodf_cases=(0.01, 0.0, 0.0))
    dfdirA, dfdifA = _net_fluxes(*sol)
    return _partition(
        nilyr=nilyr, nslyr=nslyr, srftyp=srftyp, fnidr=fnidr,
        swvdr=swvdr, swvdf=swvdf, swidr=swidr, swidf=swidf,
        dfdirA=dfdirA, dfdifA=dfdifA, rupdirA=sol[3], rupdifA=sol[4],
        B=B, dtype=dtype)


class DEddResult(NamedTuple):
    alvdrn: jnp.ndarray
    alvdfn: jnp.ndarray
    alidrn: jnp.ndarray
    alidfn: jnp.ndarray
    fswsfcn: jnp.ndarray
    fswintn: jnp.ndarray
    fswthrun: jnp.ndarray
    Sswabsn: jnp.ndarray
    Iswabsn: jnp.ndarray
    fswpenln: jnp.ndarray
    albicen: jnp.ndarray
    albsnon: jnp.ndarray
    albpndn: jnp.ndarray
    snowfracn: jnp.ndarray   # category snow fraction used in radiation
    # (ice_shortwave.F90:127 snowfracn; f_snowfrac/f_snowfracn history)


def shortwave_dEdd(*, nilyr, nslyr, aicen, vicen, vsnon, Tsfcn, apnd, hpnd,
                   coszen, fnidr, swvdr, swvdf, swidr, swidf,
                   R_ice=0.0, R_pnd=0.0, R_snw=1.5, dT_mlt=1.5,
                   rsnw_mlt=1500.0, kalg=0.6, hs0=0.03, hs1=0.03,
                   pndaspect=0.8, pond_scheme="cesm") -> DEddResult:
    """Full delta-Eddington radiation for ONE category over batch *B
    (shortwave_dEdd :1607 + the pond/snow property setup of run_dEdd).

    apnd: pond fraction of ice area; hpnd: pond depth. Pond-scheme-specific
    radiative pond setup (run_dEdd):
    - "cesm"/default: CESM-style snow infiltration reduces the effective
      pond fraction under snow (:1390-1410, hs0 taper).
    - "lvl": snow-on-pond taper with hs1 and snow saturation of shallow
      ponds (:1478-1510; the dhsn/ffracn memory of the reference is
      approximated by the current snow depth).
    - "topo": fraction/depth pass straight through (:1516-1537 — the lid
      gating happens upstream in the driver).
    """
    mask = aicen > ct.puny
    netsw = swvdr + swvdf + swidr + swidf
    lit = mask & (netsw > ct.puny) & (coszen > ct.puny)
    cz = jnp.maximum(coszen, ct.puny)

    hi = jnp.where(mask, vicen / jnp.maximum(aicen, ct.puny), 0.0)
    fs, hs, rsnw = set_snow(aicen, vsnon, Tsfcn, R_snw=R_snw,
                            rsnw_mlt=rsnw_mlt, dT_mlt=dT_mlt, hs0=hs0)

    # pond fraction/depth with snow infiltration (run_dEdd :1385-1412)
    fp = apnd
    hp = hpnd
    if pond_scheme == "lvl":
        # taper pond area with snow on pond ice (:1483-1487)
        if hs1 > ct.puny:
            asnow = jnp.minimum(hs / hs1, 1.0)
            fp = jnp.where(hs >= ct.puny, (1.0 - asnow) * fp, fp)
        # infiltrate snow / saturate shallow ponds (:1489-1507)
        haspnd = hp > ct.puny
        rp = ct.rhofresh * hp / jnp.maximum(
            ct.rhofresh * hp + ct.rhos * hs, ct.puny)
        hmx = hs * (ct.rhofresh - ct.rhos) / ct.rhofresh
        deep = hp >= hmx                     # pond deeper than saturated snow
        hp_sat = (ct.rhofresh * hp + ct.rhos * hs) / ct.rhofresh
        drown = haspnd & (rp >= 0.15) & deep
        fp = jnp.where(haspnd, jnp.where(drown, fp, 0.0), fp)
        hp = jnp.where(haspnd, jnp.where(drown, hp_sat, 0.0), hp)
        fp = jnp.where(hp < HPMIN, 0.0, fp)
    elif pond_scheme != "topo":
        asnow = jnp.minimum(hs / max(hs0, 1e-6), 1.0)
        infl = (hs >= ct.hs_min)
        fp = jnp.where(infl, (1.0 - asnow) * fp, fp)
        hp = jnp.where(infl, pndaspect * fp, hp)
        fp = jnp.where(hp < HPMIN, 0.0, fp)
    fp = jnp.minimum(fp, 1.0 - fs)
    fi = jnp.maximum(1.0 - fs - fp, 0.0)

    # Deduplicated-layer fast path. The naive formulation solves 9 cases
    # (3 surface types x 3 bands) x (klev+1) layers; most layer properties
    # repeat: bare/snow share ALL ice layers (same IOPs, same Fresnel level
    # kf = nslyr+2), interior ice layers are identical to each other, the
    # pond's sub-ice layers are all identical, and the bare surface's top
    # layers are exactly transparent. Computing each distinct layer ONCE
    # cuts the exp/Gauss property work ~3x; the cheap adding recursion then
    # runs per family over the 3-band case axis with shared LayerProps
    # references (no (9, *B) assembly copies).
    B = cz.shape
    dtype = cz.dtype
    klev = nslyr + nilyr + 1
    kii = nslyr + 1
    build_common = dict(nilyr=nilyr, nslyr=nslyr, fnidr=fnidr,
                        hi=jnp.maximum(hi, ct.puny), hp=hp, rsnw=rsnw,
                        R_ice=R_ice, R_pnd=R_pnd, kalg=kalg,
                        B=B, dtype=dtype)
    hs_cases = (jnp.zeros_like(hs), jnp.maximum(hs, ct.hs_min),
                jnp.zeros_like(hs))
    tau0, w00, g0 = _build_bands(srftyp=0, hs=hs_cases[0], **build_common)
    tau1, w01, g1 = _build_bands(srftyp=1, hs=hs_cases[1], **build_common)
    tau2, w02, g2 = _build_bands(srftyp=2, hs=hs_cases[2], **build_common)

    mu0 = jnp.maximum(cz, 0.01)
    mu0n_below = jnp.sqrt(1.0 - (1.0 - mu0 ** 2) / (REFINDX * REFINDX))

    # ice layers shared by bare/snow (above-Fresnel SSL, Fresnel DL,
    # identical interiors, algae bottom; cf. _build_bands srftyp<=1)
    pIceSSL = _layer_props(tau0[kii], w00[kii], g0[kii], mu0)
    pIceDL = _fresnel(_layer_props(tau0[kii + 1], w00[kii + 1],
                                   g0[kii + 1], mu0n_below),
                      mu0, mu0n_below)
    n_int = klev - kii - 2                       # kii+2 .. klev-1
    ice_props = [pIceSSL, pIceDL]
    if n_int > 0:
        pIceInt = _layer_props(tau0[kii + 2], w00[kii + 2], g0[kii + 2],
                               mu0n_below)
        ice_props += [pIceInt] * n_int
    ice_props.append(_layer_props(tau0[klev], w00[klev], g0[klev],
                                  mu0n_below))

    # bare: transparent top layers (tau=0 -> R=0, T=1 exactly)
    o = jnp.ones((), dtype)
    z0 = jnp.zeros((), dtype)
    clear = LayerProps(rdir=z0, tdir=o, rdif_a=z0, rdif_b=z0,
                      tdif_a=o, tdif_b=o, trnlay=o)
    props_bare = [clear] * (nslyr + 1) + ice_props

    # snow: distinct SSL + first layer; deeper snow layers identical
    snow_top = [_layer_props(tau1[0], w01[0], g1[0], mu0),
                _layer_props(tau1[1], w01[1], g1[1], mu0)]
    if nslyr > 1:
        pSr = _layer_props(tau1[2], w01[2], g1[2], mu0)
        snow_top += [pSr] * (nslyr - 1)
    props_snow = snow_top + ice_props

    # pond: Fresnel at the very top (kf=0); water layers identical; all
    # sub-ice pond layers identical
    pPw = _layer_props(tau2[1], w02[1], g2[1], mu0n_below)
    pP0 = _fresnel(pPw, mu0, mu0n_below)
    n_pint = klev - kii - 1                      # kii+2 .. klev
    props_pond = [pP0] + [pPw] * nslyr \
        + [_layer_props(tau2[kii], w02[kii], g2[kii], mu0n_below),
           _layer_props(tau2[kii + 1], w02[kii + 1], g2[kii + 1],
                        mu0n_below)] \
        + [_layer_props(tau2[kii + 2], w02[kii + 2], g2[kii + 2],
                        mu0n_below)] * n_pint

    shape_ref = jnp.zeros((NSPINT,) + B, dtype)
    # open-ocean albedo under the ice: 0.01 visible, 0 near-IR (per band).
    # Built from a broadcast iota (not a literal constant array, not a
    # rank-changing reshape) so this function can run inside a Pallas
    # kernel body (ops/pallas/dedd_fused.py): Mosaic forbids captured
    # array constants and 1-D -> (N,1,1) vector shape casts.
    band = jax.lax.broadcasted_iota(jnp.int32, (NSPINT,) + (1,) * len(B),
                                    0)
    albo = jnp.where(band == 0, jnp.asarray(0.01, dtype),
                     jnp.asarray(0.0, dtype))
    solA = _adding(props_bare, albo, albo, shape_ref)
    solS = _adding(props_snow, albo, albo, shape_ref)
    solP = _adding(props_pond, albo, albo, shape_ref)

    part_common = dict(nilyr=nilyr, nslyr=nslyr, fnidr=fnidr,
                       swvdr=swvdr, swvdf=swvdf, swidr=swidr, swidf=swidf,
                       B=B, dtype=dtype)
    rs = [_partition_sol(srftyp=srf, sol=sol, **part_common)
          for srf, sol in ((0, solA), (1, solS), (2, solP))]
    r_bare, r_snow, r_pond = rs

    def mix(name):
        return (getattr(r_bare, name) * fi + getattr(r_snow, name) * fs
                + getattr(r_pond, name) * fp)

    def mixk(name, wshape):
        return (getattr(r_bare, name) * fi[None]
                + getattr(r_snow, name) * fs[None]
                + getattr(r_pond, name) * fp[None])

    L = lit
    Lk = lit[None]
    z = jnp.zeros_like(hi)
    alvdrn = jnp.where(L, mix("avdr"), 0.0)
    alvdfn = jnp.where(L, mix("avdf"), 0.0)
    alidrn = jnp.where(L, mix("aidr"), 0.0)
    alidfn = jnp.where(L, mix("aidf"), 0.0)
    broadband = lambda r: (ct.awtvdr * r.avdr + ct.awtidr * r.aidr
                           + ct.awtvdf * r.avdf + ct.awtidf * r.aidf)
    return DEddResult(
        alvdrn=alvdrn, alvdfn=alvdfn, alidrn=alidrn, alidfn=alidfn,
        fswsfcn=jnp.where(L, mix("fsfc"), 0.0),
        fswintn=jnp.where(L, mix("fint"), 0.0),
        fswthrun=jnp.where(L, mix("fthru"), 0.0),
        Sswabsn=jnp.where(Lk, r_snow.Sabs * fs[None], 0.0),
        Iswabsn=jnp.where(Lk, mixk("Iabs", None), 0.0),
        fswpenln=jnp.where(Lk, mixk("fthrul", None), 0.0),
        albicen=jnp.where(L, broadband(r_bare), 0.0),
        albsnon=jnp.where(L, broadband(r_snow), 0.0),
        albpndn=jnp.where(L, broadband(r_pond), 0.0),
        snowfracn=jnp.where(L, fs, 0.0))
