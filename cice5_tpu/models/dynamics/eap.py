"""Elastic-anisotropic-plastic (EAP) sea-ice dynamics.

TPU-native re-expression of /root/reference/source/ice_dyn_eap.F90
(Tsamados, Feltham & Wilchinsky 2013): the anisotropic rheology evolves a
structure tensor A = [[a11, a12], [a12, 1-a11]] describing the orientation
distribution of ice floes, and reads the yield stresses from precomputed
lookup tables (Appendix A1) instead of the VP elliptical yield curve.

Design notes for the TPU version:

* The per-cell ``update_stress_rdg`` (ice_dyn_eap.F90:1474-1658) — eigen
  decomposition of A and of the strain-rate tensor, angle binning, table
  lookup, back-rotation — is dense masked arithmetic; the six
  (41, 41, 21) yield tables are stacked into one (6, 41, 41, 21) constant
  so the lookup is a single gather per corner.
* The tables themselves (ice_dyn_eap.F90:556-621 init_eap + the s11kr..s22ks
  integrand functions :660-1046) are built once in vectorized numpy over the
  full (nx_yield, ny_yield, na_yield, nz) grid and cached.
* The subcycling structure (stress -> momentum -> every-10th-step structure
  tensor update, :345-452) mirrors the EVP driver: one ghost exchange of
  stacked (u, v) per subcycle; stress and structure tensor live on the
  (ny+1, nx+1) region grid where ghost rows are computed redundantly from
  the exchanged velocities.
* Out-of-range angle bins are clamped to the table edge (the reference's
  1-based ``int()`` indexing can underflow for strain-rate angles below the
  table origin; clamping keeps the same behavior for all in-range states
  without UB).
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.constants import FieldLoc, FieldType
from cice5_tpu.models.dynamics.evp import (EVPResult, _extend_stress,
                                           _region, _region_metrics,
                                           strain_rates,
                                           stress_divergence)
from cice5_tpu.parallel import Topology, extend

NX_YIELD, NY_YIELD, NA_YIELD = 41, 41, 21
PHI = np.pi / 12.0            # diamond floe acute half-angle (30 deg)
KFRICTION = 0.45              # sliding friction coefficient
KTH = 0.2e-3                  # structure tensor relaxation (stepa :1713)
KFRAC = 0.001                 # fracture diffusion (calc_ffrac :1824)
FFRAC_THRESHOLD = 0.3         # sigma_1/sigma_2 shear-faulting bound (c3*p1)

_PIH, _PIQ, _PI2 = np.pi / 2.0, np.pi / 4.0, 2.0 * np.pi
_DX = np.pi / (NX_YIELD - 1)
_DY = np.pi / (NY_YIELD - 1)
_DA = 0.5 / (NA_YIELD - 1)


def _w1(a):
    """Polynomial fit w1(a) of the Gaussian psi normalization
    (ice_dyn_eap.F90:624-641)."""
    return np.polyval([3495.82839237, -16789.98003081, 34397.72407466,
                       -38948.30444297, 26315.50025642, -10606.56079975,
                       2361.2198663, -223.87569446], a)


def _w2(a):
    """Polynomial fit w2(a) of the Gaussian psi width
    (ice_dyn_eap.F90:643-660)."""
    return np.polyval([102356.551518, -493379.44906738, 1013896.59464498,
                       -1151098.82436864, 779570.02793492, -314871.71525448,
                       70222.33061536, -6670.68911883], a)


def _stress_integrands(x, y, z, phi):
    """The six per-floe stress kernels s11kr..s22ks
    (ice_dyn_eap.F90:660-1046) evaluated on broadcastable x, y, z.

    Returns (r11, r12, r22, s11, s12, s22) — ridging and sliding parts."""
    p = phi
    n1t2i11 = np.cos(z + _PIH - p) * np.cos(z + p)
    n1t2i12 = np.cos(z + _PIH - p) * np.sin(z + p)
    n1t2i21 = np.sin(z + _PIH - p) * np.cos(z + p)
    n1t2i22 = np.sin(z + _PIH - p) * np.sin(z + p)
    n2t1i11 = np.cos(z - _PIH + p) * np.cos(z - p)
    n2t1i12 = np.cos(z - _PIH + p) * np.sin(z - p)
    n2t1i21 = np.sin(z - _PIH + p) * np.cos(z - p)
    n2t1i22 = np.sin(z - _PIH + p) * np.sin(z - p)
    t1t2i11 = np.cos(z - p) * np.cos(z + p)
    t1t2i12 = np.cos(z - p) * np.sin(z + p)
    t1t2i21 = np.sin(z - p) * np.cos(z + p)
    t1t2i22 = np.sin(z - p) * np.sin(z + p)
    t2t1i11 = t1t2i11
    t2t1i12 = np.cos(z + p) * np.sin(z - p)
    t2t1i21 = np.sin(z + p) * np.cos(z - p)
    t2t1i22 = t1t2i22

    cy2, ty = np.cos(y) ** 2, np.tan(y)
    d11 = cy2 * (np.cos(x) + np.sin(x) * ty * ty)
    d12 = cy2 * ty * (-np.cos(x) + np.sin(x))
    d22 = cy2 * (np.sin(x) + np.cos(x) * ty * ty)

    IIn1t2 = n1t2i11 * d11 + (n1t2i12 + n1t2i21) * d12 + n1t2i22 * d22
    IIn2t1 = n2t1i11 * d11 + (n2t1i12 + n2t1i21) * d12 + n2t1i22 * d22
    IIt1t2 = t1t2i11 * d11 + (t1t2i12 + t1t2i21) * d12 + t1t2i22 * d22

    Hen1t2 = (-IIn1t2 >= ct.puny).astype(np.float64)
    Hen2t1 = (-IIn2t1 >= ct.puny).astype(np.float64)
    sgn = np.sign(IIt1t2 + ct.puny)
    sgn = np.where(sgn == 0.0, 1.0, sgn)

    r11 = -Hen1t2 * n1t2i11 - Hen2t1 * n2t1i11
    r12 = 0.5 * ((-Hen1t2 * n1t2i12 - Hen2t1 * n2t1i12)
                 + (-Hen1t2 * n1t2i21 - Hen2t1 * n2t1i21))
    r22 = -Hen1t2 * n1t2i22 - Hen2t1 * n2t1i22
    s11 = sgn * (Hen1t2 * t1t2i11 + Hen2t1 * t2t1i11)
    s12 = 0.5 * (sgn * (Hen1t2 * t1t2i12 + Hen2t1 * t2t1i12)
                 + sgn * (Hen1t2 * t1t2i21 + Hen2t1 * t2t1i21))
    s22 = sgn * (Hen1t2 * t1t2i22 + Hen2t1 * t2t1i22)
    return r11, r12, r22, s11, s12, s22


@lru_cache(maxsize=2)
def build_yield_tables(nz: int = 100):
    """Precompute the (6, nx_yield, ny_yield, na_yield) yield-stress tables
    (ice_dyn_eap.F90:556-621): Gaussian-weighted z-integrals of the floe
    stress kernels for a < 1, and the isotropic delta-function limit at
    a = 1. Stacked order: [s11r, s12r, s22r, s11s, s12s, s22s]."""
    ia = np.arange(1, NA_YIELD + 1)
    a = (0.5 - _DA) + ia * _DA                     # in [0.5, 1.0]
    x = (np.pi + _PIQ - _DX) + np.arange(1, NX_YIELD + 1) * _DX
    y = -_DY + np.arange(1, NY_YIELD + 1) * _DY
    dz = np.pi / nz
    z = -_PIH + np.arange(1, nz + 1) * dz

    X = x[:, None, None]                           # (nx, 1, 1)
    Y = y[None, :, None]                           # (1, ny, 1)
    Z = z[None, None, :]                           # (1, 1, nz)
    kernels = _stress_integrands(X, Y, Z, PHI)     # each (nx, ny, nz)

    inv_sin2phi = 1.0 / np.sin(2.0 * PHI)
    tables = np.zeros((6, NX_YIELD, NY_YIELD, NA_YIELD))
    # a < 1: integrate psi(z) * kernel over z
    asub = a[:NA_YIELD - 1]
    wts = (_w1(asub)[None, :]
           * np.exp(-_w2(asub)[None, :] * (z ** 2)[:, None]))  # (nz, na-1)
    for k, kern in enumerate(kernels):
        tables[k, :, :, :NA_YIELD - 1] = np.einsum(
            "xyz,za->xya", kern, wts) * dz * inv_sin2phi
    # a == 1: delta function at z = 0
    k0 = _stress_integrands(x[:, None], y[None, :], 0.0, PHI)
    for k, kern in enumerate(k0):
        tables[k, :, :, NA_YIELD - 1] = 0.5 * kern * inv_sin2phi
    tables[np.abs(tables) < 1.0e-6] = 0.0
    return tables


class RdgStress(NamedTuple):
    stressp: jnp.ndarray
    stressm: jnp.ndarray
    stress12: jnp.ndarray
    alphar: jnp.ndarray    # ridging rate function
    alphas: jnp.ndarray    # sliding rate function


def update_stress_rdg(divu, tension, shear, a11, a12, strength,
                      tables) -> RdgStress:
    """Yield stress from structure tensor + strain rate
    (ice_dyn_eap.F90:1474-1658 update_stress_rdg), dense over the grid.

    tables: (6, nx_yield, ny_yield, na_yield) jnp constant."""
    dtype = divu.dtype
    # float(): a np.float64 scalar would strongly promote f32 arrays
    invsin = float(1.0 / (np.sin(_PI2 / 12.0)
                          * (1.0 + KFRICTION * KFRICTION)))

    # 1) structure tensor eigen-angle
    a22 = 1.0 - a11
    gamma = 0.5 * jnp.arctan2(2.0 * a12, a11 - a22)
    Q11 = jnp.cos(gamma)
    Q12 = jnp.sin(gamma)
    Q11Q11, Q11Q12, Q12Q12 = Q11 * Q11, Q11 * Q12, Q12 * Q12
    atempprime = Q11Q11 * a11 + 2.0 * Q11Q12 * a12 + Q12Q12 * a22
    atempprime = jnp.maximum(atempprime, 1.0 - atempprime)

    # 2) strain-rate principal values and angles
    dtemp11 = 0.5 * (divu + tension)
    dtemp12 = 0.5 * shear
    dtemp22 = 0.5 * (divu - tension)
    alpha = 0.5 * jnp.arctan2(2.0 * dtemp12, dtemp11 - dtemp22)
    alpha = jnp.where(alpha > gamma, alpha - np.pi, alpha)
    alpha = jnp.where(alpha < gamma - np.pi, alpha + np.pi, alpha)
    y = gamma - alpha

    Qd11 = jnp.cos(alpha)
    Qd12 = jnp.sin(alpha)
    dtemp1 = Qd11 * (Qd11 * dtemp11 + 2.0 * Qd12 * dtemp12) \
        + Qd12 * Qd12 * dtemp22
    dtemp2 = Qd12 * (Qd12 * dtemp11 - 2.0 * Qd11 * dtemp12) \
        + Qd11 * Qd11 * dtemp22
    leng = jnp.sqrt(dtemp1 * dtemp1 + dtemp2 * dtemp2)
    nonzero = leng > ct.puny
    invleng = 1.0 / jnp.maximum(leng, ct.puny)
    d1n = jnp.where(nonzero, dtemp1 * invleng, 0.0)
    d2n = jnp.where(nonzero, dtemp2 * invleng, 0.0)
    x = jnp.where(nonzero, jnp.arctan2(d2n, d1n), 0.0)
    x = jnp.where(x < _PIQ, x + _PI2, x)

    # 3) table lookup (clamped to the grid; see module docstring)
    kx = jnp.clip(jnp.floor((x - _PIQ - np.pi) / _DX).astype(jnp.int32),
                  0, NX_YIELD - 1)
    ky = jnp.clip(jnp.floor(y / _DY).astype(jnp.int32), 0, NY_YIELD - 1)
    ka = jnp.clip(jnp.floor((atempprime - 0.5) / _DA).astype(jnp.int32),
                  0, NA_YIELD - 1)
    st = tables[:, kx, ky, ka].astype(dtype)   # (6, ...)
    s11r, s12r, s22r, s11s, s12s, s22s = st

    # 4) mean stress over the floe collection (Eq. 3), principal frame
    stressp = strength * (s11r + KFRICTION * s11s
                          + s22r + KFRICTION * s22s) * invsin
    stress12 = strength * (s12r + KFRICTION * s12s) * invsin
    stressm = strength * (s11r + KFRICTION * s11s
                          - s22r - KFRICTION * s22s) * invsin

    # 5) back-rotation into general coordinates
    sig11 = 0.5 * (stressp + stressm)
    sig12 = stress12
    sig22 = 0.5 * (stressp - stressm)
    sgprm11 = Q11Q11 * sig11 + Q12Q12 * sig22 - 2.0 * Q11Q12 * sig12
    sgprm12 = Q11Q12 * sig11 - Q11Q12 * sig22 + (Q11Q11 - Q12Q12) * sig12
    sgprm22 = Q12Q12 * sig11 + Q11Q11 * sig22 + 2.0 * Q11Q12 * sig12

    # 6) ridging/sliding rate functions in general coordinates (Eq. 11) —
    # cheap; the driver uses only the last subcycle's values
    rot11r = Q11Q11 * s11r - 2.0 * Q11Q12 * s12r + Q12Q12 * s22r
    rot12r = Q11Q11 * s12r + Q11Q12 * (s11r - s22r) - Q12Q12 * s12r
    rot22r = Q12Q12 * s11r + 2.0 * Q11Q12 * s12r + Q11Q11 * s22r
    rot11s = Q11Q11 * s11s - 2.0 * Q11Q12 * s12s + Q12Q12 * s22s
    rot12s = Q11Q11 * s12s + Q11Q12 * (s11s - s22s) - Q12Q12 * s12s
    rot22s = Q12Q12 * s11s + 2.0 * Q11Q12 * s12s + Q11Q11 * s22s
    alphar = rot11r * dtemp11 + 2.0 * rot12r * dtemp12 + rot22r * dtemp22
    alphas = rot11s * dtemp11 + 2.0 * rot12s * dtemp12 + rot22s * dtemp22

    return RdgStress(stressp=sgprm11 + sgprm22, stressm=sgprm11 - sgprm22,
                     stress12=sgprm12, alphar=alphar, alphas=alphas)


def _ffrac(stressp, stressm, stress12, a11x, a12x):
    """Fracture re-orientation term Ffrac = -kfrac (A - S)
    (ice_dyn_eap.F90:1795-1864 calc_ffrac), both tensor components at once."""
    sigma11 = 0.5 * (stressp + stressm)
    sigma12 = stress12
    sigma22 = 0.5 * (stressp - stressm)
    gamma = 0.5 * jnp.arctan2(2.0 * sigma12, sigma11 - sigma22)
    Q11 = jnp.cos(gamma)
    Q12 = jnp.sin(gamma)
    Q11Q11, Q11Q12, Q12Q12 = Q11 * Q11, Q11 * Q12, Q12 * Q12
    sigma_1 = Q11Q11 * sigma11 + 2.0 * Q11Q12 * sigma12 + Q12Q12 * sigma22
    sigma_2 = Q12Q12 * sigma11 - 2.0 * Q11Q12 * sigma12 + Q11Q11 * sigma22

    # active: unconfined compression, or shear faulting (sigma_2 == 0 and
    # the pure-divergence case fall through to zero)
    ratio = sigma_1 / jnp.where(jnp.abs(sigma_2) > 0.0, sigma_2, 1.0)
    active = ((sigma_1 >= 0.0) & (sigma_2 < 0.0)) \
        | ((sigma_1 <= 0.0) & (sigma_2 < 0.0) & (ratio <= FFRAC_THRESHOLD))
    m11 = jnp.where(active, KFRAC * (a11x - Q12Q12), 0.0)
    m12 = jnp.where(active, KFRAC * (a12x + Q11Q12), 0.0)
    return m11, m12


def stepa(dtei, stress, a11_k, a12_k):
    """Implicit structure-tensor update (ice_dyn_eap.F90:1664-1787 stepa).

    stress: (12, ...) region components [sp1..4, sm1..4, s12_1..4];
    a11_k/a12_k: (4, ...) per-corner structure tensor. Returns (a11_k,
    a12_k, a11, a12) with the cell means."""
    dteikth = 1.0 / (dtei + KTH)
    p5kth = 0.5 * KTH
    m11, m12 = _ffrac(stress[0:4], stress[4:8], stress[8:12], a11_k, a12_k)
    a11_new = (a11_k * dtei + p5kth - m11) * dteikth
    a12_new = (a12_k * dtei - m12) * dteikth
    return a11_new, a12_new, jnp.mean(a11_new, 0), jnp.mean(a12_new, 0)


class EAPStressResult(NamedTuple):
    stress: jnp.ndarray   # (12, nyr, nxr)
    str8: jnp.ndarray
    divu: jnp.ndarray
    shear: jnp.ndarray
    rdg_conv: jnp.ndarray
    prs_sig: jnp.ndarray
    e11: jnp.ndarray      # strain-rate tensor (f_e11/e12/e22 history)
    e12: jnp.ndarray
    e22: jnp.ndarray
    ys11: jnp.ndarray     # anisotropic yield-stress tensor
    ys12: jnp.ndarray     # (f_yieldstress11/12/22 history)
    ys22: jnp.ndarray


def stress_eap_kernel(p: dyn.EVPParams, uvE, vvE, stress, a11_k, a12_k,
                      tables, *, maskR, strengthR, gR) -> EAPStressResult:
    """One EAP stress relaxation step on the region grid
    (ice_dyn_eap.F90:1052-1467 stress_eap)."""
    dxt, dyt = gR["dxt"], gR["dyt"]
    tarear = gR["tarear"]

    divs, tens, shears = strain_rates(uvE, vvE, gR)

    # per-corner anisotropic yield stress
    sp_t, sm_t, s12_t, alphar, alphas = [], [], [], [], []
    for c in range(4):
        r = update_stress_rdg(divs[c], tens[c], shears[c],
                              a11_k[c], a12_k[c], strengthR, tables)
        sp_t.append(r.stressp)
        sm_t.append(r.stressm)
        s12_t.append(r.stress12)
        alphar.append(r.alphar)
        alphas.append(r.alphas)

    # diagnostics (kept every subcycle; caller uses the final values)
    P25 = 0.25
    shear_d = P25 * tarear * jnp.sqrt(
        (tens[0] + tens[1] + tens[2] + tens[3]) ** 2
        + (shears[0] + shears[1] + shears[2] + shears[3]) ** 2)
    divu = P25 * (divs[0] + divs[1] + divs[2] + divs[3]) * tarear
    rdg_conv = -jnp.minimum(
        P25 * (alphar[0] + alphar[1] + alphar[2] + alphar[3]), 0.0) * tarear
    # strain-rate tensor components (ice_dyn_eap.F90:1278-1284) and the
    # anisotropic yield-stress tensor (:1330-1339), corner means
    dsum = divs[0] + divs[1] + divs[2] + divs[3]
    tsum = tens[0] + tens[1] + tens[2] + tens[3]
    e11 = 0.5 * P25 * (dsum + tsum) * tarear
    e12 = 0.5 * P25 * (shears[0] + shears[1] + shears[2]
                       + shears[3]) * tarear
    e22 = 0.5 * P25 * (dsum - tsum) * tarear
    spsum = sp_t[0] + sp_t[1] + sp_t[2] + sp_t[3]
    smsum = sm_t[0] + sm_t[1] + sm_t[2] + sm_t[3]
    ys11 = 0.5 * P25 * (spsum + smsum)
    ys22 = 0.5 * P25 * (spsum - smsum)
    ys12 = P25 * (s12_t[0] + s12_t[1] + s12_t[2] + s12_t[3])

    # elastic relaxation (Eq. A12-A14)
    d1, a1 = p.denom1, p.arlx1i
    comps = []
    for c in range(4):
        comps.append((stress[c] + sp_t[c] * a1) * d1)
    for c in range(4):
        comps.append((stress[4 + c] + sm_t[c] * a1) * d1)
    for c in range(4):
        comps.append((stress[8 + c] + s12_t[c] * a1) * d1)
    m = maskR
    z = jnp.zeros_like(comps[0])
    comps = [jnp.where(m, s, z) for s in comps]

    str8 = stress_divergence(comps, dxt, dyt, gR["dxhy"], gR["dyhx"], maskR)
    return EAPStressResult(stress=jnp.stack(comps), str8=str8, divu=divu,
                           shear=shear_d, rdg_conv=rdg_conv,
                           prs_sig=jnp.where(m, strengthR, z),
                           e11=e11, e12=e12, e22=e22,
                           ys11=ys11, ys12=ys12, ys22=ys22)


class EAPResult(NamedTuple):
    evp: EVPResult        # same surface as the EVP driver
    a11n: jnp.ndarray     # (4, ny, nx) per-corner structure tensor
    a12n: jnp.ndarray
    e11: jnp.ndarray      # strain-rate / yield-stress tensor diagnostics
    e12: jnp.ndarray      # from the LAST subcycle (ice_dyn_eap.F90:
    e22: jnp.ndarray      # 1278-1284, 1330-1339)
    ys11: jnp.ndarray
    ys12: jnp.ndarray
    ys22: jnp.ndarray


def eap(dt, p: dyn.EVPParams, grid, topo: Topology, *, aice, vice, vsno,
        strength, strairxT, strairyT, uocn, vocn, uvel, vvel,
        stressp, stressm, stress12, iceumask, a11n, a12n,
        ss_tltx=None, ss_tlty=None, Cw=ct.dragio) -> EAPResult:
    """EAP dynamics driver (ice_dyn_eap.F90:66-486 eap).

    Same interface as evp() plus the per-corner structure tensor state
    a11n/a12n (4, ny, nx) (init 0.5 / 0.0, ice_dyn_eap.F90:529-555)."""
    ny, nx = aice.shape
    dtype = aice.dtype
    tables = jnp.asarray(build_yield_tables(), dtype)

    tmass, icetmask = dyn.icet_mask(aice, vice, vsno, grid.tmask, topo)
    maskR = _region(icetmask.astype(dtype), topo) > 0.5

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

    gR = _region_metrics(grid, topo, ("dxt", "dyt", "dxhy", "dyhx",
                                      "cxp", "cyp", "cxm", "cym",
                                      "tarear", "tinyarea"))
    strengthR = _region(strength, topo)

    stress0 = jnp.concatenate([stressp, stressm, stress12], axis=0)
    stressR = _extend_stress(stress0, topo)
    stressR = jnp.where(maskR[None], stressR, 0.0)
    aR = extend(jnp.concatenate([a11n, a12n], axis=0), topo)[:, 1:, 1:]
    a11R, a12R = aR[0:4], aR[4:8]

    dtei = float(p.ndte) / dt              # 1/dte

    def body(k, carry):
        u, v, stress, a11_k, a12_k, _ = carry
        uvE = extend(jnp.stack([u, v]), topo, loc=FieldLoc.NECORNER,
                     kind=FieldType.VECTOR)
        r = stress_eap_kernel(p, uvE[0], uvE[1], stress, a11_k, a12_k,
                              tables, maskR=maskR, strengthR=strengthR,
                              gR=gR)
        s = dyn.stepu(p, icemask=icem_u, aiu=aiu, strE=r.str8, uocn=uocn,
                      vocn=vocn, waterx=waterx, watery=watery, forcex=forcex,
                      forcey=forcey, umassdti=umassdti, fm=fm,
                      uarear=grid.uarear, uvel_init=uvel_init,
                      vvel_init=vvel_init, uvel=u, vvel=v, Cw=Cw)
        # structure tensor update every 10th subcycle
        # (ice_dyn_eap.F90:417 'mod(ksub,10) == 1', ksub = k+1)
        a11_new, a12_new, _, _ = stepa(dtei, r.stress, a11_k, a12_k)
        upd = (k % 10) == 0
        a11_k = jnp.where(upd, a11_new, a11_k)
        a12_k = jnp.where(upd, a12_new, a12_k)
        return (s.uvel, s.vvel, r.stress, a11_k, a12_k,
                (r.divu, r.shear, r.rdg_conv, r.prs_sig,
                 s.strintx, s.strinty,
                 r.e11, r.e12, r.e22, r.ys11, r.ys12, r.ys22))

    zR = jnp.zeros_like(strengthR)
    z2 = jnp.zeros_like(uvel)
    init = (uvel, vvel, stressR, a11R, a12R,
            (zR, zR, zR, zR, z2, z2, zR, zR, zR, zR, zR, zR))
    u, v, stressR, a11R, a12R, diags = jax.lax.fori_loop(
        0, p.ndte, body, init)
    (divuR, shearR, rconvR, prsR, strintx, strinty,
     e11R, e12R, e22R, ys11R, ys12R, ys22R) = diags

    strocnx, strocny, sTx_u, sTy_u = dyn.evp_finish(
        p, icemask=icem_u, uvel=u, vvel=v, uocn=uocn, vocn=vocn, aiu=aiu,
        fm=fm, Cw=Cw)
    strocnxT = dyn.to_tgrid(sTx_u, grid, topo)
    strocnyT = dyn.to_tgrid(sTy_u, grid, topo)

    crop = lambda a: a[..., :ny, :nx]
    res = EVPResult(
        uvel=u, vvel=v,
        stressp=crop(stressR[0:4]), stressm=crop(stressR[4:8]),
        stress12=crop(stressR[8:12]),
        iceumask=icem_u.astype(dtype),
        strocnx=strocnx, strocny=strocny,
        strocnxT=strocnxT, strocnyT=strocnyT,
        strairx=strairx, strairy=strairy,
        strintx=strintx, strinty=strinty,
        strtltx=strtltx, strtlty=strtlty,
        divu=crop(divuR), shear=crop(shearR), rdg_conv=crop(rconvR),
        # rdg_shear = 0 for closing_net in ridge_prep
        # (ice_dyn_eap.F90:1262-1264)
        rdg_shear=jnp.zeros((ny, nx), dtype), prs_sig=crop(prsR), fm=fm)
    return EAPResult(evp=res, a11n=crop(a11R), a12n=crop(a12R),
                     e11=crop(e11R), e12=crop(e12R), e22=crop(e22R),
                     ys11=crop(ys11R), ys12=crop(ys12R),
                     ys22=crop(ys22R))
