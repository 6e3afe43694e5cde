"""Shared EVP/EAP dynamics machinery: parameters, grid staggering, prep,
point-wise momentum solve, ocean-stress finish.

TPU-native re-expression of /root/reference/source/ice_dyn_shared.F90
(set_evp_parameters :185, evp_prep1 :270, evp_prep2 :377, stepu :623,
evp_finish :757) and the T<->U staggering of ice_grid.F90:1799-1953.

Everything is dense (ny, nx) masked arithmetic over the shard; the
reference's gathered icellt/icellu index lists disappear (gather/scatter is
the expensive op on TPU; dense masked FMAs are nearly free on the VPU).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.constants import FieldType
from cice5_tpu.parallel import Topology, extend

EYC = 0.36       # E_0: ratio of elastic damping timescale to dt
A_MIN = 0.001    # minimum ice area for dynamics
M_MIN = 0.01     # minimum ice mass (kg/m^2)


@dataclass(frozen=True)
class EVPParams:
    """set_evp_parameters (ice_dyn_shared.F90:185-268), classic EVP path."""
    ndte: int
    arlx1i: float
    brlx: float
    denom1: float
    revp: float
    ecci: float = 0.25
    cosw: float = 1.0
    sinw: float = 0.0

    @classmethod
    def classic(cls, dt: float, ndte: int, cosw=1.0, sinw=0.0,
                e_ratio=2.0) -> "EVPParams":
        dte = dt / ndte
        tdamp2 = 2.0 * EYC * dt
        arlx1i = dte / tdamp2
        brlx = dt / dte
        return cls(ndte=ndte, arlx1i=arlx1i, brlx=brlx,
                   denom1=1.0 / (1.0 + arlx1i), revp=0.0,
                   ecci=1.0 / e_ratio ** 2, cosw=cosw, sinw=sinw)

    @classmethod
    def revised(cls, dt: float, ndte: int, xmin,
                cosw=1.0, sinw=0.0, e_ratio=2.0) -> "EVPParams":
        """Bouillon et al 2013 revised EVP (ice_dyn_shared.F90:230-240):
        alpha/beta relaxation replaces the elastic timescale; xmin is the
        global ocean minimum of (dxt, dyt) (may be a traced scalar)."""
        Se, xi = 0.86, 5.5e-3
        gamma = 0.25 * 1.0e11 * dt
        arlx1i = 2.0 * xi / Se
        brlx = 2.0 * Se * xi * gamma / xmin ** 2
        return cls(ndte=ndte, arlx1i=arlx1i, brlx=brlx,
                   denom1=1.0 / (1.0 + arlx1i), revp=1.0,
                   ecci=1.0 / e_ratio ** 2, cosw=cosw, sinw=sinw)


def to_ugrid(T, grid, topo: Topology, kind=FieldType.SCALAR):
    """Area-weighted T->U interpolation (ice_grid.F90:1834-1883 to_ugrid):
    U(i,j) = 1/4 sum of the 4 surrounding T values * tarea / uarea.

    kind: pass FieldType.VECTOR for vector components (wind stress) so the
    tripole fold ghost row flips sign — a scalar fold hands the seam U row
    the UNNEGATED image, reversing the interpolated stress there
    (caught by tests/test_tripole_oracle.py)."""
    w = extend(T * grid.tarea, topo, kind=kind)
    s = w[..., 1:-1, 1:-1] + w[..., 1:-1, 2:] + w[..., 2:, 1:-1] + w[..., 2:, 2:]
    return 0.25 * s * grid.uarear


def to_tgrid(U, grid, topo: Topology):
    """U->T interpolation (ice_grid.F90:1921-1953 to_tgrid)."""
    w = extend(U * grid.uarea, topo)
    s = (w[..., 1:-1, 1:-1] + w[..., 1:-1, :-2]
         + w[..., :-2, 1:-1] + w[..., :-2, :-2])
    return 0.25 * s * grid.tarear


def icet_mask(aice, vice, vsno, tmask, topo: Topology):
    """tmass + dilated ice-extent T mask (evp_prep1, ice_dyn_shared.F90:270).

    Returns (tmass, icetmask) where icetmask is the 9-point dilation of
    (aice > a_min & tmass > m_min), limited to ocean cells."""
    tmass = jnp.where(tmask, ct.rhoi * vice + ct.rhos * vsno, 0.0)
    core = tmask & (aice > A_MIN) & (tmass > M_MIN)
    E = extend(core.astype(aice.dtype), topo)
    dil = jnp.zeros_like(aice)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            dil = dil + E[..., 1 + dj:E.shape[-2] - 1 + dj,
                          1 + di:E.shape[-1] - 1 + di]
    icetmask = (dil > 0.0) & tmask
    return tmass, icetmask


class StepUResult(NamedTuple):
    uvel: jnp.ndarray
    vvel: jnp.ndarray
    strintx: jnp.ndarray
    strinty: jnp.ndarray
    strocnx: jnp.ndarray
    strocny: jnp.ndarray


def stepu(p: EVPParams, *, icemask, aiu, strE, uocn, vocn, waterx, watery,
          forcex, forcey, umassdti, fm, uarear, uvel_init, vvel_init,
          uvel, vvel, Cw=ct.dragio) -> StepUResult:
    """Implicit point-wise momentum solve (ice_dyn_shared.F90:623-755).

    strE: stress-combination region array (8, ny+1, nx+1) covering T cells
    [0..ny] x [0..nx] (interior plus the N/E ghost row/column), so that
    str(i+1, j), str(i, j+1), str(i+1, j+1) are static slices.
    """
    uold, vold = uvel, vvel
    vrel = aiu * ct.rhow * Cw * jnp.sqrt((uocn - uold) ** 2
                                         + (vocn - vold) ** 2)
    taux = vrel * waterx
    tauy = vrel * watery

    cca = (p.brlx + p.revp) * umassdti + vrel * p.cosw
    ccb = fm + jnp.sign(fm) * vrel * p.sinw
    ab2 = cca * cca + ccb * ccb

    # stress divergence: str(i,j,1)+str(i+1,j,2)+str(i,j+1,3)+str(i+1,j+1,4)
    ny, nx = uvel.shape[-2], uvel.shape[-1]
    c = lambda k, di, dj: strE[k, dj:dj + ny, di:di + nx]
    strintx = uarear * (c(0, 0, 0) + c(1, 1, 0) + c(2, 0, 1) + c(3, 1, 1))
    strinty = uarear * (c(4, 0, 0) + c(5, 0, 1) + c(6, 1, 0) + c(7, 1, 1))

    cc1 = strintx + forcex + taux + umassdti * (p.brlx * uold
                                                + p.revp * uvel_init)
    cc2 = strinty + forcey + tauy + umassdti * (p.brlx * vold
                                                + p.revp * vvel_init)
    ab2 = jnp.maximum(ab2, 1e-30)
    unew = (cca * cc1 + ccb * cc2) / ab2
    vnew = (cca * cc2 - ccb * cc1) / ab2

    m = icemask
    return StepUResult(
        uvel=jnp.where(m, unew, 0.0),
        vvel=jnp.where(m, vnew, 0.0),
        strintx=jnp.where(m, strintx, 0.0),
        strinty=jnp.where(m, strinty, 0.0),
        strocnx=jnp.where(m, taux, 0.0),
        strocny=jnp.where(m, tauy, 0.0))


def evp_finish(p: EVPParams, *, icemask, uvel, vvel, uocn, vocn, aiu, fm,
               Cw=ct.dragio):
    """Final ice-ocean stress (ice_dyn_shared.F90:757-849 evp_finish).
    Returns (strocnx, strocny, strocnxT, strocnyT) — T-grid conversion is the
    caller's job (needs a halo)."""
    vrel = ct.rhow * Cw * jnp.sqrt((uocn - uvel) ** 2 + (vocn - vvel) ** 2)
    vrel = vrel * aiu
    sgn = jnp.sign(fm)
    strocnx = vrel * ((uocn - uvel) * p.cosw - (vocn - vvel) * p.sinw * sgn)
    strocny = vrel * ((vocn - vvel) * p.cosw + (uocn - uvel) * p.sinw * sgn)
    strocnx = jnp.where(icemask, strocnx, 0.0)
    strocny = jnp.where(icemask, strocny, 0.0)
    aiu_s = jnp.maximum(aiu, ct.puny)
    return strocnx, strocny, strocnx / aiu_s, strocny / aiu_s


def principal_stress(stressp1, stressm1, stress121, prs_sig):
    """Principal stresses normalized by replacement pressure
    (ice_dyn_shared.F90:853-899), for the yield-curve diagnostic."""
    sp = prs_sig > ct.puny
    denom = jnp.where(sp, prs_sig, 1.0)
    rad = jnp.sqrt((0.5 * stressm1) ** 2 + stress121 ** 2)
    sig1 = jnp.where(sp, (0.5 * stressp1 + rad) / denom, ct.spval_dbl)
    sig2 = jnp.where(sp, (0.5 * stressp1 - rad) / denom, ct.spval_dbl)
    return sig1, sig2
