"""Atmosphere-ice boundary layer.

Batched re-expression of /root/reference/source/ice_atmo.F90:
``atmo_boundary_layer`` (:82, Monin-Obukhov stability iteration following the
NCAR CCSM scheme with Jordan-1999 stable profile and windless sensible-heat
coefficient) and ``atmo_boundary_const`` (:492). The reference's fixed
``natmiter`` point iteration maps directly onto an unrolled loop over dense
arrays (trip count is static config).

Returns transfer coefficients shcoef/lhcoef for the implicit surface-flux
solve, wind stress on ice, and 2-m diagnostics Tref/Qref/Uref.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cice5_tpu import constants as ct

CPVIR = ct.cp_wv / ct.cp_air - 1.0
ZTRF = 2.0          # reference height for 2-m diagnostics


class ABLResult(NamedTuple):
    strx: jnp.ndarray
    stry: jnp.ndarray
    Tref: jnp.ndarray
    Qref: jnp.ndarray
    Uref: jnp.ndarray
    delt: jnp.ndarray
    delq: jnp.ndarray
    shcoef: jnp.ndarray
    lhcoef: jnp.ndarray


def _psimhu(x):
    return (jnp.log((1.0 + x * (2.0 + x)) * (1.0 + x * x) / 8.0)
            - 2.0 * jnp.arctan(x) + ct.pih)


def _psixhu(x):
    return 2.0 * jnp.log((1.0 + x * x) / 2.0)


def atmo_boundary_layer(*, sfctype: str, Tsf, potT, uatm, vatm, wind, zlvl,
                        Qa, rhoa, natmiter: int = 5,
                        Cdn_atm=None, highfreq: bool = False,
                        uice=None, vice=None) -> ABLResult:
    """Monin-Obukhov surface layer over 'ice' or 'ocn' (ice_atmo.F90:82-489).

    All inputs are (*B) arrays (zlvl may be scalar); ice-free cells are
    harmless (results masked downstream).

    highfreq: RASM high-frequency coupling (Roberts et al 2014,
    ice_atmo.F90:220-227,272-277,398-417): winds relative to the ice
    velocity (uice/vice on the T grid) drive the turbulence scales and the
    wind stress.
    """
    umin = 1.0
    hf = highfreq and sfctype == "ice"
    if hf:
        if uice is None or vice is None:
            raise ValueError("highfreq coupling needs uice/vice")
        relu, relv = uatm - uice, vatm - vice
        relmag = jnp.sqrt(relu ** 2 + relv ** 2)
        vmag = jnp.maximum(umin, relmag)
    else:
        vmag = jnp.maximum(umin, wind)

    if sfctype == "ice":
        qqq, TTT, Lheat = ct.qqqice, ct.TTTice, ct.Lsub
        if Cdn_atm is not None:
            rdn = jnp.where(Cdn_atm > ct.puny, jnp.sqrt(Cdn_atm),
                            ct.vonkar / jnp.log(ct.zref / ct.iceruf))
        else:
            rdn = jnp.full_like(vmag, ct.vonkar / jnp.log(ct.zref / ct.iceruf))
    else:
        qqq, TTT, Lheat = ct.qqqocn, ct.TTTocn, ct.Lvap
        rdn = jnp.sqrt(0.0027 / vmag + 0.000142 + 0.0000764 * vmag)

    TsfK = Tsf + ct.Tffresh
    qsat = qqq * jnp.exp(-TTT / TsfK)
    ssq = qsat / rhoa
    thva = potT * (1.0 + ct.zvir * Qa)
    delt = potT - TsfK
    delq = Qa - ssq
    alz = jnp.log(zlvl / ct.zref)
    cp = ct.cp_air * (1.0 + CPVIR * ssq)

    rhn = ren = rdn
    ustar = rdn * vmag
    tstar = rhn * delt
    qstar = ren * delq

    rd = rh = re = rdn
    stable = jnp.zeros_like(vmag)
    psixh = jnp.zeros_like(vmag)
    hol = jnp.zeros_like(vmag)
    for _ in range(natmiter):
        hol = (ct.vonkar * ct.gravit * zlvl
               * (tstar / thva + qstar / (1.0 / ct.zvir + Qa))
               / jnp.maximum(ustar ** 2, 1e-30))
        hol = jnp.sign(hol) * jnp.minimum(jnp.abs(hol), 10.0)
        stable = 0.5 + jnp.sign(hol) * 0.5
        xqq = jnp.sqrt(jnp.maximum(jnp.sqrt(jnp.abs(1.0 - 16.0 * hol)), 1.0))
        psimhs = -(0.7 * hol + 0.75 * (hol - 14.3)
                   * jnp.exp(-0.35 * hol) + 10.7)
        psimh = psimhs * stable + (1.0 - stable) * _psimhu(xqq)
        psixh = psimhs * stable + (1.0 - stable) * _psixhu(xqq)

        rd = rdn / (1.0 + rdn / ct.vonkar * (alz - psimh))
        rh = rhn / (1.0 + rhn / ct.vonkar * (alz - psixh))
        re = ren / (1.0 + ren / ct.vonkar * (alz - psixh))

        ustar = rd * vmag
        tstar = rh * delt
        qstar = re * delq

    if hf:
        # stress on relative wind (ice_atmo.F90:398-417)
        tau = rhoa * rd * rd
        strx = tau * relmag * relu
        stry = tau * relmag * relv
    else:
        tau = rhoa * ustar * rd
        strx = tau * uatm
        stry = tau * vatm

    shcoef = rhoa * ustar * cp * rh + 1.0   # windless coefficient, Jordan 99
    lhcoef = rhoa * ustar * Lheat * re

    # 2-m diagnostics
    al2 = jnp.log(ct.zref / ZTRF)
    hol2 = hol * ZTRF / zlvl
    xqq2 = jnp.sqrt(jnp.maximum(1.0, jnp.sqrt(jnp.abs(1.0 - 16.0 * hol2))))
    psix2 = -5.0 * hol2 * stable + (1.0 - stable) * _psixhu(xqq2)
    fac = (rh / ct.vonkar) * (alz + al2 - psixh + psix2)
    Tref = potT - delt * fac - 0.01 * ZTRF
    fac = (re / ct.vonkar) * (alz + al2 - psixh + psix2)
    Qref = Qa - delq * fac
    Uref = (relmag if hf else vmag) * rd / rdn

    return ABLResult(strx=strx, stry=stry, Tref=Tref, Qref=Qref, Uref=Uref,
                     delt=delt, delq=delq, shcoef=shcoef, lhcoef=lhcoef)


def atmo_boundary_const(*, sfctype: str, Tsf, potT, uatm, vatm, wind, Qa,
                        rhoa) -> ABLResult:
    """Constant-coefficient boundary layer (ice_atmo.F90:492-641):
    fixed bulk transfer coefficient 1.2e-3, no stability iteration."""
    cdn = 1.2e-3
    Lheat = ct.Lsub if sfctype == "ice" else ct.Lvap
    vmag = jnp.maximum(1.0, wind)
    tau = rhoa * cdn * vmag
    shcoef = tau * ct.cp_air
    lhcoef = tau * Lheat
    TsfK = Tsf + ct.Tffresh
    qqq = ct.qqqice if sfctype == "ice" else ct.qqqocn
    TTT = ct.TTTice if sfctype == "ice" else ct.TTTocn
    ssq = qqq * jnp.exp(-TTT / TsfK) / rhoa
    z = jnp.zeros_like(vmag)
    return ABLResult(strx=tau * uatm, stry=tau * vatm, Tref=potT, Qref=Qa,
                     Uref=vmag, delt=potT - TsfK, delq=Qa - ssq,
                     shcoef=shcoef, lhcoef=lhcoef)
