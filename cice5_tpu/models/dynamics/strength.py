"""Ice strength.

Re-expression of /root/reference/source/ice_mechred.F90 ice_strength (:2111):
kstrength=0 Hibler (1979) P = P* h exp(-C*(1-A)); kstrength=1 Rothrock (1975)
energy-based strength built from the ridging participation/redistribution
functions (ice_mechred.F90:2177-2260) — computed in models/dynamics/ridge.py
and plugged in here.
"""
from __future__ import annotations

import jax.numpy as jnp

from cice5_tpu import constants as ct

PSTAR = 2.75e4
CSTAR = 20.0
CF_DEFAULT = 17.0
CP = 0.5 * ct.gravit * (ct.rhow - ct.rhoi) * ct.rhoi / ct.rhow


def strength_hibler(aice, vice, Pstar=PSTAR, Cstar=CSTAR):
    """Hibler (1979): strength = Pstar * vice * exp(-Cstar (1 - aice))."""
    return Pstar * vice * jnp.exp(-Cstar * (1.0 - aice))


def strength_rothrock(aicen, vicen, aice0, *, hin_max, krdg_partic,
                      krdg_redist, mu_rdg, Cf=CF_DEFAULT):
    """Rothrock (1975) energy-based strength (ice_mechred.F90:2177-2270):
    P = Cf * Cp * sum_n apartic(n)/aksum * [ -h_n^2 + mean(h_rdg^2) ]."""
    from cice5_tpu.models.dynamics.ridge import ridge_itd
    r = ridge_itd(aicen, vicen, aice0, krdg_partic=krdg_partic,
                  krdg_redist=krdg_redist, mu_rdg=mu_rdg)
    ncat = aicen.shape[0]
    hi = jnp.where(aicen > ct.puny,
                   vicen / jnp.maximum(aicen, ct.puny), 0.0)
    if krdg_redist == 0:
        h2rdg = (r.hrmin ** 2 + r.hrmin * (r.hrmax - r.hrmin)
                 + (r.hrmax - r.hrmin) ** 2 / 3.0)
    else:
        h2rdg = (r.hrmin ** 2 + 2.0 * r.hrmin * r.hrexp
                 + 2.0 * r.hrexp ** 2)
    dh2rdg = -hi ** 2 + h2rdg / jnp.maximum(r.krdg, ct.puny)
    contrib = jnp.where(aicen > ct.puny, r.apartic * dh2rdg, 0.0)
    strength = CP * jnp.sum(contrib, axis=0) / jnp.maximum(r.aksum, ct.puny)
    return Cf * jnp.maximum(strength, 0.0)
