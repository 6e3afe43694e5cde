"""Simple passive tracers: ice age and first-year ice area.

Re-expressions of /root/reference/source/ice_age.F90 (increment_age :45) and
ice_firstyear.F90 (update_FYarea :57 — FY area reset Sept 15 NH / Mar 15 SH).
"""
from __future__ import annotations

import jax.numpy as jnp

from cice5_tpu import constants as ct


def increment_age(dt, iage, aicen):
    """iage += dt where ice exists (ice_age.F90:45-80)."""
    return jnp.where(aicen > ct.puny, iage + dt, iage)


def update_FYarea(dt, yday, FY, aicen, nhmask):
    """Reset first-year area on day 259 (NH) / 75 (SH)
    (ice_firstyear.F90:57-105)."""
    secday = 86400.0
    reset_nh = (yday >= 259.0) & (yday < 259.0 + dt / secday)
    reset_sh = (yday >= 75.0) & (yday < 75.0 + dt / secday)
    has = aicen > ct.puny
    FY = jnp.where(has & reset_nh & nhmask, 0.0, FY)
    FY = jnp.where(has & reset_sh & ~nhmask, 0.0, FY)
    return FY
