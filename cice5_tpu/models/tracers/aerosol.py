"""Aerosol tracers in snow and ice (reference source/ice_aerosol.F90).

Each aerosol species carries four mass tracers per category — snow surface
scattering layer (SSL), snow interior, ice SSL, ice interior (kg/m^3 of
vsno/vice respectively; ice_aerosol.F90:303-312). ``update_aerosol``
(ice_aerosol.F90:366-604) replays the thermodynamic thickness changes of the
step (evaporation, congelation, surface/basal melt, snowfall, snow-ice) on
the four-layer column, scavenging aerosol into the ocean with melt water and
re-gridding the SSL/interior split to the new thicknesses.

The reference's per-cell compressed loop with sequential ``if > puny``
branches becomes dense masked arithmetic: every stage is an unconditional
arithmetic update whose effect is gated by jnp.where, and the n_aero species
ride a leading axis (kscav broadcast). Deposition rates come from
``faero_default`` (ice_aerosol.F90:55-63) until file-driven forcing lands.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cice5_tpu import constants as ct

# scavenging fractions per species (ice_aerosol.F90:250-253)
KSCAV = (0.03, 0.20, 0.02, 0.02, 0.01, 0.01)
# surface scattering layer thicknesses (ice_shortwave.F90:139-140)
HI_SSL = 0.050
HS_SSL = 0.040


def faero_default(n_aero: int, shape, dtype=jnp.float32):
    """Constant atmospheric deposition rates (ice_aerosol.F90:55-63):
    1e-15 / 1e-13 / 1e-11 kg/m^2/s for species 1..3 (then repeating)."""
    rates = [10.0 ** (-15 + 2 * (k % 3)) for k in range(n_aero)]
    return jnp.stack([jnp.full(shape, r, dtype) for r in rates])


class AerosolResult(NamedTuple):
    aerosno: jnp.ndarray   # (n_aero, 2, ...) kg/m^3 snow tracers (ssl, int)
    aeroice: jnp.ndarray   # (n_aero, 2, ...) kg/m^3 ice tracers (ssl, int)
    faero_ocn: jnp.ndarray  # (n_aero, ...) flux to ocean this step (kg/m^2/s)


def _scav_melt(aero, dz_ssl, dz_int, dmelt, kscav, active):
    """Melt-water scavenging from a 2-layer stack (ice_aerosol.F90:330-346,
    surface-melt form): fractional loss kscav * melted-fraction per layer.

    aero: (n_aero, 2, ...); dmelt >= 0 is the melted thickness.
    Returns (new aero, mass lost to ocean)."""
    loss1 = jnp.where((dz_ssl > ct.puny) & active,
                      kscav * aero[:, 0]
                      * jnp.minimum(dmelt, dz_ssl)
                      / jnp.maximum(dz_ssl, ct.puny), 0.0)
    loss2 = jnp.where((dz_int > ct.puny) & active,
                      kscav * aero[:, 1]
                      * jnp.maximum(dmelt - dz_ssl, 0.0)
                      / jnp.maximum(dz_int, ct.puny), 0.0)
    new = jnp.stack([aero[:, 0] - loss1, aero[:, 1] - loss2], axis=1)
    return new, loss1 + loss2


def update_aerosol(dt, meltt, melts, meltb, congel, snoice, fsnow,
                   aerosno, aeroice,
                   aice_old, vice_old, vsno_old,
                   aicen, vicen, vsnon,
                   faero_atm, nilyr: int, nslyr: int):
    """Per-category aerosol column update (ice_aerosol.F90:366-604).

    aerosno/aeroice: (n_aero, 2, ...) tracer concentrations (kg/m^3).
    faero_atm: (n_aero, ...) deposition rate. All melt/growth args are this
    step's per-category diagnostics (m). Returns AerosolResult with updated
    concentrations and the ocean flux.
    """
    n_aero = aerosno.shape[0]
    kscav = jnp.asarray(KSCAV[:n_aero], aerosno.dtype)
    kscav = kscav.reshape((n_aero,) + (1,) * (aerosno.ndim - 2))
    active = aice_old > ct.puny
    sm = jnp.where(active, 1.0, 0.0)

    ar_old = 1.0 / jnp.maximum(aice_old, ct.puny)
    hs_old = vsno_old * ar_old
    hi_old = vice_old * ar_old
    dzssl = jnp.minimum(hs_old / (2.0 * nslyr), HS_SSL)
    dzssli = jnp.minimum(hi_old / (2.0 * nilyr), HI_SSL)
    dzint = hs_old - dzssl
    dzinti = hi_old - dzssli

    # new thicknesses; if the category vanished, normalize by old area
    # (ice_aerosol.F90:280-287)
    ar = jnp.where(aicen > 0.0, 1.0 / jnp.maximum(aicen, ct.puny), ar_old)
    hs = vsnon * ar
    hi = vicen * ar

    dhs_melts = -melts
    dhi_snoice = snoice
    dhs_snoice = dhi_snoice * ct.rhoi / ct.rhos
    dhi_meltt = -meltt
    dhi_meltb = -meltb
    dhi_congel = congel
    dhs_evap = hs - (hs_old + dhs_melts - dhs_snoice + fsnow / ct.rhos * dt)
    dhi_evap = hi - (hi_old + dhi_meltt + dhi_meltb + dhi_congel + dhi_snoice)

    # tracers -> masses (kg/m^2 of grid-cell area), ice_aerosol.F90:303-310
    aerosno = aerosno * vsno_old[None, None]
    aeroice = aeroice * vice_old[None, None]
    focn = jnp.zeros((n_aero,) + aice_old.shape, aerosno.dtype)

    # --- evaporation (ice_aerosol.F90:315-319) ---
    dzint = dzint + jnp.minimum(dzssl + dhs_evap, 0.0)
    dzinti = dzinti + jnp.minimum(dzssli + dhi_evap, 0.0)
    dzssl = jnp.maximum(dzssl + dhs_evap, 0.0)
    dzssli = jnp.maximum(dzssli + dhi_evap, 0.0)

    # --- basal ice growth (ice_aerosol.F90:324) ---
    dzinti = dzinti + dhi_congel

    # --- surface snow melt (ice_aerosol.F90:329-360) ---
    melting = (-dhs_melts > ct.puny) & active
    new_sno, lost = _scav_melt(aerosno, dzssl, dzint, -dhs_melts, kscav,
                               melting)
    aerosno = jnp.where(melting[None, None], new_sno, aerosno)
    focn = focn + jnp.where(melting[None], lost / dt, 0.0)
    dzint_m = dzint + jnp.minimum(dzssl + dhs_melts, 0.0)
    dzssl_m = jnp.maximum(dzssl + dhs_melts, 0.0)
    dzint = jnp.where(melting, dzint_m, dzint)
    dzssl = jnp.where(melting, dzssl_m, dzssl)
    # ssl melts away -> merge into interior
    gone_ssl = melting & (dzssl <= ct.puny)
    aerosno = jnp.where(
        gone_ssl[None, None],
        jnp.stack([jnp.zeros_like(aerosno[:, 0]),
                   aerosno[:, 0] + aerosno[:, 1]], axis=1), aerosno)
    # all snow melts away -> into ice SSL
    gone_sno = melting & (dzint <= ct.puny)
    aeroice = jnp.where(
        gone_sno[None, None],
        jnp.stack([aeroice[:, 0] + aerosno[:, 0] + aerosno[:, 1],
                   aeroice[:, 1]], axis=1), aeroice)
    aerosno = jnp.where(gone_sno[None, None], 0.0, aerosno)
    dzssl = jnp.maximum(dzssl, 0.0)
    dzint = jnp.maximum(dzint, 0.0)

    # --- surface ice melt (ice_aerosol.F90:365-395) ---
    imelt = (-dhi_meltt > ct.puny) & active
    new_ice, lost = _scav_melt(aeroice, dzssli, dzinti, -dhi_meltt, kscav,
                               imelt)
    aeroice = jnp.where(imelt[None, None], new_ice, aeroice)
    focn = focn + jnp.where(imelt[None], lost / dt, 0.0)
    dzinti_m = dzinti + jnp.minimum(dzssli + dhi_meltt, 0.0)
    dzssli_m = jnp.maximum(dzssli + dhi_meltt, 0.0)
    dzinti = jnp.where(imelt, dzinti_m, dzinti)
    dzssli = jnp.where(imelt, dzssli_m, dzssli)
    gone_issl = imelt & (dzssli <= ct.puny)
    aeroice = jnp.where(
        gone_issl[None, None],
        jnp.stack([jnp.zeros_like(aeroice[:, 0]),
                   aeroice[:, 0] + aeroice[:, 1]], axis=1), aeroice)
    gone_ice = imelt & (dzinti <= ct.puny)
    focn = focn + jnp.where(gone_ice[None],
                            (aeroice[:, 0] + aeroice[:, 1]) / dt, 0.0)
    aeroice = jnp.where(gone_ice[None, None], 0.0, aeroice)
    dzssli = jnp.maximum(dzssli, 0.0)
    dzinti = jnp.maximum(dzinti, 0.0)

    # --- basal ice melt: all aerosol in melted ice is lost
    # (ice_aerosol.F90:400-419) ---
    bmelt = (-dhi_meltb > ct.puny) & active
    loss1 = jnp.where((dzssli > ct.puny) & bmelt,
                      jnp.maximum(-dhi_meltb - dzinti, 0.0)
                      * aeroice[:, 0] / jnp.maximum(dzssli, ct.puny), 0.0)
    loss2 = jnp.where((dzinti > ct.puny) & bmelt,
                      jnp.minimum(-dhi_meltb, dzinti)
                      * aeroice[:, 1] / jnp.maximum(dzinti, ct.puny), 0.0)
    aeroice = jnp.stack([aeroice[:, 0] - loss1, aeroice[:, 1] - loss2],
                        axis=1)
    focn = focn + (loss1 + loss2) / dt
    dzssli = jnp.where(bmelt,
                       dzssli + jnp.minimum(dzinti + dhi_meltb, 0.0), dzssli)
    dzinti = jnp.where(bmelt, jnp.maximum(dzinti + dhi_meltb, 0.0), dzinti)

    # --- snowfall adds to snow SSL (ice_aerosol.F90:424) ---
    dzssl = dzssl + jnp.where(fsnow > 0.0, fsnow / ct.rhos * dt, 0.0) * sm

    # --- snow-ice formation (ice_aerosol.F90:429-449) ---
    sif = (dhs_snoice > ct.puny) & active
    loss2 = jnp.where((dzint > ct.puny) & sif,
                      jnp.minimum(dhs_snoice, dzint)
                      * aerosno[:, 1] / jnp.maximum(dzint, ct.puny), 0.0)
    loss1 = jnp.where((dzssl > ct.puny) & sif,
                      jnp.maximum(dhs_snoice - dzint, 0.0)
                      * aerosno[:, 0] / jnp.maximum(dzssl, ct.puny), 0.0)
    aerosno = jnp.stack([aerosno[:, 0] - loss1, aerosno[:, 1] - loss2],
                        axis=1)
    aeroice = jnp.stack(
        [aeroice[:, 0] + (1.0 - kscav) * (loss1 + loss2), aeroice[:, 1]],
        axis=1)
    focn = focn + kscav * (loss1 + loss2) / dt
    dzssl = jnp.where(sif, dzssl - jnp.maximum(dhs_snoice - dzint, 0.0),
                      dzssl)
    dzint = jnp.where(sif, jnp.maximum(dzint - dhs_snoice, 0.0), dzint)
    dzssli = jnp.where(sif, dzssli + dhi_snoice, dzssli)

    # --- atmospheric deposition (ice_aerosol.F90:454-468): into snow SSL
    # when snow is present, else ice SSL ---
    hs_dep = jnp.where(aicen > 0.0, vsnon * ar, 0.0)
    dep = faero_atm * (dt * aicen)[None] * sm[None]
    to_snow = (hs_dep > ct.hs_min)[None]
    aerosno = jnp.stack([aerosno[:, 0] + jnp.where(to_snow, dep, 0.0),
                         aerosno[:, 1]], axis=1)
    aeroice = jnp.stack([aeroice[:, 0] + jnp.where(to_snow, 0.0, dep),
                         aeroice[:, 1]], axis=1)

    # --- re-grid to the new SSL/interior split (ice_aerosol.F90:473-548) ---
    hs_new = jnp.where(aicen > 0.0, vsnon * ar, 0.0)
    hi_new = jnp.where(aicen > 0.0, vicen * ar, 0.0)
    # collapse empty layers downward
    e1 = active & (dzssl <= ct.puny)
    aerosno = jnp.where(
        e1[None, None],
        jnp.stack([jnp.zeros_like(aerosno[:, 0]),
                   aerosno[:, 0] + aerosno[:, 1]], axis=1), aerosno)
    e2 = active & (dzint <= ct.puny)
    aeroice = jnp.where(
        e2[None, None],
        jnp.stack([aeroice[:, 0] + aerosno[:, 1], aeroice[:, 1]], axis=1),
        aeroice)
    aerosno = jnp.where(e2[None, None],
                        jnp.stack([aerosno[:, 0],
                                   jnp.zeros_like(aerosno[:, 1])], axis=1),
                        aerosno)
    e3 = active & (dzssli <= ct.puny)
    aeroice = jnp.where(
        e3[None, None],
        jnp.stack([jnp.zeros_like(aeroice[:, 0]),
                   aeroice[:, 0] + aeroice[:, 1]], axis=1), aeroice)
    e4 = active & (dzinti <= ct.puny)
    focn = focn + jnp.where(e4[None],
                            (aeroice[:, 0] + aeroice[:, 1]) / dt, 0.0)
    aeroice = jnp.where(e4[None, None], 0.0, aeroice)

    dzssl_new = jnp.minimum(hs_new / (2.0 * nslyr), HS_SSL)
    dzssli_new = jnp.minimum(hi_new / (2.0 * nilyr), HI_SSL)

    # snow: move mass across the new SSL boundary
    snow_ok = active & (hs_new > ct.hs_min)
    dzneg = jnp.minimum(dzssl_new - dzssl, 0.0)
    dzpos = jnp.maximum(dzssl_new - dzssl, 0.0)
    sl = (jnp.where(dzssl > ct.puny,
                    dzneg * aerosno[:, 0] / jnp.maximum(dzssl, ct.puny), 0.0)
          + jnp.where(dzint > ct.puny,
                      dzpos * aerosno[:, 1] / jnp.maximum(dzint, ct.puny),
                      0.0))
    aerosno = jnp.where(
        snow_ok[None, None],
        jnp.stack([aerosno[:, 0] + sl, aerosno[:, 1] - sl], axis=1),
        aerosno)
    no_snow = active & ~(hs_new > ct.hs_min)
    aeroice = jnp.where(
        no_snow[None, None],
        jnp.stack([aeroice[:, 0] + aerosno[:, 0] + aerosno[:, 1],
                   aeroice[:, 1]], axis=1), aeroice)
    aerosno = jnp.where(no_snow[None, None], 0.0, aerosno)

    # ice: move mass across the new SSL boundary
    ice_ok = active & (vicen > ct.puny)
    dzneg = jnp.minimum(dzssli_new - dzssli, 0.0)
    dzpos = jnp.maximum(dzssli_new - dzssli, 0.0)
    sl = (jnp.where(dzssli > ct.puny,
                    dzneg * aeroice[:, 0] / jnp.maximum(dzssli, ct.puny),
                    0.0)
          + jnp.where(dzinti > ct.puny,
                      dzpos * aeroice[:, 1] / jnp.maximum(dzinti, ct.puny),
                      0.0))
    aeroice = jnp.where(
        ice_ok[None, None],
        jnp.stack([aeroice[:, 0] + sl, aeroice[:, 1] - sl], axis=1),
        aeroice)
    no_ice = active & ~(vicen > ct.puny)
    focn = focn + jnp.where(no_ice[None],
                            (aeroice[:, 0] + aeroice[:, 1]) / dt, 0.0)
    aeroice = jnp.where(no_ice[None, None], 0.0, aeroice)

    # --- masses back to concentrations (ice_aerosol.F90:568-578) ---
    aerosno = jnp.where((vsnon > ct.puny)[None, None],
                        aerosno / jnp.maximum(vsnon, ct.puny)[None, None],
                        aerosno)
    aeroice = jnp.where((vicen > ct.puny)[None, None],
                        aeroice / jnp.maximum(vicen, ct.puny)[None, None],
                        aeroice)
    return AerosolResult(aerosno=aerosno, aeroice=aeroice, faero_ocn=focn)
