"""Prescribed-ice mode (reference drivers/cesm/ice_prescribed_mod.F90).

For AMIP-style runs the ice concentration is read from data instead of
being prognostic: each coupling step ``ice_prescribed_phys`` (:377-520)
overwrites the state so the category containing the prescribed hemispheric
thickness (2 m NH / 1 m SH) carries the data concentration, freshly formed
cells get a linear temperature/BL99-salinity profile, and cells where the
data says ice-free are zeroed. Dynamics and ridging are turned off by the
caller (kdyn=0); thermodynamics still runs so surface fluxes respond to
the prescribed cover.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo import shared as thshared

EPS04 = 1.0e-4
HI_NH = 2.0       # prescribed ice thickness north of 40N (m)
HI_SH = 1.0       # prescribed south of 40S


def prescribe_ice(state, ice_cov, grid, tr, cfg, hin_max, Tf):
    """Overwrite the prognostic state with the prescribed concentration
    (ice_prescribed_phys :377-520). ice_cov: (ny, nx) data concentration.
    Returns the updated State."""
    nilyr, nslyr, ncat = cfg.nilyr, cfg.nslyr, cfg.ncat
    dtype = state.aicen.dtype
    tmask = grid.tmask
    cov = jnp.where(tmask, jnp.clip(ice_cov, 0.0, 1.0), 0.0)
    cov = jnp.where(cov < EPS04, 0.0, cov)

    tlat_deg = jnp.rad2deg(grid.TLAT)
    hi = jnp.where(tlat_deg > 40.0, HI_NH,
                   jnp.where(tlat_deg < -40.0, HI_SH, 0.0)).astype(dtype)
    has = cov >= EPS04

    aicen, vicen, vsnon, trcrn = (state.aicen, state.vicen, state.vsnon,
                                  state.trcrn)
    aice_old = jnp.sum(aicen, axis=0)
    Tsfc = trcrn[:, tr.nt_Tsfc]

    new_a = []
    new_v = []
    new_s = []
    for n in range(ncat):
        incat = has & (float(hin_max[n]) < hi) & (hi < float(hin_max[n + 1]))
        hs = jnp.where(aicen[n] > 0.0,
                       vsnon[n] / jnp.maximum(aicen[n], ct.puny), 0.0)
        new_a.append(jnp.where(incat, cov, jnp.where(has, aicen[n], 0.0)))
        new_v.append(jnp.where(incat, hi * cov,
                               jnp.where(has, vicen[n], 0.0)))
        new_s.append(jnp.where(incat, hs * cov,
                               jnp.where(has, vsnon[n], 0.0)))
    aicen_n = jnp.stack(new_a)
    vicen_n = jnp.stack(new_v)
    vsnon_n = jnp.stack(new_s)

    # freshly covered cells (no prior ice): initialize thermodynamic
    # profile (:473-520)
    fresh_cell = has & (aice_old < ct.puny)
    Tsfc_n = jnp.where(fresh_cell[None], Tf[None], Tsfc)
    Tsfc_n = jnp.where(has[None], Tsfc_n, Tf[None])
    trcrn = trcrn.at[:, tr.nt_Tsfc].set(Tsfc_n)

    slope = Tf[None] - Tsfc_n
    init_cols = fresh_cell[None] & (aicen_n > 0.0)
    for k in range(nilyr):
        zn = (k + 0.5) / nilyr
        Ti = Tsfc_n + slope * zn
        salin = (3.2 / 2.0) * (1.0 - np.cos(
            np.pi * zn ** (0.407 / (0.573 + zn))))
        Tmlt = -salin * ct.depressT
        qin = -(ct.rhoi * (ct.cp_ice * (Tmlt - Ti)
                           + ct.Lfresh * (1.0 - Tmlt / jnp.minimum(
                               Ti, -ct.puny))
                           - ct.cp_ocn * Tmlt))
        trcrn = trcrn.at[:, tr.nt_sice + k].set(
            jnp.where(init_cols, salin,
                      jnp.where(has[None], trcrn[:, tr.nt_sice + k], 0.0)))
        trcrn = trcrn.at[:, tr.nt_qice + k].set(
            jnp.where(init_cols, qin,
                      jnp.where(has[None], trcrn[:, tr.nt_qice + k], 0.0)))
    for k in range(nslyr):
        qsn = -ct.rhos * (ct.Lfresh - ct.cp_ice * Tsfc_n)
        trcrn = trcrn.at[:, tr.nt_qsno + k].set(
            jnp.where(init_cols, qsn,
                      jnp.where(has[None], trcrn[:, tr.nt_qsno + k],
                                -ct.rhos * ct.Lfresh)))

    return state.replace(aicen=aicen_n, vicen=vicen_n, vsnon=vsnon_n,
                         trcrn=trcrn,
                         frzmlt=jnp.zeros_like(state.frzmlt))
