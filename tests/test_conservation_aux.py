"""Aux-tracer conservation: aerosol mass, topo-pond water, and skeletal-
BGC amount must be routed to the ocean-flux accumulators (never silently
destroyed) through every ITD/mechanical path:

  - zap_small_areas / zap_snow_temperature (ice_itd.F90:1905-1927,
    2221-2236: dfpond/dfaero_ocn; BGC routing is a conservation
    completion over the 5.1.2 reference, which destroys it)
  - lateral_melt (ice_therm_itd.F90:1146-1212)
  - ridge_ice (ice_mechred.F90:1704-1717 maero/mpond)
  - add_new_ice (+ add_new_ice_bgc, ice_zbgc.F90:866-1060: frazil takes
    bio from the ocean; vbrin conserved; new ice is aerosol-free)

plus full-step global aerosol budgets under forced melt-out and forced
frazil growth: d(mass) == (deposition - faero_ocn) * dt exactly.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import constants as ct
from cice5_tpu.config import rect_config
from cice5_tpu.models.thermo import itd, shared as thshared
from cice5_tpu.state import build_tracer_registry

NA = 2
DT = 3600.0


def _cfg_all():
    return rect_config().replace(
        tracers=dataclasses.replace(
            rect_config().tracers, tr_aero=True, n_aero=NA, tr_iage=True,
            tr_FY=True, tr_lvl=True, tr_pond_topo=True, tr_brine=True,
            skl_bgc=True))


def _state(tr, cfg, B=(8,), tiny_cat=None, rng=None):
    """(ncat, B) state with sensible thermo tracers + seeded aux tracers.
    tiny_cat: set that category's area to puny/2 (a zap candidate)."""
    ncat, nilyr, nslyr = cfg.ncat, cfg.nilyr, cfg.nslyr
    rng = rng or np.random.default_rng(7)
    aicen = jnp.asarray(0.05 + 0.1 * rng.random((ncat,) + B))
    hicen = jnp.asarray(0.5 + 2.0 * rng.random((ncat,) + B))
    if tiny_cat is not None:
        aicen = aicen.at[tiny_cat].set(ct.puny / 2.0)
    vicen = aicen * hicen
    vsnon = 0.1 * vicen
    trcrn = jnp.zeros((ncat, tr.ntrcr) + B, jnp.float64)
    trcrn = trcrn.at[:, tr.nt_Tsfc].set(-5.0)
    qi = thshared.ice_enthalpy(jnp.asarray(-5.0), jnp.asarray(-1.8))
    for k in range(nilyr):
        trcrn = trcrn.at[:, tr.nt_qice + k].set(float(qi))
        trcrn = trcrn.at[:, tr.nt_sice + k].set(3.0)
    for k in range(nslyr):
        trcrn = trcrn.at[:, tr.nt_qsno + k].set(
            float(thshared.snow_enthalpy(jnp.asarray(-5.0))))
    if tr.nt_alvl >= 0:
        trcrn = trcrn.at[:, tr.nt_alvl].set(1.0)
        trcrn = trcrn.at[:, tr.nt_vlvl].set(1.0)
    if tr.nt_apnd >= 0:
        trcrn = trcrn.at[:, tr.nt_apnd].set(0.2)
        trcrn = trcrn.at[:, tr.nt_hpnd].set(0.1)
    if tr.nt_fbri >= 0:
        trcrn = trcrn.at[:, tr.nt_fbri].set(1.0)
    for it in range(tr.n_aero):
        a0 = tr.nt_aero + 4 * it
        trcrn = trcrn.at[:, a0:a0 + 4].set(1.0e-8 * (1.0 + it))
    for s in tr.nt_bgc:
        trcrn = trcrn.at[:, s].set(
            jnp.asarray(0.5 + rng.random((ncat,) + B)))
    return aicen, vicen, vsnon, trcrn


def _aero_mass(tr, vicen, vsnon, trcrn):
    return np.asarray(jnp.sum(
        itd._aero_mass_per_cat(tr, vicen, vsnon, trcrn), axis=1))


def _pond_vol(tr, aicen, trcrn):
    return np.asarray(jnp.sum(
        itd._pond_volume_per_cat(tr, aicen, trcrn, True), axis=0))


def _bio_mass(tr, aicen, trcrn):
    return np.asarray(jnp.sum(
        itd._bgc_mass_per_cat(tr, aicen, trcrn), axis=1))


class TestZapBudget:
    def test_zap_routes_all_tracers(self):
        """The zap stage (snow-temperature zap + small-area zap, the
        cleanup_itd tail) routes every aux-tracer load to the ocean
        fluxes exactly. (Measured downstream of rebin: the rebin
        amounts->values roundtrip zeroes sub-puny-category residues by
        reference semantics — compute_tracers' aicen>puny gate,
        ice_itd.F90:1359-1501 — which is a separate, bounded-by-puny
        behavior, not the zap budget under test.)"""
        cfg = _cfg_all()
        tr = build_tracer_registry(cfg)
        aicen, vicen, vsnon, trcrn = _state(tr, cfg, tiny_cat=2)
        m0a = _aero_mass(tr, vicen, vsnon, trcrn)
        p0 = _pond_vol(tr, aicen, trcrn)
        b0 = _bio_mass(tr, aicen, trcrn)
        vsnon2, trcrn2, _fr, _fh, dfaero_s = itd.zap_snow_temperature(
            DT, tr, cfg.nslyr, aicen=aicen, vsnon=vsnon, trcrn=trcrn)
        cl = itd.zap_small_areas(DT, tr, cfg.nilyr, cfg.nslyr,
                                 aicen=aicen, vicen=vicen, vsnon=vsnon2,
                                 trcrn=trcrn2, tr_pond_topo=True)
        m1a = _aero_mass(tr, cl.vicen, cl.vsnon, cl.trcrn)
        p1 = _pond_vol(tr, cl.aicen, cl.trcrn)
        b1 = _bio_mass(tr, cl.aicen, cl.trcrn)
        dfaero = np.asarray(cl.dfaero) + np.asarray(dfaero_s)
        # the zapped category's load shows up as ocean flux, exactly
        np.testing.assert_allclose(m0a - m1a, dfaero * DT,
                                   rtol=1e-6, atol=1e-22)
        np.testing.assert_allclose(p0 - p1, np.asarray(cl.dfpond),
                                   rtol=1e-6, atol=1e-18)
        np.testing.assert_allclose(b0 - b1, np.asarray(cl.dflux_bio) * DT,
                                   rtol=1e-6, atol=1e-15)
        assert float(np.abs(dfaero).max()) > 0.0
        assert float(np.asarray(cl.dfpond).max()) > 0.0
        assert bool(np.asarray(cl.zapped)[2].all())

    def test_renorm_routes_excess(self):
        """aice > 1 renormalization returns the scaled-away pond/aero/bio
        load to the ocean (ice_itd.F90:2028-2160 analog)."""
        cfg = _cfg_all()
        tr = build_tracer_registry(cfg)
        aicen, vicen, vsnon, trcrn = _state(tr, cfg)
        aicen = aicen * (1.0 + 0.5 * ct.puny) / jnp.sum(aicen, axis=0)
        m0a = _aero_mass(tr, vicen, vsnon, trcrn)
        b0 = _bio_mass(tr, aicen, trcrn)
        out = itd.zap_small_areas(DT, tr, cfg.nilyr, cfg.nslyr,
                                  aicen=aicen, vicen=vicen, vsnon=vsnon,
                                  trcrn=trcrn, tr_pond_topo=True)
        m1a = _aero_mass(tr, out.vicen, out.vsnon, out.trcrn)
        b1 = _bio_mass(tr, out.aicen, out.trcrn)
        np.testing.assert_allclose(m0a - m1a, np.asarray(out.dfaero) * DT,
                                   rtol=1e-6, atol=1e-22)
        np.testing.assert_allclose(b0 - b1, np.asarray(out.dflux_bio) * DT,
                                   rtol=1e-6, atol=1e-13)
        assert float(np.asarray(jnp.sum(out.aicen, axis=0)).max()) \
            <= 1.0 + 1e-12


class TestLateralMeltBudget:
    def test_routes_all_tracers(self):
        cfg = _cfg_all()
        tr = build_tracer_registry(cfg)
        aicen, vicen, vsnon, trcrn = _state(tr, cfg)
        rside = jnp.asarray(np.linspace(0.0, 0.6, 8))
        m0a = _aero_mass(tr, vicen, vsnon, trcrn)
        p0 = _pond_vol(tr, aicen, trcrn)
        b0 = _bio_mass(tr, aicen, trcrn)
        lm = itd.lateral_melt(DT, tr, cfg.nilyr, cfg.nslyr, aicen=aicen,
                              vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                              rside=rside, tr_pond_topo=True)
        m1a = _aero_mass(tr, lm.vicen, lm.vsnon, trcrn)
        p1 = _pond_vol(tr, lm.aicen, trcrn)
        b1 = _bio_mass(tr, lm.aicen, trcrn)
        np.testing.assert_allclose(m0a - m1a, np.asarray(lm.dfaero) * DT,
                                   rtol=1e-9, atol=1e-22)
        np.testing.assert_allclose(p0 - p1, np.asarray(lm.dfpond),
                                   rtol=1e-9, atol=1e-15)
        np.testing.assert_allclose(b0 - b1, np.asarray(lm.dflux_bio) * DT,
                                   rtol=1e-9, atol=1e-13)
        assert float(np.asarray(lm.dfaero)[:, -1].min()) > 0.0


class TestRidgeBudget:
    def test_aero_pond_bio_routed(self):
        from cice5_tpu.models.dynamics.ridge import ridge_ice
        cfg = _cfg_all()
        tr = build_tracer_registry(cfg)
        aicen, vicen, vsnon, trcrn = _state(tr, cfg, B=(4, 8))
        # compress a nearly-full pack so ridging definitely runs
        aicen = aicen * 0.95 / jnp.sum(aicen, axis=0)
        aice0 = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0)
        B = aicen.shape[1:]
        rr = ridge_ice(DT, tr, itd.category_bounds(cfg.ncat), cfg.nilyr,
                       cfg.nslyr, aicen=aicen, vicen=vicen, vsnon=vsnon,
                       trcrn=trcrn, aice0=aice0,
                       rdg_conv=jnp.full(B, 1.0e-6),
                       rdg_shear=jnp.zeros(B), tr_pond_topo=True)
        m0a = _aero_mass(tr, vicen, vsnon, trcrn)
        m1a = _aero_mass(tr, rr.vicen, rr.vsnon, rr.trcrn)
        p0 = _pond_vol(tr, aicen, trcrn)
        p1 = _pond_vol(tr, rr.aicen, rr.trcrn)
        b0 = _bio_mass(tr, aicen, trcrn)
        b1 = _bio_mass(tr, rr.aicen, rr.trcrn)
        assert float(rr.dardg1dt.max()) > 0.0    # ridging happened
        np.testing.assert_allclose(m0a - m1a,
                                   np.asarray(rr.faero_ocn) * DT,
                                   rtol=1e-7, atol=1e-22)
        np.testing.assert_allclose(p0 - p1, np.asarray(rr.dfpond),
                                   rtol=1e-7, atol=1e-14)
        np.testing.assert_allclose(b0 - b1,
                                   np.asarray(rr.dflux_bio) * DT,
                                   rtol=1e-7, atol=1e-12)
        assert float(np.abs(np.asarray(rr.faero_ocn)).max()) > 0.0
        assert float(np.asarray(rr.dfpond).max()) > 0.0


class TestAddNewIceBudget:
    def _run(self, frzmlt_val, tr_cfg=None):
        cfg = _cfg_all()
        tr = build_tracer_registry(cfg)
        aicen, vicen, vsnon, trcrn = _state(tr, cfg)
        B = aicen.shape[1:]
        aice = jnp.sum(aicen, axis=0)
        aice0 = jnp.maximum(1.0 - aice, 0.0)
        salinz = thshared.salinity_profile(cfg.nilyr, 3.2, 0.407, 0.573)
        from cice5_tpu.models.tracers.algae import default_ocean_bio
        ob = default_ocean_bio(tr, B, jnp.float64)
        nir = itd.add_new_ice(
            DT, tr, itd.category_bounds(cfg.ncat), cfg.nilyr,
            aicen=aicen, vicen=vicen, trcrn=trcrn, aice=aice,
            aice0=aice0, frzmlt=jnp.full(B, frzmlt_val),
            Tf=jnp.full(B, -1.8), salinz=salinz, tr_FY=True, tr_lvl=True,
            tr_iage=True, ktherm=2, sss=jnp.full(B, 34.0),
            tr_brine=True, ocean_bio=ob, initbio_frac=0.8)
        return tr, (aicen, vicen, vsnon, trcrn), nir, ob

    def test_frazil_conserves_aero_and_brine(self):
        tr, (aicen, vicen, vsnon, trcrn), nir, ob = self._run(400.0)
        assert float(nir.frazil.min()) > 0.0
        # new ice is aerosol-free: ice-aerosol mass unchanged by growth
        m0 = _aero_mass(tr, vicen, vsnon, trcrn)
        m1 = _aero_mass(tr, nir.vicen, vsnon, nir.trcrn)
        np.testing.assert_allclose(m1, m0, rtol=1e-10, atol=1e-25)
        # brine volume: sum fbri*vicen grows by exactly the frazil volume
        vb0 = np.asarray(jnp.sum(trcrn[:, tr.nt_fbri] * vicen, axis=0))
        vb1 = np.asarray(jnp.sum(nir.trcrn[:, tr.nt_fbri] * nir.vicen,
                                 axis=0))
        np.testing.assert_allclose(vb1 - vb0, np.asarray(nir.frazil),
                                   rtol=1e-9, atol=1e-12)

    def test_frazil_bio_uptake_balances_ocean_flux(self):
        tr, (aicen, vicen, vsnon, trcrn), nir, ob = self._run(400.0)
        b0 = _bio_mass(tr, aicen, trcrn)
        b1 = _bio_mass(tr, nir.aicen, nir.trcrn)
        # ice gain == -flux_bio*dt (flux_bio < 0 = ocean loses)
        np.testing.assert_allclose(b1 - b0,
                                   -np.asarray(nir.flux_bio) * DT,
                                   rtol=1e-9, atol=1e-15)
        assert float(np.asarray(nir.flux_bio).max()) <= 0.0
        assert float(np.asarray(nir.flux_bio).min()) < 0.0

    def test_no_frazil_no_change(self):
        tr, (aicen, vicen, vsnon, trcrn), nir, ob = self._run(-200.0)
        assert float(np.abs(np.asarray(nir.flux_bio)).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(nir.vicen),
                                      np.asarray(vicen))


def _budget_model(frzmlt_val, Tair_val, sst_val, hi=None):
    """Full-ice-cover rect model (no motion: winds/currents zeroed) with
    aerosols on, f64, prescribed uniform forcing."""
    from cice5_tpu.driver.model import Model
    cfg = rect_config(ny=16, nx=24)
    cfg = cfg.replace(
        tracers=dataclasses.replace(cfg.tracers, tr_aero=True, n_aero=NA),
        dyn=dataclasses.replace(cfg.dyn, ndte=12),
        dtype="float64", accum_dtype="float64")
    m = Model(cfg)
    f = m.forcing_at(0)
    z = jnp.zeros(m.grid.shape, jnp.float64)
    f = dataclasses.replace(
        f, uatm=z, vatm=z, wind=z, uocn=z, vocn=z, ss_tltx=z, ss_tlty=z,
        fsnow=z + 1e-6, frain=z,
        Tair=z + Tair_val, potT=z + Tair_val,
        sst=z + sst_val, frzmlt=z + frzmlt_val,
        faero_atm=jnp.zeros((NA,) + m.grid.shape, jnp.float64))
    st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    if hi is not None:  # thin ice for fast melt-out
        st = st.replace(vicen=st.aicen * hi, vsnon=st.aicen * 0.02)
    a0 = m.tr.nt_aero
    st = st.replace(trcrn=st.trcrn.at[:, a0:a0 + 4 * NA].set(1.0e-8))
    return m, st, f


def _global_aero_mass(m, st):
    tr = m.tr
    return np.asarray(jnp.sum(
        itd._aero_mass_per_cat(tr, st.vicen, st.vsnon, st.trcrn),
        axis=(1, 2, 3)))


@pytest.mark.parametrize("scenario", ["meltout", "frazil"])
def test_full_step_aerosol_budget(scenario):
    """Global aerosol budget over full model steps:
    d(mass) == -faero_ocn*dt exactly (deposition zeroed), with melt-out
    (warm ocean+air, thin ice, lateral melt + zaps) or frazil growth
    (cold, frzmlt>0; fails without the new-ice dilution)."""
    if scenario == "meltout":
        m, st, f = _budget_model(frzmlt_val=-400.0, Tair_val=278.0,
                                 sst_val=1.0, hi=0.06)
    else:
        m, st, f = _budget_model(frzmlt_val=400.0, Tair_val=250.0,
                                 sst_val=-1.8)
    melted = False
    m_init = _global_aero_mass(m, st)
    for k in range(4):
        m0 = _global_aero_mass(m, st)
        st, diag = m.step(st, f)
        m1 = _global_aero_mass(m, st)
        sink = np.asarray(jnp.sum(diag.faero_ocn, axis=(1, 2))) * \
            m.cfg.time.dt
        np.testing.assert_allclose(m1 - m0, -sink, rtol=1e-9,
                                   atol=1e-13 * max(1.0, m0.max() * 1e8))
        melted = melted or sink.max() > 0.0
    if scenario == "meltout":
        assert melted          # the scenario actually exercised the sink
        assert _global_aero_mass(m, st).sum() < m_init.sum()
    else:
        assert float(np.asarray(diag.frazil).max()) > 0.0
