"""Aerosol tracer tests: conservation (deposition - ocean flux = mass
change), deposition routing (snow vs bare ice), melt scavenging, melt-out,
and a full-step smoke run with tr_aero on."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import constants as ct
from cice5_tpu.models.tracers.aerosol import (AerosolResult, faero_default,
                                              update_aerosol)

NA = 3
DT = 3600.0


def _mass(res_or_pair, vsnon, vicen):
    if isinstance(res_or_pair, AerosolResult):
        asno, aice = res_or_pair.aerosno, res_or_pair.aeroice
    else:
        asno, aice = res_or_pair
    return (jnp.sum(asno * vsnon[None, None], axis=1)
            + jnp.sum(aice * vicen[None, None], axis=1))


def _base(B=(4,), hi=1.0, hs=0.1, ai=0.8, conc=1.0e-9):
    f = lambda v: jnp.full(B, float(v), jnp.float64)
    kw = dict(
        meltt=f(0.0), melts=f(0.0), meltb=f(0.0), congel=f(0.0),
        snoice=f(0.0), fsnow=f(0.0),
        aerosno=jnp.full((NA, 2) + B, conc, jnp.float64),
        aeroice=jnp.full((NA, 2) + B, conc, jnp.float64),
        aice_old=f(ai), vice_old=f(ai * hi), vsno_old=f(ai * hs),
        aicen=f(ai), vicen=f(ai * hi), vsnon=f(ai * hs),
        faero_atm=jnp.zeros((NA,) + B, jnp.float64),
        nilyr=7, nslyr=1)
    return kw


class TestAerosol:
    def test_no_change_without_forcing(self):
        kw = _base()
        r = update_aerosol(DT, **kw)
        m0 = _mass((kw["aerosno"], kw["aeroice"]),
                   kw["vsno_old"], kw["vice_old"])
        m1 = _mass(r, kw["vsnon"], kw["vicen"])
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-12)
        assert float(jnp.max(jnp.abs(r.faero_ocn))) == 0.0

    @pytest.mark.parametrize("scenario", ["melts", "meltt", "meltb",
                                          "snoice", "deposition"])
    def test_conservation(self, scenario):
        """d(mass) == (faero_atm*aicen - faero_ocn)*dt
        (the reference's internal check, ice_aerosol.F90:552-566)."""
        kw = _base()
        if scenario == "melts":
            kw["melts"] = jnp.full((4,), 0.03)
            kw["vsnon"] = kw["vsno_old"] - kw["aicen"] * 0.03
        elif scenario == "meltt":
            kw["meltt"] = jnp.full((4,), 0.05)
            kw["vicen"] = kw["vice_old"] - kw["aicen"] * 0.05
        elif scenario == "meltb":
            kw["meltb"] = jnp.full((4,), 0.05)
            kw["vicen"] = kw["vice_old"] - kw["aicen"] * 0.05
        elif scenario == "snoice":
            kw["snoice"] = jnp.full((4,), 0.02)
            kw["vicen"] = kw["vice_old"] + kw["aicen"] * 0.02
            kw["vsnon"] = (kw["vsno_old"]
                           - kw["aicen"] * 0.02 * ct.rhoi / ct.rhos)
        elif scenario == "deposition":
            kw["faero_atm"] = faero_default(NA, (4,), jnp.float64)
        r = update_aerosol(DT, **kw)
        m0 = _mass((kw["aerosno"], kw["aeroice"]),
                   kw["vsno_old"], kw["vice_old"])
        m1 = _mass(r, kw["vsnon"], kw["vicen"])
        expect = (kw["faero_atm"] * kw["aicen"][None]
                  - r.faero_ocn) * DT
        np.testing.assert_allclose(np.asarray(m1 - m0), np.asarray(expect),
                                   atol=1e-18, rtol=1e-9)

    def test_melt_scavenges_to_ocean(self):
        kw = _base()
        kw["melts"] = jnp.full((4,), 0.03)
        kw["vsnon"] = kw["vsno_old"] - kw["aicen"] * 0.03
        r = update_aerosol(DT, **kw)
        assert float(jnp.min(r.faero_ocn)) > 0.0
        # species 2 (black carbon-like, kscav=0.2) scavenges hardest
        assert float(jnp.min(r.faero_ocn[1] - r.faero_ocn[0])) > 0.0

    def test_deposition_routing(self):
        dep = faero_default(NA, (4,), jnp.float64)
        # with snow: into snow SSL
        kw = _base(hs=0.1, conc=0.0)
        kw["faero_atm"] = dep
        r = update_aerosol(DT, **kw)
        m_snow = jnp.sum(r.aerosno * kw["vsnon"][None, None], axis=1)
        np.testing.assert_allclose(
            np.asarray(m_snow), np.asarray(dep * kw["aicen"] * DT),
            rtol=1e-9)
        # bare ice: into ice SSL
        kw = _base(hs=0.0, conc=0.0)
        kw["faero_atm"] = dep
        r = update_aerosol(DT, **kw)
        m_ice = jnp.sum(r.aeroice * kw["vicen"][None, None], axis=1)
        np.testing.assert_allclose(
            np.asarray(m_ice), np.asarray(dep * kw["aicen"] * DT),
            rtol=1e-9)

    def test_total_meltout_flushes_to_ocean(self):
        kw = _base(hi=0.05, hs=0.01)
        kw["meltb"] = jnp.full((4,), 0.05)
        kw["melts"] = jnp.full((4,), 0.01)
        kw["vicen"] = jnp.zeros((4,))
        kw["vsnon"] = jnp.zeros((4,))
        kw["aicen"] = jnp.zeros((4,))
        m0 = _mass((kw["aerosno"], kw["aeroice"]),
                   kw["vsno_old"], kw["vice_old"])
        r = update_aerosol(DT, **kw)
        np.testing.assert_allclose(np.asarray(r.faero_ocn * DT),
                                   np.asarray(m0), rtol=1e-9)

    def test_inactive_cells_untouched(self):
        kw = _base(ai=0.0, hi=0.0, hs=0.0)
        kw["aice_old"] = jnp.zeros((4,))
        kw["faero_atm"] = faero_default(NA, (4,), jnp.float64)
        r = update_aerosol(DT, **kw)
        assert float(jnp.max(jnp.abs(r.faero_ocn))) == 0.0


class TestAerosolStep:
    def test_full_step_smoke(self):
        """One full model step with tr_aero: finite, non-negative tracers,
        deposition shows up in the ice pack."""
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=24, nx=32),
            tracers=dataclasses.replace(cfg.tracers, tr_aero=True, n_aero=3),
            dyn=dataclasses.replace(cfg.dyn, ndte=20),
        )
        m = Model(cfg)
        # this small rectgrid never reaches 70N: seed ice everywhere
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        a0 = m.tr.nt_aero
        assert a0 >= 0
        st, diag = m.step(st, m.forcing_at(0))
        aero = np.asarray(st.trcrn[:, a0:a0 + 12])
        assert np.isfinite(aero).all()
        assert aero.min() >= -ct.puny
        # deposition put some aerosol into ice cells
        assert float(np.max(aero)) > 0.0
        assert diag.faero_ocn.shape[0] == 3
