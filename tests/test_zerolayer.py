"""Zero-layer (ktherm=0) thermo tests: surface-balance consistency
(fcondtop == fsurf for cold surfaces), analytic steady-state check, growth
in winter, full-step smoke."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo.zerolayer import (KSEAICE,
                                               zerolayer_temperature)


def _inputs(B=(8,), hi=1.5, hs=0.2, TairC=-20.0, fsw=0.0):
    f = lambda v: jnp.full(B, float(v), jnp.float64)
    return dict(
        mask=jnp.ones(B, bool), rhoa=f(1.3), flw=f(180.0),
        potT=f(TairC + ct.Tffresh), Qa=f(0.0002),
        shcoef=f(10.0), lhcoef=f(15.0), fswsfc=f(fsw),
        hilyr=f(hi / 7), hslyr=f(hs), nilyr=7, nslyr=1,
        Tsf=f(-10.0), Tbot=f(-1.8))


class TestZeroLayer:
    def test_converges_and_balances(self):
        kw = _inputs()
        r = zerolayer_temperature(3600.0, **kw)
        assert bool(jnp.all(r.converged))
        Tsf = np.asarray(r.Tsf)
        assert (Tsf <= 0.0).all()
        # cold surface: fcondtop == fsurf (the zero-layer closure,
        # ice_therm_0layer.F90:436-449)
        cold = Tsf < -ct.puny
        np.testing.assert_allclose(np.asarray(r.fcondtopn)[cold],
                                   np.asarray(r.fsurfn)[cold], atol=1e-6)
        # conduction through the slab is uniform: fcondbot == fcondtop
        np.testing.assert_array_equal(np.asarray(r.fcondbot),
                                      np.asarray(r.fcondtopn))

    def test_effective_conductivity(self):
        """Steady solution satisfies fcondtop = kh (Tsf - Tbot) with
        kh = kseaice / (hi + hs*kseaice/ksno)."""
        kw = _inputs(hs=0.1)
        ksno = 0.30
        r = zerolayer_temperature(3600.0, **kw, ksno=ksno)
        heff = 1.5 + 0.1 * KSEAICE / ksno
        kh = KSEAICE / heff
        np.testing.assert_allclose(
            np.asarray(r.fcondtopn),
            kh * (np.asarray(r.Tsf) - (-1.8)), rtol=1e-6)

    def test_thicker_ice_colder_surface(self):
        thin = zerolayer_temperature(3600.0, **_inputs(hi=0.5))
        thick = zerolayer_temperature(3600.0, **_inputs(hi=3.0))
        # thick ice insulates: surface is colder (closer to air temp)
        assert float(jnp.mean(thick.Tsf)) < float(jnp.mean(thin.Tsf))

    def test_warm_forcing_melting_surface(self):
        kw = _inputs(TairC=5.0, fsw=300.0)
        r = zerolayer_temperature(3600.0, **kw)
        assert bool(jnp.all(r.converged))
        assert float(jnp.max(r.Tsf)) <= 0.0
        # at the melting point the net surface flux exceeds conduction
        melt = np.asarray(r.Tsf) > -ct.puny
        assert melt.any()
        assert (np.asarray(r.fsurfn)[melt]
                >= np.asarray(r.fcondtopn)[melt] - 1e-6).all()


class TestZeroLayerStep:
    def test_full_step_smoke(self):
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=24, nx=32),
            thermo=dataclasses.replace(cfg.thermo, ktherm=0),
            dyn=dataclasses.replace(cfg.dyn, ndte=20))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        v0 = float(jnp.sum(st.vicen))
        for k in range(3):
            st, diag = m.step(st, m.forcing_at(k))
        assert np.isfinite(np.asarray(st.vicen)).all()
        assert bool(diag.therm_converged)
        # midwinter (yday 1, cold): ice grows
        assert float(jnp.sum(st.vicen)) > v0
