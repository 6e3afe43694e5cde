"""calc_Tsfc=False (coupled prescribed-flux) tests: the know-Tsfc solver
reproduces the calc_Tsfc=True solution when fed its converged fluxes, cools
under prescribed negative flux, and a full step runs with coupler fluxes."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo import bl99, shared


def _solver_inputs(B=(8,), hi=1.5, hs=0.2, Tsf=-10.0, TairC=-20.0):
    f = lambda v: jnp.full(B, float(v), jnp.float64)
    nilyr, nslyr = 7, 1
    zSin = jnp.broadcast_to(
        shared.salinity_profile(nilyr, 3.2, 0.407, 0.573)[:, None],
        (nilyr,) + B)
    Tmlts = -zSin * ct.depressT
    zTin = jnp.linspace(-8.0, -2.0, nilyr)[:, None] * jnp.ones(B)
    zTin = jnp.minimum(zTin, Tmlts - 0.2)
    zTsn = jnp.full((nslyr,) + B, -12.0)
    hilyr = f(hi / nilyr)
    hslyr = f(hs / nslyr)
    einit = (jnp.sum(hslyr[None] * shared.snow_enthalpy(zTsn), 0)
             + jnp.sum(hilyr[None] * shared.ice_enthalpy(zTin, Tmlts, True),
                       0))
    return dict(
        nilyr=nilyr, nslyr=nslyr, conduct="bubbly", ksno=0.30,
        l_brine=True, mask=jnp.ones(B, bool), rhoa=f(1.3), flw=f(180.0),
        potT=f(TairC + ct.Tffresh), Qa=f(0.0002), shcoef=f(10.0),
        lhcoef=f(15.0), fswsfc=f(0.0), fswint=f(0.0),
        Sswabs=jnp.zeros((nslyr,) + B), Iswabs=jnp.zeros((nilyr,) + B),
        hilyr=hilyr, hslyr=hslyr, zTin=zTin, zSin=zSin, zTsn=zTsn,
        Tsf=f(Tsf), Tbot=f(-1.8), einit=einit)


class TestKnowTsfc:
    def test_reproduces_calc_tsfc_solution(self):
        kw = _solver_inputs()
        rT = bl99.temperature_changes(3600.0, **kw)
        assert bool(jnp.all(rT.converged))
        rF = bl99.temperature_changes(
            3600.0, **kw, calc_Tsfc=False,
            fsurfn_f=rT.fsurfn, fcondtopn_f=rT.fcondtopn,
            flatn_f=rT.flatn, fsensn_f=rT.fsensn)
        assert bool(jnp.all(rF.converged))
        # interior temperatures agree closely with the coupled-flux solve
        np.testing.assert_allclose(np.asarray(rF.zTin),
                                   np.asarray(rT.zTin), atol=2e-2)
        np.testing.assert_allclose(np.asarray(rF.zTsn),
                                   np.asarray(rT.zTsn), atol=5e-2)
        np.testing.assert_allclose(np.asarray(rF.fcondbot),
                                   np.asarray(rT.fcondbot), atol=0.5)

    def test_cooling_flux_cools_ice(self):
        kw = _solver_inputs()
        B = (8,)
        f = lambda v: jnp.full(B, float(v), jnp.float64)
        r = bl99.temperature_changes(
            3600.0, **kw, calc_Tsfc=False,
            fsurfn_f=f(-50.0), fcondtopn_f=f(-50.0),
            flatn_f=f(0.0), fsensn_f=f(0.0))
        assert bool(jnp.all(r.converged))
        # strong upward conduction: snow layer cools
        assert float(jnp.max(r.zTsn - kw["zTsn"])) < 0.0

    def test_zero_flux_relaxes_profile(self):
        kw = _solver_inputs()
        B = (8,)
        f = lambda v: jnp.full(B, float(v), jnp.float64)
        r = bl99.temperature_changes(
            3600.0, **kw, calc_Tsfc=False,
            fsurfn_f=f(0.0), fcondtopn_f=f(0.0),
            flatn_f=f(0.0), fsensn_f=f(0.0))
        assert bool(jnp.all(r.converged))
        assert np.isfinite(np.asarray(r.zTin)).all()


class TestStepCalcTsfcOff:
    def test_full_step_with_coupler_fluxes(self):
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=16, nx=20),
            thermo=dataclasses.replace(cfg.thermo, calc_Tsfc=False),
            dyn=dataclasses.replace(cfg.dyn, ndte=10))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        ncat, (ny, nx) = cfg.ncat, m.grid.shape
        fc = lambda v: jnp.full((ncat, ny, nx), float(v), jnp.float32)
        f = m.forcing_at(0).replace(
            fsurfn_f=fc(-30.0), fcondtopn_f=fc(-30.0),
            flatn_f=fc(-2.0), fsensn_f=fc(-10.0))
        st, diag = m.step(st, f)
        assert np.isfinite(np.asarray(st.vicen)).all()
        assert bool(diag.therm_converged)
        # upward conduction in winter: ice grows at the bottom
        assert float(jnp.max(diag.congel)) > 0.0


class TestMushyCalcTsfcOff:
    def test_mushy_ignores_prescribed_fluxes_like_reference(self):
        """ktherm=2 + calc_Tsfc=False: the reference has no prescribed-flux
        mushy matrices — temperature_changes_salinity runs unconditionally
        and the coupler fluxes are not consumed by the solver
        (ice_therm_vertical.F90:316-343). The step must run and produce
        the SAME thermo state as calc_Tsfc=True."""
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        base = rect_config()
        base = base.replace(
            grid=dataclasses.replace(base.grid, ny=12, nx=16),
            thermo=dataclasses.replace(base.thermo, ktherm=2),
            dyn=dataclasses.replace(base.dyn, ndte=8))
        cfg_on = base
        cfg_off = base.replace(
            thermo=dataclasses.replace(base.thermo, ktherm=2,
                                       calc_Tsfc=False))
        m_on = Model(cfg_on)
        m_off = Model(cfg_off)
        st = m_on.init_state(ice_mask=np.asarray(m_on.grid.tmask))
        ncat, (ny, nx) = base.ncat, m_on.grid.shape
        fc = lambda v: jnp.full((ncat, ny, nx), float(v), jnp.float32)
        f_on = m_on.forcing_at(0)
        f_off = f_on.replace(fsurfn_f=fc(-30.0), fcondtopn_f=fc(-30.0),
                             flatn_f=fc(-2.0), fsensn_f=fc(-10.0))
        st_on, d_on = m_on.step(st, f_on)
        st_off, d_off = m_off.step(st, f_off)
        np.testing.assert_allclose(np.asarray(st_off.vicen),
                                   np.asarray(st_on.vicen), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(st_off.trcrn[:, m_on.tr.nt_Tsfc]),
            np.asarray(st_on.trcrn[:, m_on.tr.nt_Tsfc]), atol=1e-5)
