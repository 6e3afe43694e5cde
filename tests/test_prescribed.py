"""Prescribed-ice mode tests: concentration override into the correct
category, fresh-cell thermo initialization, clearing where data is
ice-free, and a thermo-only step on the prescribed state."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.config import rect_config
from cice5_tpu.driver.model import Model
from cice5_tpu.models.prescribed import prescribe_ice


def _model():
    cfg = rect_config()
    cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, ny=16, nx=20),
                      dyn=dataclasses.replace(cfg.dyn, kdyn=0,
                                              advection="none"))
    return Model(cfg)


class TestPrescribed:
    def test_cover_set_in_thickness_category(self):
        m = _model()
        st = m.init_state(ice_mask=np.zeros((16, 20), bool))  # no ice
        cov = jnp.full((16, 20), 0.8)
        Tf = jnp.full((16, 20), -1.8)
        out = prescribe_ice(st, cov, m.grid, m.tr, m.cfg, m.hin_max, Tf)
        a = np.asarray(out.aicen)
        tm = np.asarray(m.grid.tmask)
        # concentration lands in exactly one category (hi=2m -> cat with
        # hin_max bracketing 2.0)
        target = next(n for n in range(m.cfg.ncat)
                      if m.hin_max[n] < 2.0 < m.hin_max[n + 1])
        np.testing.assert_allclose(a[target][tm], 0.8, rtol=1e-6)
        for n in range(m.cfg.ncat):
            if n != target:
                assert np.abs(a[n][tm]).max() == 0.0
        # thickness = 2 m
        v = np.asarray(out.vicen)
        np.testing.assert_allclose(v[target][tm] / a[target][tm], 2.0,
                                   rtol=1e-6)
        # fresh cells got a physical enthalpy profile
        q = np.asarray(out.trcrn[target, m.tr.nt_qice])
        assert (q[tm] < 0).all()

    def test_clears_ice_free_cells(self):
        m = _model()
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        cov = jnp.zeros((16, 20))
        Tf = jnp.full((16, 20), -1.8)
        out = prescribe_ice(st, cov, m.grid, m.tr, m.cfg, m.hin_max, Tf)
        assert float(jnp.max(out.aicen)) == 0.0
        assert float(jnp.max(out.vicen)) == 0.0
        np.testing.assert_allclose(
            np.asarray(out.trcrn[:, m.tr.nt_Tsfc]), -1.8, rtol=1e-6)

    def test_thermo_step_on_prescribed_state(self):
        m = _model()
        st = m.init_state(ice_mask=np.zeros((16, 20), bool))
        cov = jnp.full((16, 20), 0.9)
        Tf = jnp.full((16, 20), -1.8)
        st = prescribe_ice(st, cov, m.grid, m.tr, m.cfg, m.hin_max, Tf)
        st2, diag = m.step(st, m.forcing_at(0))
        assert np.isfinite(np.asarray(st2.vicen)).all()
        assert bool(diag.therm_converged)
        # prescribed cover persists through the thermo step and the surface
        # responds (winter: strong upward sensible/conductive fluxes)
        assert float(jnp.max(diag.aice)) > 0.85
        assert float(jnp.min(diag.fsens)) < -1.0
