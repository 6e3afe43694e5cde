"""Full-step integration tests: the gx3-analog standalone run (milestone B
smoke test, SURVEY.md section 7 stage 4) — stability, conservation budget
closure, and decomposition invariance of one full step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import ModelConfig, constants as ct
from cice5_tpu.config import (DynConfig, ForcingConfig, GridConfig,
                              ThermoConfig, TimeConfig)
from cice5_tpu.driver.model import Model


def small_model(nx=32, ny=28, advection="upwind", kdyn=1,
                oceanmixed=True):
    cfg = ModelConfig(
        grid=GridConfig(nx=nx, ny=ny, dx_const=30000.0, dy_const=30000.0,
                        lat0=55.0),
        dyn=DynConfig(kdyn=kdyn, ndte=40, advection=advection, kstrength=0),
        forcing=ForcingConfig(oceanmixed_ice=oceanmixed, natmiter=3),
        time=TimeConfig(dt=3600.0),
        dtype="float64", accum_dtype="float64")
    return Model(cfg)


class TestFullStep:
    def test_two_day_run_stable(self):
        m = small_model()
        # put ice everywhere ocean is (idealized polar basin). Pin the
        # slab mixed layer at freezing: the synthetic forcing blends sst
        # up to ~0.6 K above Tf at 55N ((1-latw)^2 ramp, forcing.py), and
        # a warm-start slab bottom-melts for days — correct physics, but
        # it would mask the winter-growth assertion below.
        Tf = -ct.depressT * float(np.asarray(m.forcing_at(0).sss).mean())
        state = m.init_state(ice_mask=np.asarray(m.grid.tmask),
                             sst=jnp.full(m.grid.shape, Tf,
                                          m.cfg.xp_dtype))
        v0 = float(jnp.sum(state.vicen * m.grid.tarea))
        for k in range(48):
            forcing = m.forcing_at(k)
            state, diag = m.step(state, forcing)
        a = np.asarray(state.aicen)
        assert np.isfinite(np.asarray(state.vicen)).all()
        assert np.isfinite(np.asarray(state.uvel)).all()
        assert (a >= -1e-12).all()
        aice = a.sum(0)
        assert (aice <= 1.0 + 1e-9).all()
        assert bool(diag.therm_converged)
        assert float(diag.ferr_max) < 2e-3
        # winter (yday ~ 1): ice should be growing
        v1 = float(jnp.sum(state.vicen * m.grid.tarea))
        assert v1 > v0
        # velocities bounded by physics (< 1 m/s)
        assert float(jnp.max(jnp.abs(state.uvel))) < 1.0

    def test_fresh_water_salt_budget_signs(self):
        m = small_model()
        state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        forcing = m.forcing_at(0)
        state, diag = m.step(state, forcing)
        # growing winter ice: salt rejected to ocean (fsalt > 0 somewhere)
        ocean = np.asarray(m.grid.tmask)
        assert np.asarray(diag.congel)[ocean].max() > 0.0
        assert np.isfinite(np.asarray(diag.fresh)).all()
        assert np.isfinite(np.asarray(diag.fhocn)).all()

    def test_no_dynamics_config(self):
        m = small_model(kdyn=0)
        state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        for k in range(4):
            state, diag = m.step(state, m.forcing_at(k))
        np.testing.assert_array_equal(np.asarray(state.uvel), 0.0)
        assert np.isfinite(np.asarray(state.vicen)).all()

    def test_ice_free_start_grows_frazil(self):
        """Start with no ice in a freezing ocean: frazil must appear."""
        m = small_model()
        state = m.init_state(ice_mask=np.zeros((28, 32), bool))
        # slab ocean starts at freezing; cold atmosphere extracts heat
        for k in range(24):
            state, diag = m.step(state, m.forcing_at(k))
        assert float(jnp.sum(state.aicen)) > 0.0
        assert float(jnp.max(diag.frazil)) >= 0.0


class TestStepDecompositionInvariance:
    def test_one_step_matches_sharded(self):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from cice5_tpu.parallel import make_mesh
        from cice5_tpu.driver.step import step as step_raw
        from cice5_tpu.parallel.mesh import mesh_topology
        from functools import partial

        m = small_model(nx=32, ny=28)
        state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        forcing = m.forcing_at(0)
        ref_state, ref_diag = m.step(state, forcing)

        mesh = make_mesh(ny=28, nx=32, shape=(2, 4))
        mtopo = mesh_topology(mesh, ew=m.cfg.grid.ew_boundary,
                              ns=m.cfg.grid.ns_boundary)
        fn = partial(step_raw, cfg=m.cfg, tr=m.tr, topo=mtopo,
                     hin_max=m.hin_max, salinz=m.salinz)

        def spec_of(x):
            n = getattr(x, "ndim", 0)
            if n >= 2:
                return P(*([None] * (n - 2)), "Y", "X")
            return P()
        in_specs = (jax.tree.map(spec_of, state),
                    jax.tree.map(spec_of, forcing),
                    jax.tree.map(spec_of, m.grid))
        out_shape = jax.eval_shape(lambda s, f, g: m.step(s, f)
                                   if False else (s, None), state, forcing,
                                   m.grid)
        # build out_specs from reference outputs' shapes
        out_specs = jax.tree.map(spec_of, (ref_state, ref_diag))

        run = jax.jit(shard_map(lambda s, f, g: fn(s, f, g), mesh=mesh,
                                in_specs=in_specs, out_specs=out_specs,
                                check_vma=False))
        out_state, out_diag = run(state, forcing, m.grid)

        # scale-aware f64 tolerances (README decomposition-invariance
        # doctrine): XLA fuses the single-device and per-shard programs
        # differently — ~1 ulp elementwise, amplified ~1e3 by the EVP
        # subcycles (measured ~4e-9 on uvel under jax 0.9). fhocn sits a
        # further amplification up the chain: fbot ~ ustar(|u-uocn|), so
        # the uvel noise is magnified ~1e3 again through the bottom-flux
        # derivative (measured ~3e-6; bit-identical with kdyn=0).
        np.testing.assert_allclose(np.asarray(out_state.vicen),
                                   np.asarray(ref_state.vicen), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out_state.uvel),
                                   np.asarray(ref_state.uvel), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out_state.trcrn),
                                   np.asarray(ref_state.trcrn), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_diag.fhocn),
                                   np.asarray(ref_diag.fhocn), atol=1e-5)


def test_step_itd_conservation_and_zerolayer_checks():
    """cfg.dyn.conserv_check folds linear_itd conservation violations and
    (ktherm=0) zerolayer_check into StepDiag.state_bad
    (ice_therm_itd.F90:783-860; ice_itd.F90:2428). A healthy step on a
    small basin must report state_bad == 0 under both configs."""
    import dataclasses
    from cice5_tpu.config import rect_config
    from cice5_tpu.driver.model import Model

    cfg = rect_config(32, 32)
    cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, conserv_check=True))
    m = Model(cfg)
    st = m.init_state(ice_mask=m.grid.tmask)
    st, diag = m.step(st, m.forcing_at(0))
    assert int(diag.state_bad) == 0

    cfg0 = rect_config(32, 32)
    cfg0 = cfg0.replace(
        thermo=dataclasses.replace(cfg0.thermo, ktherm=0),
        dyn=dataclasses.replace(cfg0.dyn, conserv_check=True))
    m0 = Model(cfg0)
    st0 = m0.init_state(ice_mask=m0.grid.tmask)
    st0, diag0 = m0.step(st0, m0.forcing_at(0))
    assert int(diag0.state_bad) == 0


def test_rollout_matches_sequential():
    """Model.rollout (lax.scan window, one dispatch) must reproduce the
    sequential per-step trajectory bit-for-bit, for both fixed and
    per-step stacked forcing."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from cice5_tpu.config import ForcingConfig, GridConfig, DynConfig
    from cice5_tpu.config import TimeConfig
    from cice5_tpu import ModelConfig
    from cice5_tpu.driver.model import Model

    cfg = ModelConfig(grid=GridConfig(nx=24, ny=20, lat0=71.0),
                      dyn=DynConfig(kdyn=1, ndte=20, advection="remap"),
                      forcing=ForcingConfig(oceanmixed_ice=True, natmiter=2),
                      time=TimeConfig(dt=3600.0), dtype="float64",
                      accum_dtype="float64")
    m = Model(cfg)
    s0 = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    f = m.forcing_at(0)
    s = s0
    for _ in range(3):
        s, _ = m.step(s, f)
    s_r, _ = m.rollout(s0, f, 3)
    s_r2, _ = m.rollout(s0, jax.tree.map(lambda x: jnp.stack([x] * 3), f), 3)
    for fld in dataclasses.fields(s):
        np.testing.assert_array_equal(np.asarray(getattr(s, fld.name)),
                                      np.asarray(getattr(s_r, fld.name)),
                                      err_msg=fld.name)
        np.testing.assert_array_equal(np.asarray(getattr(s, fld.name)),
                                      np.asarray(getattr(s_r2, fld.name)),
                                      err_msg="stacked " + fld.name)
