"""ShardedModel tests: multi-device step trajectory matches the
single-device Model (the Model-level decomposition-invariance oracle),
state stays sharded, gather works."""
import dataclasses

import jax
import numpy as np
import pytest

from cice5_tpu.config import rect_config
from cice5_tpu.driver.model import Model
from cice5_tpu.driver.sharded import ShardedModel


def _cfg(ny=16, nx=32):
    cfg = rect_config()
    return cfg.replace(grid=dataclasses.replace(cfg.grid, ny=ny, nx=nx),
                       dyn=dataclasses.replace(cfg.dyn, ndte=15))


class TestShardedModel:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
    def test_matches_single_device(self, mesh_shape):
        # f64: at f32 the ~1-ulp single-vs-sharded fusion differences,
        # amplified ~1e3 by the EVP subcycles and ~1e3 again through the
        # ustar->fbot chain, reach percent level on fhocn after 2 steps
        # (measured 0.03 abs under jax 0.9) — an f32 comparison can only
        # be a smoke test. f64 keeps this a real invariance oracle.
        cfg = _cfg().replace(dtype="float64", accum_dtype="float64")
        ref = Model(cfg)
        st_ref = ref.init_state(ice_mask=np.asarray(ref.grid.tmask))
        sm = ShardedModel(cfg, mesh_shape=mesh_shape)
        st_s = sm.put(st_ref)

        for k in range(2):
            st_ref, d_ref = ref.step(st_ref, ref.forcing_at(k))
            st_s, d_s = sm.step(st_s, sm.forcing_at(k))

        np.testing.assert_allclose(np.asarray(st_s.vicen),
                                   np.asarray(st_ref.vicen), atol=1e-8)
        np.testing.assert_allclose(np.asarray(st_s.uvel),
                                   np.asarray(st_ref.uvel), atol=1e-8)
        np.testing.assert_allclose(np.asarray(d_s.fhocn),
                                   np.asarray(d_ref.fhocn), atol=1e-5)

    def test_state_is_sharded(self):
        cfg = _cfg()
        sm = ShardedModel(cfg, mesh_shape=(2, 4))
        st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))
        shardings = st.aicen.sharding
        assert len(shardings.device_set) == 8
        # run + gather round-trip
        st = sm.run(st, 1)
        host = sm.gather(st)
        assert isinstance(host.aicen, np.ndarray)
        assert np.isfinite(host.aicen).all()


class TestShardedDriver:
    def test_run_with_history_restart_diags(self, tmp_path):
        """ShardedModel.run is feature-equivalent to Model.run: diags,
        history accumulation/write, restart dumps, and check_state all
        operate on the sharded state (VERDICT r1 item 9)."""
        import os
        import cice5_tpu.io.history as hmod
        from cice5_tpu.io import restart as restart_mod

        cfg = _cfg()
        sm = ShardedModel(cfg, mesh_shape=(2, 4))
        st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))
        fields = hmod.available_fields(cfg, sm.tr)
        hs = hmod.HistoryStreams([hmod.HistoryStream(fields, freq="1",
                                                     freq_n=1,
                                                     suffix="inst")])
        logs = []
        st = sm.run(st, nsteps=2, diag_every=1, history=hs,
                    history_dir=str(tmp_path / "hist"),
                    restart_every=2, restart_dir=str(tmp_path / "rest"),
                    check_every=1, log=logs.append)
        assert any("area" in s for s in logs)          # runtime_diags ran
        hist = [f for f in os.listdir(tmp_path / "hist")]
        assert hist, "no history written from sharded run"
        rest = [f for f in os.listdir(tmp_path / "rest")
                if f.endswith(".npz")]
        assert rest, "no restart written from sharded run"
        # restart roundtrip: reload and continue one step
        st2, meta = restart_mod.restore(str(tmp_path / "rest" / rest[0]))
        st2 = sm.put(st2)
        st3, _ = sm.step(st2, sm.forcing_at(2))
        assert np.isfinite(np.asarray(st3.vicen)).all()

    def test_data_forcing_provider(self):
        """forcing_provider hook drives the sharded run from data."""
        import dataclasses
        from cice5_tpu.forcing_data import MonthlyForcing
        cfg = _cfg()
        sm = ShardedModel(cfg, mesh_shape=(2, 4))
        ny, nx = cfg.grid.ny, cfg.grid.nx
        Tair = 250.0 + 20.0 * np.sin(
            (np.arange(12) + 0.5) / 12 * 2 * np.pi)[:, None, None] \
            * np.ones((1, ny, nx))
        ds = MonthlyForcing(fields={"Tair": Tair}, atm_data_type="ncar")
        sm.forcing_provider = \
            lambda istep, info: ds.forcing_at(info.yday, sm.grid)
        st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))
        st = sm.run(st, nsteps=2)
        assert np.isfinite(np.asarray(st.vicen)).all()

    def test_restore_ice_sharded_matches_single(self):
        """restore_ice under ShardedModel: the boundary nudge applies to
        the GLOBAL arrays outside shard_map and must match the
        single-device trajectory (ice_restoring.F90:527 ice_HaloRestore)."""
        import dataclasses as dc
        cfg = _cfg()
        cfg = cfg.replace(
            grid=dc.replace(cfg.grid, ew_boundary="open"),
            forcing=dc.replace(cfg.forcing, restore_ice=True,
                               trestore=0.5))
        ref = Model(cfg)
        st_ref = ref.init_state(ice_mask=np.asarray(ref.grid.tmask))
        sm = ShardedModel(cfg, mesh_shape=(2, 4))
        st_s = sm.put(st_ref)
        st_ref = ref.run(st_ref, 2, log=lambda *a: None)
        st_s = sm.run(st_s, 2, log=lambda *a: None)
        np.testing.assert_allclose(np.asarray(st_s.aicen),
                                   np.asarray(st_ref.aicen), atol=1e-5)
        # enthalpy tracers are ~1e8 J/m^3: compare relatively (f32 fusion
        # differences between the two compiled programs are ~4e-7 relative)
        np.testing.assert_allclose(np.asarray(st_s.trcrn),
                                   np.asarray(st_ref.trcrn),
                                   rtol=3e-6, atol=1e-4)
