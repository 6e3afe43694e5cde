"""I/O tests: exact restart round-trip (the reference's restart-exactness
contract, SURVEY.md section 4.3), history accumulation + netCDF write,
global diagnostics, timers, readers."""
import os

import jax.numpy as jnp
import numpy as np

from cice5_tpu import ModelConfig
from cice5_tpu.config import DynConfig, ForcingConfig, GridConfig, TimeConfig
from cice5_tpu.driver.model import Model
from cice5_tpu.io import restart as restart_mod
from cice5_tpu.io.diagnostics import compute_diags, format_diags, print_state
from cice5_tpu.io.history import (STANDARD_FIELDS, HistoryStream,
                                  diag_to_values, write_netcdf)
from cice5_tpu.io.readers import interp_coeff_monthly, read_netcdf_field
from cice5_tpu.io.timers import Timers


def small_model():
    cfg = ModelConfig(
        grid=GridConfig(nx=24, ny=20, dx_const=30000.0, dy_const=30000.0,
                        lat0=60.0),
        dyn=DynConfig(kdyn=1, ndte=20, advection="upwind", kstrength=0),
        forcing=ForcingConfig(oceanmixed_ice=True, natmiter=2),
        time=TimeConfig(dt=3600.0), dtype="float64", accum_dtype="float64")
    return Model(cfg)


class TestRestart:
    def test_exact_roundtrip_continuation(self, tmp_path):
        """runtype='continue' must be bit-identical to straight-through
        (ice_restart_driver.F90 exact-restart contract)."""
        m = small_model()
        s0 = m.init_state(ice_mask=np.asarray(m.grid.tmask))

        # straight-through: 4 steps
        s = s0
        for k in range(4):
            s, _ = m.step(s, m.forcing_at(k))
        straight = s

        # dump at step 2, restore, continue
        s = s0
        for k in range(2):
            s, _ = m.step(s, m.forcing_at(k))
        p = str(tmp_path / "iced.test.npz")
        restart_mod.dump(s, p, istep=2, time=7200.0)
        s2, meta = restart_mod.restore(p)
        assert meta["istep"] == 2
        for k in range(2, 4):
            s2, _ = m.step(s2, m.forcing_at(k))

        import dataclasses
        for f in dataclasses.fields(straight):
            a = np.asarray(getattr(straight, f.name))
            b = np.asarray(getattr(s2, f.name))
            np.testing.assert_array_equal(a, b, err_msg=f.name)

    def test_pointer_file(self, tmp_path):
        m = small_model()
        s = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        p = str(tmp_path / "iced.0001.npz")
        restart_mod.dump(s, p, istep=0, time=0.0)
        s2, meta = restart_mod.restore(pointer_dir=str(tmp_path))
        np.testing.assert_array_equal(np.asarray(s.vicen),
                                      np.asarray(s2.vicen))


class TestHistory:
    def test_accumulate_and_write(self, tmp_path):
        m = small_model()
        s = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        stream = HistoryStream(STANDARD_FIELDS, freq="1", freq_n=2)
        for k in range(2):
            s, diag = m.step(s, m.forcing_at(k))
            stream.accum(diag_to_values(diag, s, m.grid), k * 3600.0)
        info = m.calendar.info(2, 3600.0)
        assert stream.ready(info)
        path = str(tmp_path / "iceh.test.nc")
        write_netcdf(stream, m.grid, info, path)
        assert os.path.exists(path)
        aice = read_netcdf_field(path, "aice", record=0)
        assert aice.shape == (20, 24)
        ocean = np.asarray(m.grid.tmask)
        assert aice[ocean].max() > 0.5
        tlat = read_netcdf_field(path, "TLAT")
        assert np.isfinite(tlat).all()
        assert stream.nsamples == 0   # reset after write

    def test_model_run_with_history(self, tmp_path):
        m = small_model()
        s = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        stream = HistoryStream(STANDARD_FIELDS, freq="h", freq_n=2)
        logs = []
        m.run(s, 4, history=stream, history_dir=str(tmp_path / "hist"),
              restart_every=4, restart_dir=str(tmp_path / "rest"),
              diag_every=2, log=logs.append)
        assert any("history" in l for l in logs)
        assert any("restart" in l for l in logs)
        assert any("volume" in l for l in logs)


class TestDiagnostics:
    def test_global_budgets(self):
        m = small_model()
        s = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        d = compute_diags(s, m.grid, m.tr, m.cfg.nilyr, m.cfg.nslyr)
        assert float(d.arean) > 0.0
        assert float(d.volumen) > 0.0
        assert float(d.etotn) < 0.0      # energy of melting is negative
        txt = format_diags(0, d)
        assert "volume" in txt
        dump = print_state(s, m.grid, m.tr, m.cfg.nilyr, m.cfg.nslyr, 10, 10)
        assert "cat 0" in dump


class TestTimers:
    def test_timer_report(self):
        t = Timers()
        with t.timer("Thermo"):
            x = jnp.arange(10.0).sum()
        with t.timer("Dynamics", block=x):
            pass
        rep = t.report()
        assert "Thermo" in rep and "Dynamics" in rep


class TestReaders:
    def test_interp_coeff_monthly(self):
        m1, m2, c1, c2 = interp_coeff_monthly(16.5)   # mid-January
        assert (m1, m2) == (0, 1) or (m1, m2) == (11, 0)
        np.testing.assert_allclose(c1 + c2, 1.0)
        m1, m2, c1, c2 = interp_coeff_monthly(200.0)
        assert 0 <= m1 <= 11 and 0 <= m2 <= 11
