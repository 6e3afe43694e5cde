"""File-driven forcing tests: monthly interpolation weights, prepare_forcing
derivations (SW split, rain/snow partition, precip units, wind rotation,
NCAR bias corrections), netCDF round-trip, and a model step driven from a
synthetic monthly climatology."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.forcing_data import (FRCIDF, FRCIDR, FRCVDF, FRCVDR,
                                    MonthlyForcing, prepare_forcing)
from cice5_tpu.io.readers import interp_coeff_monthly


class TestInterpMonthly:
    def test_midmonth_exact(self):
        # mid-January (t=15.5 from Jan 1 00:00) -> pure month-0 record
        m1, m2, c1, c2 = interp_coeff_monthly(16.5)
        assert (m1, m2) == (0, 1)
        assert abs(c1 - 1.0) < 1e-9

    def test_between_months(self):
        m1, m2, c1, c2 = interp_coeff_monthly(31.0)   # late January
        assert (m1, m2) == (0, 1)
        assert 0.0 < c2 < 1.0
        assert abs(c1 + c2 - 1.0) < 1e-12

    def test_wraparound(self):
        m1, m2, c1, c2 = interp_coeff_monthly(1.0)    # Jan 1: Dec->Jan
        assert (m1, m2) == (11, 0)
        m1, m2, c1, c2 = interp_coeff_monthly(364.9)
        assert (m1, m2) == (11, 0)


class TestPrepareForcing:
    def _base(self, B=(4,), TairC=-10.0, **kw):
        f = lambda v: jnp.full(B, float(v), jnp.float64)
        args = dict(Tair=f(TairC + ct.Tffresh), fsw=f(200.0), cldf=f(0.5),
                    Qa=f(0.001), rhoa=f(1.3), uatm=f(3.0), vatm=f(4.0),
                    ANGLET=f(0.0), hm=f(1.0))
        args.update(kw)
        return args

    def test_sw_split_sums_to_total(self):
        out = prepare_forcing(**self._base(), atm_data_type="oned",
                              precip_units="mks")
        tot = out["swvdr"] + out["swvdf"] + out["swidr"] + out["swidf"]
        np.testing.assert_allclose(np.asarray(tot), 200.0, rtol=1e-6)
        assert abs(FRCVDR + FRCVDF + FRCIDR + FRCIDF - 1.0) < 1e-12

    def test_ncar_bias_corrections(self):
        out = prepare_forcing(**self._base(), atm_data_type="ncar",
                              precip_units="mks")
        np.testing.assert_allclose(np.asarray(out["Qa"]), 0.001 * 0.94,
                                   rtol=1e-6)
        tot = out["swvdr"] + out["swvdf"] + out["swidr"] + out["swidf"]
        np.testing.assert_allclose(np.asarray(tot), 200.0 * 0.92, rtol=1e-6)
        assert float(jnp.min(out["flw"])) > 100.0   # P&W longwave present

    def test_rain_snow_partition(self):
        cold = prepare_forcing(**self._base(TairC=-5.0,
                                            fsnow=jnp.full((4,), 1e-5)),
                               atm_data_type="oned", precip_units="mks")
        warm = prepare_forcing(**self._base(TairC=+5.0,
                                            fsnow=jnp.full((4,), 1e-5)),
                               atm_data_type="oned", precip_units="mks")
        assert float(jnp.min(cold["fsnow"])) > 0.0
        assert float(jnp.max(cold["frain"])) == 0.0
        assert float(jnp.max(warm["fsnow"])) == 0.0
        assert float(jnp.min(warm["frain"])) > 0.0

    def test_precip_units(self):
        mm_mon = prepare_forcing(**self._base(fsnow=jnp.full((4,), 31.0)),
                                 atm_data_type="oned",
                                 precip_units="mm_per_month")
        np.testing.assert_allclose(np.asarray(mm_mon["fsnow"]),
                                   31.0 * 12.0 / (86400.0 * 365.0),
                                   rtol=1e-6)

    def test_wind_rotation(self):
        ang = np.pi / 2
        out = prepare_forcing(**self._base(ANGLET=jnp.full((4,), ang)),
                              atm_data_type="oned", precip_units="mks")
        # (3, 4) rotated by ANGLET=pi/2: u' = v, v' = -u
        np.testing.assert_allclose(np.asarray(out["uatm"]), 4.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["vatm"]), -3.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["wind"]), 5.0, rtol=1e-6)


class TestMonthlyForcing:
    def _dataset(self, ny=12, nx=16):
        months = np.arange(12, dtype=np.float64)
        # seasonal Tair cycle, warmest July (record 6)
        Tair = (253.0 + 15.0 * np.cos(2 * np.pi * (months - 6.5) / 12.0)
                )[:, None, None] * np.ones((1, ny, nx))
        fsw = np.maximum(0.0, 250.0 * np.cos(
            2 * np.pi * (months - 6.5) / 12.0))[:, None, None] \
            * np.ones((1, ny, nx))
        return MonthlyForcing(fields={"Tair": Tair, "fsw": fsw},
                              atm_data_type="ncar")

    def test_seasonal_cycle(self):
        ds = self._dataset()
        from cice5_tpu.config import rect_config
        from cice5_tpu.grid import make_grid
        cfg = rect_config()
        cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, ny=12, nx=16))
        g = make_grid(cfg)
        f_jan = ds.forcing_at(15.0, g)
        f_jul = ds.forcing_at(196.0, g)
        assert float(jnp.mean(f_jul.Tair - f_jan.Tair)) > 20.0
        assert float(jnp.mean(f_jul.swvdr)) > float(jnp.mean(f_jan.swvdr))
        # Tf present and physical
        np.testing.assert_allclose(np.asarray(f_jan.Tf), -ct.depressT * 34.0,
                                   rtol=1e-5)

    def test_netcdf_roundtrip(self, tmp_path):
        from scipy.io import netcdf_file
        ny, nx = 6, 8
        path = str(tmp_path / "clim.nc")
        with netcdf_file(path, "w") as f:
            f.createDimension("time", 12)
            f.createDimension("y", ny)
            f.createDimension("x", nx)
            v = f.createVariable("airtmp", "d", ("time", "y", "x"))
            v[:] = 260.0 + np.arange(12)[:, None, None] \
                * np.ones((1, ny, nx))
        ds = MonthlyForcing.from_netcdf(path, {"Tair": "airtmp"})
        raw = ds.raw_at(16.5)    # mid-January
        np.testing.assert_allclose(raw["Tair"], 260.0, rtol=1e-6)

    def test_model_step_with_data_forcing(self):
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=12, nx=16),
            dyn=dataclasses.replace(cfg.dyn, ndte=10))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        ds = self._dataset()
        f = ds.forcing_at(15.0, m.grid)
        st, diag = m.step(st, f)
        assert np.isfinite(np.asarray(st.vicen)).all()
        assert bool(diag.therm_converged)


class TestRecordForcing:
    def test_six_hourly_interpolation(self):
        from cice5_tpu.forcing_data import RecordForcing
        ny, nx = 6, 8
        nrec = 8     # two days of 6-hourly records
        Tair = (250.0 + np.arange(nrec))[:, None, None] \
            * np.ones((1, ny, nx))
        ds = RecordForcing(fields={"Tair": Tair}, sec_per_rec=21600.0,
                           recslot=1, atm_data_type="oned")
        # istep at exactly a record boundary (dt=3600, step 6 => 21600 s
        # = end of record 0's interval => pure record 1 value? recslot=1:
        # record n valid at end of interval n
        raw = ds.raw_at(6, 3600.0)
        np.testing.assert_allclose(raw["Tair"], 251.0, rtol=1e-6)
        # halfway through the next interval: average of records 1 and 2
        raw = ds.raw_at(9, 3600.0)
        np.testing.assert_allclose(raw["Tair"], 251.5, rtol=1e-6)

    def test_builds_full_forcing(self):
        import dataclasses
        from cice5_tpu.config import rect_config
        from cice5_tpu.forcing_data import RecordForcing
        from cice5_tpu.grid import make_grid
        cfg = rect_config()
        cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, ny=6, nx=8))
        g = make_grid(cfg)
        nrec = 4
        ds = RecordForcing(
            fields={"Tair": np.full((nrec, 6, 8), 260.0),
                    "fsw": np.full((nrec, 6, 8), 120.0)},
            atm_data_type="ncar", precip_units="mks")
        f = ds.forcing_at(3, 3600.0, g)
        np.testing.assert_allclose(np.asarray(f.Tair), 260.0, rtol=1e-6)
        tot = np.asarray(f.swvdr + f.swvdf + f.swidr + f.swidf)
        np.testing.assert_allclose(tot, 120.0 * 0.92, rtol=1e-5)  # ncar bias
        assert np.isfinite(np.asarray(f.flw)).all()
