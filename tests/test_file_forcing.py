"""File-layout forcing datasets: NCAR bulk + Large-Yeager trees with
multi-year cycling (ice_forcing.F90 ncar_files/ncar_data :1777-1985,
LY_files/LY_data :1990-2250, read_data cycling :820-1125,
compute_shortwave :2255, Qa_fixLY :2319, ocn_data_clim :3161).

Golden tests against synthesized binary files: field values encode
(year, record) so interpolation weights and year-cycling are exactly
checkable.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.config import rect_config
from cice5_tpu.forcing_data import (FileForcing, OcnClimForcing, Qa_fix_LY,
                                    compute_shortwave, file_year,
                                    ly_files, ncar_files)
from cice5_tpu.grid import rectgrid

NY, NX = 6, 8


def _write_bin(path, nrec, value_fn):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    a = np.stack([np.full((NY, NX), value_fn(r)) for r in range(nrec)])
    a.astype(">f8").tofile(path)


def _make_ncar_tree(root, years=(1996, 1997)):
    """Monthly value = year*1000 + month_index; 6-hourly = year*10000 + rec."""
    for yr in years:
        for name, path in ncar_files(str(root), yr).items():
            if name in ("fsw", "cldf", "fsnow"):
                _write_bin(path, 12, lambda r, y=yr: (y % 100) * 1000.0 + r)
            else:
                _write_bin(path, 1460,
                           lambda r, y=yr: (y % 100) * 10000.0 + r)


class TestFileYear:
    def test_substitution(self):
        assert file_year("a/t_10.1996.dat", 2003) == "a/t_10.2003.dat"
        assert file_year("b/rain.1996.nc", 1987) == "b/rain.1987.nc"


class TestNcarLayout:
    def test_sixhourly_interpolation_and_records(self, tmp_path):
        _make_ncar_tree(tmp_path)
        ds = FileForcing(str(tmp_path), nx=NX, ny=NY, atm_data_type="ncar",
                         fyear_init=1996, ycycle=2, year_init=1996)
        # yday=1, sec=0: recnum = 4*1-3+0 = 1 -> records 1459 (prev year,
        # wrapped) and 0 with weight c2 = 1 at interval end boundary? At
        # sec=0, tt = 0; rec 1's interval is (0, 6h], t1=0 -> c2=0: value
        # = previous record (1459 of previous year)
        # model year 1996 is the FIRST cycle year: 'previous year' wraps
        # to the last cycle year 1997 (read_data :900-960 cycling)
        raw = ds.raw_at(1.0, 0.0, 1996)
        np.testing.assert_allclose(raw["Tair"][0, 0],
                                   97.0 * 10000.0 + 1459, rtol=1e-12)
        # sec=3h: halfway into record 1's interval -> mean of prev/current
        raw = ds.raw_at(1.0, 10800.0, 1996)
        expect = 0.5 * (97 * 10000.0 + 1459) + 0.5 * (96 * 10000.0 + 0)
        np.testing.assert_allclose(raw["Tair"][0, 0], expect, rtol=1e-12)
        # mid-year, exactly at a record instant: 1-based record r is
        # valid at r*6h; tt = 397*6h -> 0-based record 396, full weight
        raw = ds.raw_at(100.0, 21600.0, 1996)
        np.testing.assert_allclose(raw["Tair"][0, 0],
                                   96 * 10000.0 + 396, rtol=1e-12)

    def test_monthly_midpoints_and_cycling(self, tmp_path):
        _make_ncar_tree(tmp_path)
        ds = FileForcing(str(tmp_path), nx=NX, ny=NY, atm_data_type="ncar",
                         fyear_init=1996, ycycle=2, year_init=1996)
        # mid-July (yday ~ 196.5): exactly month index 6
        raw = ds._monthly_raw(197.0, 1996)
        np.testing.assert_allclose(raw["fsw"][0, 0], 96 * 1000.0 + 6,
                                   atol=0.51)
        # early January of model year 1997 (cycle year 1997): the December
        # record comes from the PREVIOUS cycle year's file (1996)
        raw = ds._monthly_raw(2.0, 1997)
        v = raw["fsw"][0, 0]
        lo = min(96 * 1000.0 + 11, 97 * 1000.0 + 0)
        hi = max(96 * 1000.0 + 11, 97 * 1000.0 + 0)
        assert lo <= v <= hi
        # model year 1998 cycles back to file year 1996
        assert ds.fyear(1998) == 1996
        raw98 = ds.raw_at(100.0, 0.0, 1998)
        raw96 = ds.raw_at(100.0, 0.0, 1996)
        np.testing.assert_allclose(raw98["Tair"], raw96["Tair"], rtol=1e-12)

    def test_builds_forcing_and_drives_model(self, tmp_path):
        import dataclasses
        from cice5_tpu.driver.model import Model
        _make_ncar_tree(tmp_path)
        # physical-ish values this time
        for yr in (1996, 1997):
            files = ncar_files(str(tmp_path), yr)
            _write_bin(files["fsw"], 12,
                       lambda r: 150.0 + 100 * np.sin(np.pi * r / 6))
            _write_bin(files["cldf"], 12, lambda r: 0.6)
            _write_bin(files["fsnow"], 12, lambda r: 30.0)  # mm/month
            _write_bin(files["Tair"], 1460, lambda r: 255.0 + 15
                       * np.sin(2 * np.pi * r / 1460))
            _write_bin(files["uatm"], 1460, lambda r: 4.0)
            _write_bin(files["vatm"], 1460, lambda r: -2.0)
            _write_bin(files["Qa"], 1460, lambda r: 0.001)
            _write_bin(files["rhoa"], 1460, lambda r: 1.3)
        ds = FileForcing(str(tmp_path), nx=NX, ny=NY, atm_data_type="ncar",
                         fyear_init=1996, year_init=1997)
        cfg = rect_config(ny=NY, nx=NX)
        cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=10))
        m = Model(cfg)

        def provider(istep, info):
            return ds.forcing_at(info.yday, info.sec, info.year, m.grid)
        m.forcing_provider = provider
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st = m.run(st, nsteps=2)
        assert np.isfinite(np.asarray(st.vicen)).all()
        f = m.forcing_at(0)
        assert float(f.Tair.max()) > 200.0       # data actually flowed
        assert abs(float(f.fsnow.mean())) > 0.0  # precip converted


class TestLYLayout:
    def test_aomip_derivations(self, tmp_path):
        for name, path in ly_files(str(tmp_path), 1996).items():
            nrec = 12 if name in ("cldf", "fsnow") else 1460
            val = 0.5 if name == "cldf" else (
                20.0 if name == "fsnow" else
                (0.004 if name == "Qa" else
                 (270.0 if name == "Tair" else 3.0)))
            _write_bin(path, nrec, lambda r, v=val: v)
        ds = FileForcing(str(tmp_path), nx=NX, ny=NY, atm_data_type="LYq",
                         fyear_init=1996, year_init=1996,
                         precip_units="mm_per_sec")
        cfg = rect_config(ny=NY, nx=NX)
        g = rectgrid(cfg)
        z = jnp.zeros((NY, NX))
        f = ds.forcing_at(180.0, 43200.0, 1996, g,
                          Tsfc=z - 5.0, sst=z, aice=z + 0.5)
        # Qa was supersaturated at 270K -> clamped below the input
        assert float(f.Qa.max()) < 0.004 * 0.95
        # computed shortwave positive somewhere at noon in July
        fsw = np.asarray(f.swvdr + f.swvdf + f.swidr + f.swidf)
        assert fsw.max() > 10.0
        # Rosati-Miyakoda longwave finite and physical on ocean cells
        ocean = np.asarray(g.tmask)
        flw = np.asarray(f.flw)[ocean]
        assert 100.0 < flw.mean() < 450.0


class TestShortwaveQaHelpers:
    def test_night_is_dark(self):
        TLON = jnp.zeros((4,))
        TLAT = jnp.full((4,), np.deg2rad(75.0))
        hm = jnp.ones((4,))
        fsw_noon = compute_shortwave(TLON, TLAT, jnp.full((4,), 2e-3),
                                     jnp.zeros((4,)), hm, 43200.0, 172.0)
        fsw_mid = compute_shortwave(TLON, TLAT, jnp.full((4,), 2e-3),
                                    jnp.zeros((4,)), hm, 0.0, 355.0)
        assert float(fsw_noon.min()) > 100.0   # polar-day summer noon
        assert float(fsw_mid.max()) == 0.0     # polar-night winter

    def test_qa_fix_caps_at_saturation(self):
        Tair = jnp.asarray([250.0, 270.0, 290.0])
        Qa = jnp.full((3,), 0.02)
        out = np.asarray(Qa_fix_LY(Tair, Qa))
        assert (out <= 0.02 + 1e-12).all()
        assert out[0] < out[1] < out[2]        # saturation rises with T


class TestOcnClim:
    def test_monthly_ocean_climatology(self, tmp_path):
        p_sst = str(tmp_path / "sst_clim.dat")
        p_sss = str(tmp_path / "sss_clim.dat")
        _write_bin(p_sst, 12, lambda r: -1.0 + 0.2 * r)
        _write_bin(p_sss, 12, lambda r: 33.0 + 0.1 * r)
        ds = OcnClimForcing(files={"sst": p_sst, "sss": p_sss},
                            nx=NX, ny=NY)
        raw = ds.raw_at(197.0)                 # mid-July -> index 6
        np.testing.assert_allclose(raw["sst"][0, 0], -1.0 + 0.2 * 6,
                                   atol=0.02)
        np.testing.assert_allclose(raw["sss"][0, 0], 33.0 + 0.1 * 6,
                                   atol=0.02)


class TestAeroBgcForcing:
    def test_aerosol_deposition_reaches_tracers(self):
        """faero_data analog (ice_aerosol.F90:71): monthly deposition
        attached to the Forcing drives the aerosol tracers."""
        import dataclasses
        import jax.numpy as jnp
        from cice5_tpu.driver.model import Model
        from cice5_tpu.forcing_data import AeroBgcForcing
        cfg = rect_config(ny=8, nx=12)
        cfg = cfg.replace(
            tracers=dataclasses.replace(cfg.tracers, tr_aero=True,
                                        n_aero=1),
            dyn=dataclasses.replace(cfg.dyn, ndte=8))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        # deposition peaking in month 6
        dep = np.zeros((12, 1, 8, 12))
        dep[:, 0] = 1e-11
        dep[6, 0] = 1e-9
        ds = AeroBgcForcing(faero=dep)
        f0 = ds.attach(m.forcing_at(0), 15.0)    # January
        f6 = ds.attach(m.forcing_at(0), 197.5)   # mid-July
        np.testing.assert_allclose(np.asarray(f6.faero_atm), 1e-9,
                                   rtol=1e-5)
        st1, _ = m.step(st, f6)
        a0 = m.tr.nt_aero
        aero1 = np.asarray(st1.trcrn[:, a0:a0 + 4]).sum()
        st0, _ = m.step(st, f0)
        aero0 = np.asarray(st0.trcrn[:, a0:a0 + 4]).sum()
        assert aero1 > aero0 * 10      # summer deposition dominates

    def test_ocean_bio_attach(self):
        import dataclasses
        import jax.numpy as jnp
        from cice5_tpu.driver.model import Model
        from cice5_tpu.forcing_data import AeroBgcForcing
        cfg = rect_config(ny=8, nx=12)
        cfg = cfg.replace(
            tracers=dataclasses.replace(cfg.tracers, skl_bgc=True,
                                        tr_brine=True),
            dyn=dataclasses.replace(cfg.dyn, ndte=8))
        m = Model(cfg)
        nb = m.tr.nbtrcr
        ob = np.full((12, nb, 8, 12), 5.0)
        ds = AeroBgcForcing(ocean_bio=ob)
        f = ds.attach(m.forcing_at(0), 100.0)
        assert f.ocean_bio.shape == (nb, 8, 12)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st1, diag = m.step(st, f)
        assert np.isfinite(np.asarray(st1.trcrn)).all()


class TestHadgemLayout:
    def test_monthly_nc_tree(self, tmp_path):
        from scipy.io import netcdf_file
        from cice5_tpu.forcing_data import HadgemForcing, hadgem_files
        vals = {"rainfall": 1e-5, "snowfall": 2e-5, "u_10": 3.0,
                "v_10": -1.0, "SW_incoming": 120.0, "LW_incoming": 260.0,
                "t_10": 265.0, "q_10": 0.002, "rho_10": 1.3}
        files = hadgem_files(str(tmp_path), 1996)
        os.makedirs(str(tmp_path / "MONTHLY"), exist_ok=True)
        for name, (path, var) in files.items():
            with netcdf_file(path, "w") as f:
                f.createDimension("time", 12)
                f.createDimension("nj", NY)
                f.createDimension("ni", NX)
                v = f.createVariable(var, "d", ("time", "nj", "ni"))
                v[:] = vals[var] * (1.0 + 0.1 * np.arange(12)
                                    )[:, None, None] * np.ones((1, NY, NX))
        ds = HadgemForcing(str(tmp_path), fyear_init=1996, year_init=1996)
        cfg = rect_config(ny=NY, nx=NX)
        g = rectgrid(cfg)
        f = ds.forcing_at(197.5, 1996, g)     # mid-July -> record 6
        np.testing.assert_allclose(float(f.flw[2, 2]), 260.0 * 1.6,
                                   rtol=1e-3)
        # rain and snow provided separately: no temperature partition
        np.testing.assert_allclose(float(f.frain[2, 2]), 1e-5 * 1.6,
                                   rtol=1e-3)
        np.testing.assert_allclose(float(f.fsnow[2, 2]), 2e-5 * 1.6,
                                   rtol=1e-3)
        # direct longwave (no Parkinson-Washington parameterization)
        assert abs(float(f.Tair[2, 2]) - 265.0 * 1.6) < 1.0
