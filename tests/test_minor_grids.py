"""Minor grid readers: latlongrid (ice_grid.F90:876), cpomgrid (:1313),
gridbox_corners (:1972)."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from cice5_tpu.config import rect_config
from cice5_tpu.grid import gridbox_corners, latlongrid, make_grid, rectgrid


class TestLatLonGrid:
    def _domain(self, tmp_path, ny=8, nx=12):
        from scipy.io import netcdf_file
        path = str(tmp_path / "domain.nc")
        xc = np.linspace(0.0, 330.0, nx)
        yc = np.linspace(-60.0, 80.0, ny)
        area = np.full((ny, nx), (2 * np.pi / nx) * (np.pi / ny))
        mask = np.ones((ny, nx))
        mask[0, :] = 0
        with netcdf_file(path, "w") as f:
            f.createDimension("nj", ny)
            f.createDimension("ni", nx)
            for name, data, dims in (("xc", xc, ("ni",)),
                                     ("yc", yc, ("nj",)),
                                     ("area", area, ("nj", "ni")),
                                     ("mask", mask, ("nj", "ni"))):
                v = f.createVariable(name, "d", dims)
                v[:] = data
        return path

    def test_thermo_only_grid(self, tmp_path):
        path = self._domain(tmp_path)
        cfg = rect_config(ny=8, nx=12)
        cfg = cfg.replace(grid=dataclasses.replace(
            cfg.grid, grid_type="latlon", grid_file=path))
        g = make_grid(cfg)
        assert g.shape == (8, 12)
        # areas in m^2 (radius^2 x radians^2)
        assert 1e9 < float(g.tarea[3, 3]) < 1e13
        assert not bool(np.asarray(g.tmask)[0].any())
        # metrics are sentinels: dynamics must not be used
        assert float(g.dxt[0, 0]) > 1e30
        # ULAT shifted half a row above TLAT so default init finds ice
        assert float(g.ULAT[4, 0]) > float(g.TLAT[4, 0])

    def test_thermo_column_run(self, tmp_path):
        """Thermodynamics-only model run on the latlon grid (kdyn=0)."""
        from cice5_tpu.driver.model import Model
        path = self._domain(tmp_path)
        cfg = rect_config(ny=8, nx=12)
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, grid_type="latlon",
                                     grid_file=path),
            dyn=dataclasses.replace(cfg.dyn, kdyn=0, advection="none"))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st, diag = m.step(st, m.forcing_at(0))
        assert np.isfinite(np.asarray(st.vicen)).all()
        assert int(diag.state_bad) == 0


class TestCpomGrid:
    def test_reads_degrees_and_meters(self, tmp_path):
        from cice5_tpu.io.readers import read_cpom_grid_binary
        ny, nx = 6, 8
        recs = np.zeros((7, ny, nx))
        recs[0] = 75.0          # ULAT deg
        recs[1] = -120.0        # ULON deg
        recs[2] = 25000.0       # HTN m
        recs[3] = 20000.0       # HTE m
        gpath = str(tmp_path / "cpom.grid")
        recs.astype(">f8").tofile(gpath)
        kmt = np.ones((ny, nx), ">i4")
        kpath = str(tmp_path / "cpom.kmt")
        kmt.tofile(kpath)
        d = read_cpom_grid_binary(gpath, kpath, nx, ny)
        np.testing.assert_allclose(d["ULAT"], np.deg2rad(75.0))
        np.testing.assert_allclose(d["HTN"], 25000.0)

        cfg = rect_config(ny=ny, nx=nx)
        cfg = cfg.replace(grid=dataclasses.replace(
            cfg.grid, grid_type="cpom", grid_file=gpath, kmt_file=kpath,
            ew_boundary="open"))
        g = make_grid(cfg)
        np.testing.assert_allclose(float(g.dxt[3, 3]), 25000.0, rtol=1e-6)


class TestGridboxCorners:
    def test_corner_bounds(self):
        cfg = rect_config(ny=6, nx=8)
        g = rectgrid(cfg)
        lonb, latb = gridbox_corners(g)
        assert lonb.shape == (4, 6, 8)
        # NE corner latitude above SE corner latitude
        assert (latb[0, 1:] >= latb[3, 1:]).all()
        # bounds bracket the T-point latitude
        tlat = np.rad2deg(np.asarray(g.TLAT))
        assert (latb.max(0)[1:-1] >= tlat[1:-1]).all()
        assert (latb.min(0)[1:-1] <= tlat[1:-1]).all()
