"""Foundation tests: tridiag solver, halo exchange (incl. decomposition
invariance on a virtual mesh), grid metrics, calendar, tracer registry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cice5_tpu import ModelConfig, build_tracer_registry, column_config
from cice5_tpu.calendar import Calendar
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.ops import tridiag_solve
from cice5_tpu.parallel import (Topology, extend, interior, make_mesh,
                                mesh_topology, shifted)


class TestTridiag:
    def test_matches_dense_solve(self, rng):
        n, batch = 9, 64
        a = rng.uniform(0.1, 1.0, (n, batch))
        b = rng.uniform(3.0, 5.0, (n, batch))   # diagonally dominant
        c = rng.uniform(0.1, 1.0, (n, batch))
        d = rng.standard_normal((n, batch))
        x = np.asarray(tridiag_solve(*map(jnp.asarray, (a, b, c, d))))
        for k in range(batch):
            M = np.diag(b[:, k]) + np.diag(a[1:, k], -1) + np.diag(c[:-1, k], 1)
            np.testing.assert_allclose(M @ x[:, k], d[:, k], atol=1e-10)

    def test_multi_batch_axes(self, rng):
        n = 5
        a, b, c, d = (jnp.asarray(rng.uniform(1, 2, (n, 4, 8))) for _ in range(4))
        b = b + 4.0
        x = tridiag_solve(a, b, c, d)
        assert x.shape == (n, 4, 8)


class TestHalo:
    def test_cyclic_x_open_y(self):
        f = jnp.arange(12.0).reshape(3, 4)
        topo = Topology(ew="cyclic", ns="open")
        F = extend(f, topo)
        assert F.shape == (5, 6)
        np.testing.assert_array_equal(interior(F), f)
        np.testing.assert_array_equal(F[1:-1, 0], f[:, -1])   # west ghost wraps
        np.testing.assert_array_equal(F[1:-1, -1], f[:, 0])
        np.testing.assert_array_equal(F[0, :], np.zeros(6))   # open: zeros
        np.testing.assert_array_equal(F[-1, :], np.zeros(6))

    def test_shifted_accessors(self):
        f = jnp.arange(12.0).reshape(3, 4)
        F = extend(f, Topology(ew="cyclic", ns="cyclic"))
        np.testing.assert_array_equal(shifted(F, 1, 0), np.roll(f, -1, axis=1))
        np.testing.assert_array_equal(shifted(F, 0, 1), np.roll(f, -1, axis=0))
        np.testing.assert_array_equal(shifted(F, -1, -1),
                                      np.roll(f, (1, 1), axis=(0, 1)))

    @pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
    @pytest.mark.parametrize("bc", [("cyclic", "open"), ("cyclic", "cyclic"),
                                    ("open", "open")])
    def test_decomposition_invariance(self, rng, mesh_shape, bc):
        """Same extended field from 1-device and any 8-device mesh — the
        bfbflag/decomposition-invariance oracle (SURVEY.md section 4.2)."""
        ew, ns = bc
        ny, nx = 16, 32
        f = jnp.asarray(rng.standard_normal((ny, nx)))
        ref = extend(f, Topology(ew=ew, ns=ns))

        mesh = make_mesh(ny=ny, nx=nx, shape=mesh_shape)
        topo = mesh_topology(mesh, ew=ew, ns=ns)

        @jax.jit
        def run(x):
            return shard_map(
                lambda xl: extend(xl, topo),
                mesh=mesh, in_specs=P("Y", "X"),
                out_specs=P("Y", "X"), check_vma=False)(x)

        out = run(f)
        # sharded result has per-shard ghost rings; compare interiors and
        # ghost correctness per shard
        py, px = mesh_shape
        nyl, nxl = ny // py, nx // px
        out_np = np.asarray(out)
        f_np = np.asarray(f)
        ref_big = np.asarray(extend(f, Topology(ew=ew, ns=ns)))
        for jy in range(py):
            for jx in range(px):
                shard = out_np[jy * (nyl + 2):(jy + 1) * (nyl + 2),
                               jx * (nxl + 2):(jx + 1) * (nxl + 2)]
                # interior matches
                np.testing.assert_array_equal(
                    shard[1:-1, 1:-1],
                    f_np[jy * nyl:(jy + 1) * nyl, jx * nxl:(jx + 1) * nxl])
                # ghosts match the global extended array
                big = ref_big[jy * nyl:jy * nyl + nyl + 2,
                              jx * nxl:jx * nxl + nxl + 2]
                np.testing.assert_array_equal(shard, big)


class TestGrid:
    def test_rectgrid_metrics(self):
        cfg = ModelConfig(grid=GridConfig(nx=16, ny=12, dx_const=1000.0,
                                          dy_const=2000.0))
        g = rectgrid(cfg)
        np.testing.assert_allclose(np.asarray(g.tarea), 2.0e6)
        np.testing.assert_allclose(np.asarray(g.uarea), 2.0e6)
        np.testing.assert_allclose(np.asarray(g.dxt), 1000.0)
        np.testing.assert_allclose(np.asarray(g.dyu), 2000.0)
        np.testing.assert_allclose(np.asarray(g.dxhy), 0.0)
        np.testing.assert_allclose(np.asarray(g.cxp), 1000.0)
        np.testing.assert_allclose(np.asarray(g.cym), -2000.0)
        hm = np.asarray(g.hm)
        assert hm[0].sum() == 0 and hm[1].sum() == 0       # closed rows
        assert hm[2].sum() == 16                            # ocean row
        # umask narrower than tmask at the land edge
        assert np.asarray(g.umask).sum() < np.asarray(g.tmask).sum()

    def test_tlat_interior(self):
        cfg = ModelConfig(grid=GridConfig(nx=16, ny=12))
        g = rectgrid(cfg)
        ulat = np.asarray(g.ULAT)
        tlat = np.asarray(g.TLAT)
        # interior T latitude is between neighboring U latitudes
        assert np.all(tlat[1:, :] <= ulat[1:, :] + 1e-12)
        assert np.all(tlat[1:, :] >= ulat[:-1, :] - 1e-12)


class TestCalendar:
    def test_noleap(self):
        cal = Calendar(1997, 365, False)
        i = cal.info(0, 3600.0)
        assert (i.year, i.month, i.mday, i.sec) == (1997, 1, 1, 0)
        i = cal.info(24 * 31, 3600.0)
        assert (i.year, i.month, i.mday) == (1997, 2, 1)
        i = cal.info(24 * 365, 3600.0)
        assert (i.year, i.month, i.mday) == (1998, 1, 1)

    def test_leap(self):
        cal = Calendar(2000, 365, True)
        i = cal.info(24 * 59, 3600.0)    # day 60 of 2000 = Feb 29
        assert (i.month, i.mday) == (2, 29)

    def test_360day(self):
        cal = Calendar(1, 360, False)
        i = cal.info(24 * 360, 3600.0)
        assert i.year == 2


class TestRegistry:
    def test_base_layout(self):
        cfg = ModelConfig()
        tr = build_tracer_registry(cfg)
        assert tr.nt_Tsfc == 0
        assert tr.nt_qice == 1
        assert tr.nt_sice == 1 + cfg.nilyr
        assert tr.nt_qsno == 1 + 2 * cfg.nilyr
        assert tr.ntrcr == 1 + 2 * cfg.nilyr + cfg.nslyr

    def test_pond_lvl_dependencies(self):
        from cice5_tpu.config import TracerConfig
        cfg = ModelConfig(tracers=TracerConfig(tr_lvl=True, tr_pond_lvl=True))
        tr = build_tracer_registry(cfg)
        # apnd depends on alvl; hpnd/ipnd depend on apnd
        # (ice_init.F90:1378-1380)
        assert tr.depend[tr.nt_apnd] == 3 + tr.nt_alvl
        assert tr.depend[tr.nt_hpnd] == 3 + tr.nt_apnd
        assert tr.depend[tr.nt_ipnd] == 3 + tr.nt_apnd
        assert tr.has_dependents[tr.nt_alvl]
        assert tr.has_dependents[tr.nt_apnd]
