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


class TestTripole:
    """Tripole U-fold halo (mpi/ice_boundary.F90 tripole branches).

    Oracle: the 1-based reference copy-out ``ghost(i, ny+1) =
    sign * field(nxGlobal + 1 - i - ioffset, ny - joffset)`` with U-fold
    offsets center(0,0)/NEcorner(1,1)/Eface(1,0)/Nface(0,1), plus the
    degenerate top-row average for NEcorner/Nface fields.
    """
    LOCS = {
        "center": (1, (0, 0)),
        "necorner": (2, (1, 1)),
        "nface": (3, (0, 1)),
        "eface": (4, (1, 0)),
    }

    @staticmethod
    def _oracle(f, loc_name, sign):
        """NumPy ghost row + symmetrized top row, 0-based indexing."""
        ny, nx = f.shape
        _, (ioff, joff) = TestTripole.LOCS[loc_name]
        f = f.copy()
        if loc_name in ("necorner", "nface"):
            top = f[ny - 1].copy()
            mapped = np.array([top[(nx - 1 - i - ioff) % nx]
                               for i in range(nx)])
            f[ny - 1] = 0.5 * (top + sign * mapped)
        src = f[ny - 1 - joff]
        ghost = np.array([sign * src[(nx - 1 - i - ioff) % nx]
                          for i in range(nx)])
        return f, ghost

    @pytest.mark.parametrize("loc_name", ["center", "necorner", "nface",
                                          "eface"])
    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_fold_matches_oracle(self, rng, loc_name, sign):
        from cice5_tpu.constants import FieldLoc, FieldType
        ny, nx = 6, 12
        f = jnp.asarray(rng.standard_normal((ny, nx)))
        loc = FieldLoc(self.LOCS[loc_name][0])
        kind = FieldType.VECTOR if sign < 0 else FieldType.SCALAR
        F = np.asarray(extend(f, Topology(ew="cyclic", ns="tripole"),
                              loc=loc, kind=kind))
        f_sym, ghost = self._oracle(np.asarray(f), loc_name, sign)
        np.testing.assert_allclose(F[1:-1, 1:-1], f_sym, atol=1e-14)
        np.testing.assert_allclose(F[-1, 1:-1], ghost, atol=1e-14)
        # ghost row is itself cyclic in x
        np.testing.assert_allclose(F[-1, 0], ghost[-1], atol=1e-14)
        np.testing.assert_allclose(F[-1, -1], ghost[0], atol=1e-14)

    def test_center_scalar_self_consistent(self, rng):
        """Fold applied twice returns the original row (involution)."""
        ny, nx = 5, 8
        f = np.asarray(rng.standard_normal((ny, nx)))
        _, g1 = self._oracle(f, "center", 1.0)
        f2 = f.copy()
        f2[ny - 1] = g1
        _, g2 = self._oracle(f2, "center", 1.0)
        np.testing.assert_allclose(g2, f[ny - 1], atol=1e-14)

    @pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
    @pytest.mark.parametrize("loc_name,kindname",
                             [("center", "scalar"), ("necorner", "vector"),
                              ("eface", "vector"), ("nface", "scalar")])
    def test_decomposition_invariance(self, rng, mesh_shape, loc_name,
                                      kindname):
        """Sharded tripole extend == single-device tripole extend — the
        fold's mirror-ppermute path (SURVEY.md section 4.2 oracle)."""
        from cice5_tpu.constants import FieldLoc, FieldType
        ny, nx = 16, 32
        loc = FieldLoc(self.LOCS[loc_name][0])
        kind = (FieldType.VECTOR if kindname == "vector"
                else FieldType.SCALAR)
        f = jnp.asarray(rng.standard_normal((ny, nx)))
        ref_big = np.asarray(extend(f, Topology(ew="cyclic", ns="tripole"),
                                    loc=loc, kind=kind))

        mesh = make_mesh(ny=ny, nx=nx, shape=mesh_shape)
        topo = mesh_topology(mesh, ew="cyclic", ns="tripole")

        @jax.jit
        def run(x):
            return shard_map(
                lambda xl: extend(xl, topo, loc=loc, kind=kind),
                mesh=mesh, in_specs=P("Y", "X"),
                out_specs=P("Y", "X"), check_vma=False)(x)

        out_np = np.asarray(run(f))
        py, px = mesh_shape
        nyl, nxl = ny // py, nx // px
        for jy in range(py):
            for jx in range(px):
                shard = out_np[jy * (nyl + 2):(jy + 1) * (nyl + 2),
                               jx * (nxl + 2):(jx + 1) * (nxl + 2)]
                big = ref_big[jy * nyl:jy * nyl + nyl + 2,
                              jx * nxl:jx * nxl + nxl + 2]
                np.testing.assert_allclose(shard, big, atol=1e-14)


class TestTripoleT:
    """Tripole T-fold halo (mpi/ice_boundary.F90:1494-1546): offsets
    center(-1,0)/NEcorner(0,1)/Eface(0,0)/Nface(-1,1), degenerate top-row
    symmetrization for CENTER (pairs i <-> nx-i+2, self-points untouched)
    and EFACE (pairs i <-> nx+1-i)."""
    LOCS = {"center": (1, (-1, 0)), "necorner": (2, (0, 1)),
            "nface": (3, (-1, 1)), "eface": (4, (0, 0))}

    @staticmethod
    def _oracle(f, loc_name, sign):
        ny, nx = f.shape
        _, (ioff, joff) = TestTripoleT.LOCS[loc_name]
        f = f.copy()
        if loc_name in ("center", "eface"):
            top = f[ny - 1].copy()
            mapped = np.array([top[(nx - 1 - i - ioff) % nx]
                               for i in range(nx)])
            sym = 0.5 * (top + sign * mapped)
            if ioff == -1:   # self-image points untouched (center)
                sym[0] = top[0]
                if nx % 2 == 0:
                    sym[nx // 2] = top[nx // 2]
            f[ny - 1] = sym
        src = f[ny - 1 - joff]
        ghost = np.array([sign * src[(nx - 1 - i - ioff) % nx]
                          for i in range(nx)])
        return f, ghost

    @pytest.mark.parametrize("loc_name", ["center", "necorner", "nface",
                                          "eface"])
    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_fold_matches_oracle(self, rng, loc_name, sign):
        from cice5_tpu.constants import FieldLoc, FieldType
        ny, nx = 6, 12
        f = jnp.asarray(rng.standard_normal((ny, nx)))
        loc = FieldLoc(self.LOCS[loc_name][0])
        kind = FieldType.VECTOR if sign < 0 else FieldType.SCALAR
        F = np.asarray(extend(f, Topology(ew="cyclic", ns="tripoleT"),
                              loc=loc, kind=kind))
        f_sym, ghost = self._oracle(np.asarray(f), loc_name, sign)
        np.testing.assert_allclose(F[1:-1, 1:-1], f_sym, atol=1e-14)
        np.testing.assert_allclose(F[-1, 1:-1], ghost, atol=1e-14)

    @pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
    @pytest.mark.parametrize("loc_name,kindname",
                             [("center", "scalar"), ("center", "vector"),
                              ("eface", "vector"), ("necorner", "vector")])
    def test_decomposition_invariance(self, rng, mesh_shape, loc_name,
                                      kindname):
        from cice5_tpu.constants import FieldLoc, FieldType
        ny, nx = 16, 32
        loc = FieldLoc(self.LOCS[loc_name][0])
        kind = (FieldType.VECTOR if kindname == "vector"
                else FieldType.SCALAR)
        f = jnp.asarray(rng.standard_normal((ny, nx)))
        ref_big = np.asarray(extend(f, Topology(ew="cyclic", ns="tripoleT"),
                                    loc=loc, kind=kind))
        mesh = make_mesh(ny=ny, nx=nx, shape=mesh_shape)
        topo = mesh_topology(mesh, ew="cyclic", ns="tripoleT")

        @jax.jit
        def run(x):
            return shard_map(
                lambda xl: extend(xl, topo, loc=loc, kind=kind),
                mesh=mesh, in_specs=P("Y", "X"),
                out_specs=P("Y", "X"), check_vma=False)(x)

        out_np = np.asarray(run(f))
        py, px = mesh_shape
        nyl, nxl = ny // py, nx // px
        for jy in range(py):
            for jx in range(px):
                shard = out_np[jy * (nyl + 2):(jy + 1) * (nyl + 2),
                               jx * (nxl + 2):(jx + 1) * (nxl + 2)]
                big = ref_big[jy * nyl:jy * nyl + nyl + 2,
                              jx * nxl:jx * nxl + nxl + 2]
                np.testing.assert_allclose(shard, big, atol=1e-14)


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
