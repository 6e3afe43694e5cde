"""Boundary restoring tests: edge mask, nudging math, interior untouched,
instantaneous restore, sharded decomposition invariance."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cice5_tpu.config import rect_config
from cice5_tpu.driver.model import Model
from cice5_tpu.models.restoring import edge_mask, restore_ice
from cice5_tpu.parallel import Topology, make_mesh, mesh_topology


class TestEdgeMask:
    def test_open_both(self):
        m = np.asarray(edge_mask((5, 8), Topology(ew="open", ns="open")))
        assert m[0, :].all() and m[-1, :].all()
        assert m[:, 0].all() and m[:, -1].all()
        assert m[1:-1, 1:-1].sum() == 0

    def test_cyclic_ew(self):
        m = np.asarray(edge_mask((5, 8), Topology(ew="cyclic", ns="open")))
        assert m[0, :].all() and m[-1, :].all()
        assert m[1:-1, 0].sum() == 0     # no EW restore when cyclic

    def test_tripole_south_only(self):
        m = np.asarray(edge_mask((5, 8), Topology(ew="cyclic", ns="tripole")))
        assert m[0, :].all()
        assert m[-1, :].sum() == 0

    def test_sharded_matches(self):
        ny, nx = 8, 16
        ref = np.asarray(edge_mask((ny, nx), Topology(ew="open", ns="open")))
        mesh = make_mesh(ny=ny, nx=nx, shape=(2, 4))
        topo = mesh_topology(mesh, ew="open", ns="open")

        @jax.jit
        def run():
            return shard_map(
                lambda: edge_mask((ny // 2, nx // 4), topo),
                mesh=mesh, in_specs=(), out_specs=P("Y", "X"),
                check_vma=False)()
        np.testing.assert_array_equal(np.asarray(run()), ref)


class TestRestore:
    def _setup(self):
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=12, nx=16,
                                     ew_boundary="open"))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        return m, st

    def test_nudges_boundary_only(self):
        m, st = self._setup()
        rest = st
        # perturb everywhere
        pert = st.replace(aicen=st.aicen * 0.5)
        out = restore_ice(3600.0, 1, pert, rest, m.topo)
        a_out = np.asarray(out.aicen)
        a_pert = np.asarray(pert.aicen)
        a_rest = np.asarray(rest.aicen)
        # interior untouched
        np.testing.assert_array_equal(a_out[:, 1:-1, 1:-1],
                                      a_pert[:, 1:-1, 1:-1])
        # boundary moved toward rest by dt/trest
        ct_frac = 3600.0 / 86400.0
        np.testing.assert_allclose(
            a_out[:, 0, :],
            a_pert[:, 0, :] + (a_rest[:, 0, :] - a_pert[:, 0, :]) * ct_frac,
            rtol=1e-6)

    def test_instantaneous(self):
        m, st = self._setup()
        pert = st.replace(aicen=st.aicen * 0.2)
        out = restore_ice(3600.0, 0, pert, st, m.topo)
        np.testing.assert_allclose(np.asarray(out.aicen[:, 0, :]),
                                   np.asarray(st.aicen[:, 0, :]), rtol=1e-6)

    def test_run_loop_restores(self):
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=12, nx=16,
                                     ew_boundary="open"),
            forcing=dataclasses.replace(cfg.forcing, restore_ice=True,
                                        trestore=0),
            dyn=dataclasses.replace(cfg.dyn, ndte=10))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        a0_edge = np.asarray(st.aicen[:, :, -1])
        out = m.run(st, 2, log=lambda *a: None)
        np.testing.assert_allclose(np.asarray(out.aicen[:, :, -1]), a0_edge,
                                   rtol=1e-5)
