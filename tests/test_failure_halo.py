"""In-step failure detection (the jitted l_stop analog,
ice_step_mod.F90:858-867) and open-boundary halo extrapolation
(mpi/ice_boundary.F90:7070 ice_HaloExtrapolate)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cice5_tpu.config import rect_config
from cice5_tpu.parallel import Topology, extend, make_mesh
from cice5_tpu.parallel.mesh import mesh_topology


class TestInStepFailureDetection:
    def _model(self):
        from cice5_tpu.driver.model import Model
        cfg = rect_config(ny=12, nx=16)
        cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=8))
        return Model(cfg)

    def test_seeded_nan_trips_within_one_step(self):
        m = self._model()
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st = st.replace(vicen=st.vicen.at[0, 6, 7].set(jnp.nan))
        logs = []
        with pytest.raises(RuntimeError, match="check_state failed"):
            m.run(st, nsteps=3, check_every=100, log=logs.append)
        # the dump names the offending field/cell
        assert any("vicen" in s or "aicen" in s for s in logs)

    def test_healthy_state_reports_zero(self):
        m = self._model()
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st2, diag = m.step(st, m.forcing_at(0))
        assert int(diag.state_bad) == 0


class TestHaloExtrapolate:
    def test_linear_ghosts_unsharded(self, rng):
        topo = Topology(ew="open", ns="open")
        x = jnp.asarray(rng.random((5, 7)))
        E = extend(x, topo, open_fill="extrapolate")
        np.testing.assert_allclose(np.asarray(E[1:-1, 0]),
                                   np.asarray(2 * x[:, 0] - x[:, 1]),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(E[1:-1, -1]),
                                   np.asarray(2 * x[:, -1] - x[:, -2]),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(E[-1, 1:-1]),
                                   np.asarray(2 * x[-1] - x[-2]),
                                   rtol=1e-12)
        # cyclic-x keeps the wrap even with extrapolate requested
        topo2 = Topology(ew="cyclic", ns="open")
        E2 = extend(x, topo2, open_fill="extrapolate")
        np.testing.assert_array_equal(np.asarray(E2[1:-1, 0]),
                                      np.asarray(x[:, -1]))

    def test_sharded_matches_unsharded(self, rng):
        ny, nx = 8, 16
        x = jnp.asarray(rng.random((ny, nx)))
        topo = Topology(ew="open", ns="open")
        ref = np.asarray(extend(x, topo, open_fill="extrapolate"))

        mesh = make_mesh(ny=ny, nx=nx, shape=(2, 4))
        stopo = mesh_topology(mesh, ew="open", ns="open")

        @jax.jit
        def run(xs):
            def inner(xl):
                # return the interior + our ghost ring reassembled per
                # shard is awkward; instead apply a stencil consuming the
                # ghosts: 5-point mean, which differs between zero-fill
                # and extrapolation at the edges
                E = extend(xl, stopo, open_fill="extrapolate")
                return 0.25 * (E[:-2, 1:-1] + E[2:, 1:-1]
                               + E[1:-1, :-2] + E[1:-1, 2:])
            return shard_map(inner, mesh=mesh, in_specs=P("Y", "X"),
                             out_specs=P("Y", "X"), check_vma=False)(xs)

        got = np.asarray(run(x))
        want = 0.25 * (ref[:-2, 1:-1] + ref[2:, 1:-1]
                       + ref[1:-1, :-2] + ref[1:-1, 2:])
        np.testing.assert_allclose(got, want, rtol=1e-12)
