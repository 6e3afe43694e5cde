"""Tripole dynamics tests: EVP and remap transport on a tripole topology —
finite results, fold-consistent halo usage, and decomposition invariance
(the bfbflag oracle) across X-sharded meshes where the fold becomes a
mirror ppermute."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cice5_tpu import ModelConfig
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import evp
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.parallel import Topology, make_mesh, mesh_topology


def setup(ny=16, nx=32, aice_val=0.9, hice=1.0):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, dx_const=20000.0,
                                      dy_const=20000.0,
                                      ns_boundary="tripole"),
                      dtype="float64")
    g = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns="tripole")
    aice = jnp.where(g.tmask, aice_val, 0.0)
    z = jnp.zeros((ny, nx), jnp.float64)
    fields = dict(
        aice=aice, vice=aice * hice, vsno=aice * 0.0,
        strength=strength_hibler(aice, aice * hice),
        strairxT=jnp.where(g.tmask, 0.1, 0.0), strairyT=z,
        uocn=z, vocn=z, uvel=z, vvel=z,
        stressp=jnp.zeros((4, ny, nx)), stressm=jnp.zeros((4, ny, nx)),
        stress12=jnp.zeros((4, ny, nx)), iceumask=z)
    return cfg, g, topo, fields


class TestTripoleEVP:
    def test_finite_drift(self):
        cfg, g, topo, f = setup()
        p = dyn.EVPParams.classic(3600.0, ndte=60)
        r = evp(3600.0, p, g, topo, **f)
        assert np.isfinite(np.asarray(r.uvel)).all()
        assert np.isfinite(np.asarray(r.stressp)).all()
        umask = np.asarray(g.umask)
        assert np.abs(np.asarray(r.uvel))[umask].max() > 1e-4

    @pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 4)])
    def test_decomposition_invariance(self, mesh_shape):
        """Sharded tripole EVP == single-device tripole EVP. Exercises the
        fold's mirror ppermute for velocities (NEcorner/vector) and the
        stress partner-swap seeding."""
        cfg, g, topo, f = setup()
        p = dyn.EVPParams.classic(3600.0, ndte=30)
        r_ref = evp(3600.0, p, g, topo, **f)

        ny, nx = 16, 32
        mesh = make_mesh(ny=ny, nx=nx, shape=mesh_shape)
        stopo = mesh_topology(mesh, ew="cyclic", ns="tripole")
        vec = P("Y", "X")
        spat = P(None, "Y", "X")
        specs = dict(
            aice=vec, vice=vec, vsno=vec, strength=vec, strairxT=vec,
            strairyT=vec, uocn=vec, vocn=vec, uvel=vec, vvel=vec,
            stressp=spat, stressm=spat, stress12=spat, iceumask=vec)
        gspec = jax.tree_util.tree_map(
            lambda x: vec if getattr(x, "ndim", 0) == 2 else P(), g)

        @jax.jit
        def run(gs, fs):
            def inner(gl, fl):
                rr = evp(3600.0, p, gl, stopo, **fl)
                return rr.uvel, rr.vvel, rr.stressp
            return shard_map(inner, mesh=mesh, in_specs=(gspec, specs),
                             out_specs=(vec, vec, spat),
                             check_vma=False)(gs, fs)

        u_s, v_s, sp_s = run(g, f)
        r2 = evp(3600.0, p, g, topo, **f)   # recompute (same inputs)
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(r2.uvel),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(r2.vvel),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(sp_s), np.asarray(r2.stressp),
                                   atol=1e-8)


class TestTripoleTransport:
    def test_remap_conserves_on_tripole(self):
        """Area/volume conservation through the fold: uniform northward flow
        pushes ice across the tripole seam; global totals are conserved
        (all-ocean domain, cyclic-x)."""
        from cice5_tpu.models.transport.remap import transport_remap
        from cice5_tpu.state import build_tracer_registry
        cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, dx_const=20000.0,
                                          dy_const=20000.0,
                                          ns_boundary="tripole"),
                          dtype="float64")
        # all-ocean grid for exact conservation
        g = rectgrid(cfg, land_mask=np.ones((16, 32)))
        topo = Topology(ew="cyclic", ns="tripole")
        tr = build_tracer_registry(cfg)
        ny, nx = 16, 32
        ncat = cfg.ncat
        rng = np.random.default_rng(7)
        aicen = jnp.asarray(0.1 + 0.05 * rng.random((ncat, ny, nx)))
        vicen = aicen * 1.5
        vsnon = aicen * 0.1
        trcrn = jnp.zeros((ncat, tr.ntrcr, ny, nx))
        trcrn = trcrn.at[:, tr.nt_Tsfc].set(-5.0)
        uvel = jnp.zeros((ny, nx))
        vvel = jnp.full((ny, nx), 0.05)
        a0 = float(jnp.sum(aicen * g.tarea))
        v0 = float(jnp.sum(vicen * g.tarea))
        a, v, s, t = transport_remap(3600.0, g, topo, tr, uvel=uvel,
                                     vvel=vvel, aicen=aicen, vicen=vicen,
                                     vsnon=vsnon, trcrn=trcrn)
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(float(jnp.sum(a * g.tarea)), a0,
                                   rtol=1e-9)
        np.testing.assert_allclose(float(jnp.sum(v * g.tarea)), v0,
                                   rtol=1e-9)


class TestTripoleModel:
    def test_full_step_smoke(self):
        """Full model step on a tripole-topology domain."""
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=16, nx=24,
                                     ns_boundary="tripole"),
            dyn=dataclasses.replace(cfg.dyn, ndte=20))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        for k in range(2):
            st, diag = m.step(st, m.forcing_at(k))
        assert np.isfinite(np.asarray(st.vicen)).all()
        assert np.isfinite(np.asarray(st.uvel)).all()
        assert bool(diag.therm_converged)
