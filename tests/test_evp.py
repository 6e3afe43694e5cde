"""EVP dynamics tests: free-drift analytic balance, stress boundedness,
decomposition invariance across shard_map meshes (the bfbflag oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cice5_tpu import ModelConfig, constants as ct
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import evp
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.parallel import Topology, make_mesh, mesh_topology


def setup(ny=24, nx=32, aice_val=0.9, hice=1.0):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, dx_const=20000.0,
                                      dy_const=20000.0),
                      dtype="float64")
    g = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns="open")
    aice = jnp.where(g.tmask, aice_val, 0.0)
    vice = aice * hice
    vsno = aice * 0.0
    z = jnp.zeros((ny, nx), jnp.float64)
    fields = dict(
        aice=aice, vice=vice, vsno=vsno,
        strength=strength_hibler(aice, vice),
        strairxT=jnp.where(g.tmask, 0.1, 0.0), strairyT=z,
        uocn=z, vocn=z, uvel=z, vvel=z,
        stressp=jnp.zeros((4, ny, nx)), stressm=jnp.zeros((4, ny, nx)),
        stress12=jnp.zeros((4, ny, nx)), iceumask=z)
    return cfg, g, topo, fields


class TestEVP:
    def test_free_drift_balance(self):
        """No Coriolis, no strength: steady state obeys
        tau_air = aiu*rhow*Cw*|u|*u  =>  u = sqrt(tau/(aiu rhow Cw))."""
        cfg, g, topo, f = setup()
        g = g.replace(fcor=jnp.zeros_like(g.fcor))
        f["strength"] = jnp.zeros_like(f["strength"])
        p = dyn.EVPParams.classic(3600.0, ndte=360)
        r = evp(3600.0, p, g, topo, **f)
        u = np.asarray(r.uvel)
        umask = np.asarray(g.umask)
        aiu = np.asarray(dyn.to_ugrid(f["aice"], g, topo))
        interior = umask & (aiu > 0.89)
        tau = np.asarray(dyn.to_ugrid(f["strairxT"], g, topo))
        expect = np.sqrt(tau[interior] / (aiu[interior] * ct.rhow * ct.dragio))
        np.testing.assert_allclose(u[interior], expect, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(r.vvel)[interior], 0.0,
                                   atol=1e-3)

    def test_strength_slows_ice(self):
        """Internal stress against a closed boundary reduces drift speed."""
        cfg, g, topo, f = setup(aice_val=0.98, hice=2.5)
        p = dyn.EVPParams.classic(3600.0, ndte=120)
        r_strong = evp(3600.0, p, g, topo, **f)
        f2 = dict(f, strength=jnp.zeros_like(f["strength"]))
        r_free = evp(3600.0, p, g, topo, **f2)
        sp_strong = float(jnp.mean(jnp.abs(r_strong.uvel)))
        sp_free = float(jnp.mean(jnp.abs(r_free.uvel)))
        assert sp_strong < sp_free
        assert np.isfinite(np.asarray(r_strong.stressp)).all()
        # pressure stays within the yield curve scale
        assert float(jnp.max(r_strong.prs_sig)) >= 0.0

    def test_masked_cells_zero(self):
        cfg, g, topo, f = setup()
        p = dyn.EVPParams.classic(3600.0, ndte=60)
        r = evp(3600.0, p, g, topo, **f)
        land = ~np.asarray(g.umask)
        np.testing.assert_array_equal(np.asarray(r.uvel)[land], 0.0)
        np.testing.assert_array_equal(np.asarray(r.vvel)[land], 0.0)

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8)])
    def test_decomposition_invariance(self, mesh_shape):
        """EVP on a sharded mesh must match single-device bitwise-close
        (SURVEY.md section 4.2: the reference's de-facto correctness oracle)."""
        ny, nx = 24, 32
        cfg, g, topo, f = setup(ny, nx)
        p = dyn.EVPParams.classic(3600.0, ndte=40)

        ref = evp(3600.0, p, g, topo, **f)

        mesh = make_mesh(ny=ny, nx=nx, shape=mesh_shape)
        mtopo = mesh_topology(mesh, ew="cyclic", ns="open")
        spec2 = P("Y", "X")
        spec3 = P(None, "Y", "X")

        gridspec = jax.tree.map(lambda _: spec2, g)
        inspecs = dict(aice=spec2, vice=spec2, vsno=spec2, strength=spec2,
                       strairxT=spec2, strairyT=spec2, uocn=spec2, vocn=spec2,
                       uvel=spec2, vvel=spec2, stressp=spec3, stressm=spec3,
                       stress12=spec3, iceumask=spec2)

        from cice5_tpu.models.dynamics.evp import EVPResult
        out_spec = EVPResult(**{
            name: (spec3 if name in ("stressp", "stressm", "stress12")
                   else spec2)
            for name in EVPResult._fields})

        @jax.jit
        def sharded(gg, ff):
            def fn(gg, ff):
                return evp(3600.0, p, gg, mtopo, **ff)
            return shard_map(fn, mesh=mesh, in_specs=(gridspec, inspecs),
                             out_specs=out_spec, check_vma=False)(gg, ff)

        out = sharded(g, f)
        np.testing.assert_allclose(np.asarray(out.uvel), np.asarray(ref.uvel),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.stressp),
                                   np.asarray(ref.stressp), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out.divu), np.asarray(ref.divu),
                                   atol=1e-15)
