"""Chunked (comm/compute-overlapped) EVP: K subcycles per halo exchange
(evp.py evp_chunked + parallel/halo.py extend_wide).

The contract: interior results equal the per-subcycle-exchange loop (the
margin-decay light cone never reaches the interior), while the sharded
exchange count drops from ndte to ndte/K (SURVEY §2.10.4 / BASELINE.md
north star; the reference exchanges every subcycle,
ice_dyn_evp.F90:392-399).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cice5_tpu.config import rect_config
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import evp, evp_chunked
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.parallel import Topology, extend_wide, make_mesh
from cice5_tpu.parallel.mesh import mesh_topology

NY, NX = 32, 48


def _setup(rng, ns="open"):
    cfg = rect_config(ny=NY, nx=NX, dtype="float64", accum_dtype="float64")
    g = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns=ns)
    aice = jnp.where(g.tmask, 0.8 + 0.15 * jnp.asarray(
        rng.random((NY, NX))), 0.0)
    z = jnp.zeros((NY, NX), jnp.float64)
    f = dict(aice=aice, vice=aice * 2.0, vsno=aice * 0.1,
             strength=strength_hibler(aice, aice * 2.0),
             strairxT=jnp.where(g.tmask, 0.12, 0.0),
             strairyT=jnp.where(g.tmask, -0.05, 0.0),
             uocn=z + 0.02, vocn=z - 0.01, uvel=z, vvel=z,
             stressp=jnp.zeros((4, NY, NX)), stressm=jnp.zeros((4, NY, NX)),
             stress12=jnp.zeros((4, NY, NX)), iceumask=z)
    return cfg, g, topo, f


class TestExtendWide:
    def test_matches_repeated_extend(self, rng):
        from cice5_tpu.parallel import extend
        topo = Topology(ew="cyclic", ns="open")
        x = jnp.asarray(rng.random((6, 8)))
        w2 = extend_wide(x, topo, 2)
        e2 = extend(extend(x, topo), topo)
        # interior ring 1 agrees; ring 2 differs only at the open-boundary
        # fill (extend() of an extended array re-wraps ghost columns)
        np.testing.assert_array_equal(np.asarray(w2[1:-1, 1:-1]),
                                      np.asarray(e2[1:-1, 1:-1]))
        assert w2.shape == (10, 12)
        # cyclic x: widest ghost columns wrap the true data
        np.testing.assert_array_equal(np.asarray(w2[2:-2, :2]),
                                      np.asarray(x[:, -2:]))
        # open y: zero fill
        assert float(jnp.abs(w2[:2]).max()) == 0.0


class TestChunkedSingleDevice:
    @pytest.mark.parametrize("K", [5, 10])
    def test_matches_per_subcycle(self, rng, K):
        cfg, g, topo, f = _setup(rng)
        p = dyn.EVPParams.classic(3600.0, ndte=30)
        r_ref = evp(3600.0, p, g, topo, **f)
        r_chk = evp_chunked(3600.0, p, g, topo, K=K, **f)
        for name in ("uvel", "vvel", "stressp", "stressm", "stress12",
                     "divu", "rdg_conv", "strocnxT"):
            a = np.asarray(getattr(r_ref, name))
            b = np.asarray(getattr(r_chk, name))
            np.testing.assert_allclose(a, b, atol=2e-11, err_msg=name)

    def test_rejects_bad_chunk(self, rng):
        cfg, g, topo, f = _setup(rng)
        p = dyn.EVPParams.classic(3600.0, ndte=30)
        with pytest.raises(ValueError):
            evp_chunked(3600.0, p, g, topo, K=7, **f)
        tp = Topology(ew="cyclic", ns="tripoleT")   # T-fold: unsupported
        with pytest.raises(NotImplementedError):
            evp_chunked(3600.0, p, g, tp, K=5, **f)


def _sharded_run(fn, g, f, mesh_shape, ns="open"):
    mesh = make_mesh(ny=NY, nx=NX, shape=mesh_shape)
    stopo = mesh_topology(mesh, ew="cyclic", ns=ns)
    vec = P("Y", "X")
    spat = P(None, "Y", "X")
    specs = {k: (spat if v.ndim == 3 else vec) for k, v in f.items()}
    gspec = jax.tree_util.tree_map(
        lambda x: vec if getattr(x, "ndim", 0) == 2 else P(), g)

    def wrapped(gs, fs):
        def inner(gl, fl):
            rr = fn(gl, stopo, **fl)
            return rr.uvel, rr.vvel, rr.stressp
        return shard_map(inner, mesh=mesh, in_specs=(gspec, specs),
                         out_specs=(vec, vec, spat), check_vma=False)(gs, fs)
    return wrapped


@pytest.mark.slow
class TestChunkedSharded:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
    def test_decomposition_invariance(self, rng, mesh_shape):
        """Sharded chunked EVP == single-device per-subcycle EVP."""
        cfg, g, topo, f = _setup(rng)
        p = dyn.EVPParams.classic(3600.0, ndte=30)
        r_ref = evp(3600.0, p, g, topo, **f)

        fn = lambda gl, tl, **kw: evp_chunked(3600.0, p, gl, tl, K=5, **kw)
        u, v, sp = jax.jit(_sharded_run(fn, g, f, mesh_shape))(g, f)
        np.testing.assert_allclose(np.asarray(u), np.asarray(r_ref.uvel),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(r_ref.vvel),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(sp),
                                   np.asarray(r_ref.stressp), atol=1e-7)

    def test_exchange_count_reduced(self, rng):
        """The whole point: ndte/K margin exchanges instead of ndte.

        Structural check on the lowered sharded program: the per-subcycle
        loop of `evp` issues ppermutes INSIDE its ndte-trip subcycle loop
        (one exchange per subcycle); `evp_chunked`'s K-trip inner loop is
        communication-free — its only in-loop exchanges live in the
        nchunks-trip chunk loop (ndte/K executions)."""
        cfg, g, topo, f = _setup(rng)
        p = dyn.EVPParams.classic(3600.0, ndte=30)

        def subcycle_exchanges(fn):
            """Runtime ppermute executions INSIDE loop bodies (trip counts
            from scan `length` params — the subcycling exchanges; the O(1)
            prep exchanges outside loops are excluded)."""
            wrapped = _sharded_run(fn, g, f, (2, 4))
            jaxpr = jax.make_jaxpr(wrapped)(g, f)

            def subjaxprs(eq):
                for v in eq.params.values():
                    for s in (v if isinstance(v, (list, tuple)) else [v]):
                        if hasattr(s, "eqns"):
                            yield s
                        elif hasattr(s, "jaxpr"):
                            yield s.jaxpr

            def count_all(jx, mult):
                n = 0
                for eq in jx.eqns:
                    prim = str(eq.primitive)
                    if "ppermute" in prim:
                        n += mult
                    m = mult
                    if prim == "scan":
                        m = mult * eq.params.get("length", 1)
                    for s in subjaxprs(eq):
                        n += count_all(s, m)
                return n

            def count_in_loops(jx):
                n = 0
                for eq in jx.eqns:
                    prim = str(eq.primitive)
                    if prim == "scan":
                        for s in subjaxprs(eq):
                            n += count_all(s, eq.params.get("length", 1))
                    elif prim == "while":
                        for s in subjaxprs(eq):
                            n += count_all(s, 1)
                    else:
                        for s in subjaxprs(eq):
                            n += count_in_loops(s)
                return n
            return count_in_loops(jaxpr.jaxpr)

        n_ref = subcycle_exchanges(
            lambda gl, tl, **kw: evp(3600.0, p, gl, tl, **kw))
        n_chk = subcycle_exchanges(
            lambda gl, tl, **kw: evp_chunked(3600.0, p, gl, tl, K=10,
                                             **kw))
        # per-subcycle evp: one (u,v) exchange per subcycle = ndte * (two
        # mesh axes x two sides); chunked: one slab exchange per chunk
        assert n_ref >= 30 * 4, n_ref
        assert n_chk <= (30 // 10) * 4, n_chk
        assert n_chk * 9 <= n_ref, (n_chk, n_ref)


@pytest.mark.slow
class TestChunkedInStep:
    def test_sharded_full_step_matches(self):
        """evp_algorithm='chunked' through the full sharded step."""
        import dataclasses
        from cice5_tpu.driver.model import Model
        from cice5_tpu.driver.sharded import ShardedModel
        cfg = rect_config(ny=16, nx=32, dtype="float64",
                          accum_dtype="float64")
        cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=12))
        cfgc = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=12,
                                                   evp_algorithm="chunked",
                                                   evp_chunk=4))
        ref = Model(cfg)
        st = ref.init_state(ice_mask=np.asarray(ref.grid.tmask))
        frc = ref.forcing_at(0)
        st1, _ = ref.step(st, frc)

        sm = ShardedModel(cfgc, devices=jax.devices()[:8],
                          mesh_shape=(2, 4))
        stn, _ = sm.step(sm.put(st), sm.put(frc))
        for name in ("aicen", "vicen", "uvel", "vvel"):
            a = np.asarray(getattr(st1, name))
            b = np.asarray(getattr(stn, name))
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(a, b, atol=1e-9 * scale,
                                       err_msg=name)


@pytest.mark.slow
class TestChunkedTripole:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
    def test_tripole_decomposition_invariance(self, rng, mesh_shape):
        """Sharded chunked EVP on a TRIPOLE seam == single-device chunked
        (the fold margin becomes a mirror ppermute across X shards)."""
        cfg, g, topo, f = _setup(rng, ns="tripole")
        p = dyn.EVPParams.classic(3600.0, ndte=30)
        r_ref = evp_chunked(3600.0, p, g, topo, K=5, **f)

        fn = lambda gl, tl, **kw: evp_chunked(3600.0, p, gl, tl, K=5, **kw)
        u, v, sp = jax.jit(_sharded_run(fn, g, f, mesh_shape,
                                        ns="tripole"))(g, f)
        np.testing.assert_allclose(np.asarray(u), np.asarray(r_ref.uvel),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(r_ref.vvel),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(sp),
                                   np.asarray(r_ref.stressp), atol=1e-7)

    def test_tripole_chunked_vs_per_subcycle(self, rng):
        """Single-device: chunked tripole == per-subcycle tripole evp
        (both also equal the doubled-domain oracle,
        test_tripole_oracle.py)."""
        cfg, g, topo, f = _setup(rng, ns="tripole")
        p = dyn.EVPParams.classic(3600.0, ndte=30)
        r_ref = evp(3600.0, p, g, topo, **f)
        r_chk = evp_chunked(3600.0, p, g, topo, K=5, **f)
        np.testing.assert_allclose(np.asarray(r_chk.uvel),
                                   np.asarray(r_ref.uvel), atol=1e-10)
        np.testing.assert_allclose(np.asarray(r_chk.stressp),
                                   np.asarray(r_ref.stressp), atol=1e-7)
