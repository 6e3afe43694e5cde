"""Transport (upwind) and ridging tests: conservation, monotonicity,
area closure — the reference's global_conservation / ridging-iteration
oracles (ice_transport_driver.F90:1011, ice_mechred.F90:383-453)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import ModelConfig, build_tracer_registry, constants as ct
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics.ridge import ridge_ice, ridge_itd
from cice5_tpu.models.thermo import itd, shared
from cice5_tpu.models.transport.upwind import transport_upwind
from cice5_tpu.parallel import Topology


def make_grid_state(rng, ny=20, nx=24):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, dx_const=10000.0,
                                      dy_const=10000.0), dtype="float64")
    g = rectgrid(cfg)
    tr = build_tracer_registry(cfg)
    topo = Topology(ew="cyclic", ns="open")
    ncat = cfg.ncat
    om = np.asarray(g.hm)
    a = rng.uniform(0.02, 0.15, (ncat, ny, nx)) * om
    aicen = jnp.asarray(a)
    h = np.asarray([0.3, 1.0, 1.9, 3.0, 4.4])[:, None, None]
    vicen = jnp.asarray(a * h)
    vsnon = jnp.asarray(a * 0.1)
    trcrn = jnp.zeros((ncat, tr.ntrcr, ny, nx))
    trcrn = trcrn.at[:, tr.nt_Tsfc].set(-4.0 * om)
    sal = shared.salinity_profile(cfg.nilyr, 3.2)
    for k in range(cfg.nilyr):
        Tm = -float(sal[k]) * ct.depressT
        q = float(shared.ice_enthalpy(jnp.asarray(Tm - 4.0), jnp.asarray(Tm)))
        trcrn = trcrn.at[:, tr.nt_qice + k].set(q * om)
        trcrn = trcrn.at[:, tr.nt_sice + k].set(float(sal[k]) * om)
    trcrn = trcrn.at[:, tr.nt_qsno].set(
        float(shared.snow_enthalpy(jnp.asarray(-9.0))) * om)
    return cfg, g, tr, topo, aicen, vicen, vsnon, trcrn


class TestUpwind:
    def test_conserves_and_monotone(self, rng):
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        ny, nx = g.shape
        u = jnp.where(g.umask, 0.2, 0.0)
        v = jnp.where(g.umask, 0.05, 0.0)
        aice0 = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0) * g.hm

        area = np.asarray(g.tarea)
        tot0 = {k: float(np.sum(np.asarray(x) * area)) for k, x in
                [("a", jnp.sum(aicen, 0)), ("v", jnp.sum(vicen, 0)),
                 ("s", jnp.sum(vsnon, 0))]}
        a2, v2, s2, t2, a02 = transport_upwind(
            1800.0, g, topo, tr, uvel=u, vvel=v, aicen=aicen, vicen=vicen,
            vsnon=vsnon, trcrn=trcrn, aice0=aice0)
        # global conservation on a cyclic-x domain with v-walls closed by
        # umask (flux through open y-boundary is zero since v=0 at edges)
        tot1 = {k: float(np.sum(np.asarray(x) * area)) for k, x in
                [("a", jnp.sum(a2, 0)), ("v", jnp.sum(v2, 0)),
                 ("s", jnp.sum(s2, 0))]}
        for k in tot0:
            np.testing.assert_allclose(tot1[k], tot0[k], rtol=1e-12)
        # monotone: no new extrema in aicen
        assert float(jnp.min(a2)) >= -1e-14
        assert float(jnp.max(a2)) <= float(jnp.max(aicen)) + 1e-12
        # tracers bounded (no new extrema for Tsfc on ice-covered cells)
        has = np.asarray(a2[0]) > ct.puny
        ts = np.asarray(t2[0, tr.nt_Tsfc])[has]
        assert ts.min() >= -4.0 - 1e-9 and ts.max() <= 1e-9

    def test_zero_velocity_is_identity(self, rng):
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        z = jnp.zeros(g.shape)
        aice0 = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0)
        a2, v2, s2, t2, a02 = transport_upwind(
            1800.0, g, topo, tr, uvel=z, vvel=z, aicen=aicen, vicen=vicen,
            vsnon=vsnon, trcrn=trcrn, aice0=aice0)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(aicen),
                                   atol=1e-15)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(vicen),
                                   atol=1e-15)


class TestRidging:
    def test_ridge_itd_sane(self, rng):
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        aice0 = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0)
        r = ridge_itd(aicen, vicen, aice0)
        ak = np.asarray(r.aksum)
        ocean = np.asarray(g.tmask)
        assert (ak[ocean] > 0).all() and (ak[ocean] <= 1 + 1e-12).all()
        ap = np.asarray(r.apartic)
        assert (ap >= -1e-12).all()
        tot = np.asarray(r.apartic0) + ap.sum(0)
        np.testing.assert_allclose(tot[ocean], 1.0, atol=1e-10)
        assert (np.asarray(r.krdg) >= 1.0 - 1e-12).all()

    def test_convergent_ridging_conserves_volume(self, rng):
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        # pack the ice: make asum > 1 (strong convergence scenario)
        aicen = aicen * (1.15 / jnp.maximum(jnp.sum(aicen, 0), 0.5))
        aicen = aicen * g.hm
        vicen = aicen * jnp.asarray([0.3, 1.0, 1.9, 3.0, 4.4])[:, None, None]
        vsnon = aicen * 0.1
        aice0 = jnp.zeros(g.shape)
        hin_max = itd.category_bounds(cfg.ncat, cfg.kitd, cfg.kcatbound)
        conv = jnp.where(g.tmask, 1e-6, 0.0)   # 1/s convergence
        dt = 3600.0

        qice = trcrn[:, tr.nt_qice:tr.nt_qice + cfg.nilyr]
        e0 = float(jnp.sum(jnp.sum(qice, 1) * vicen / cfg.nilyr))
        v0 = float(jnp.sum(vicen))
        s0 = float(jnp.sum(vsnon))

        r = ridge_ice(dt, tr, hin_max, cfg.nilyr, cfg.nslyr, aicen=aicen,
                      vicen=vicen, vsnon=vsnon, trcrn=trcrn, aice0=aice0,
                      rdg_conv=conv, rdg_shear=jnp.zeros_like(conv))

        # area closure: asum == 1 everywhere with ice
        ocean = np.asarray(g.tmask)
        assert np.asarray(r.asum_err)[ocean].max() < 1e-8
        # ice volume conserved exactly
        np.testing.assert_allclose(float(jnp.sum(r.vicen)), v0, rtol=1e-12)
        # snow: part goes to ocean (fresh flux accounts for it)
        s1 = float(jnp.sum(r.vsnon))
        lost = float(jnp.sum(r.fresh)) * dt / ct.rhos
        np.testing.assert_allclose(s1 + lost, s0, rtol=1e-10)
        # ice energy conserved
        qice1 = r.trcrn[:, tr.nt_qice:tr.nt_qice + cfg.nilyr]
        e1 = float(jnp.sum(jnp.sum(qice1, 1) * r.vicen / cfg.nilyr))
        np.testing.assert_allclose(e1, e0, rtol=1e-10)
        # ridging moved ice to thicker categories
        assert float(jnp.sum(r.dvirdgdt)) > 0.0
        # total area decreased (that's what ridging does)
        assert float(jnp.sum(r.aicen)) < float(jnp.sum(aicen))

    def test_no_ridging_when_divergent(self, rng):
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        aice0 = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0) * g.hm
        hin_max = itd.category_bounds(cfg.ncat, cfg.kitd, cfg.kcatbound)
        z = jnp.zeros(g.shape)
        r = ridge_ice(3600.0, tr, hin_max, cfg.nilyr, cfg.nslyr, aicen=aicen,
                      vicen=vicen, vsnon=vsnon, trcrn=trcrn, aice0=aice0,
                      rdg_conv=z, rdg_shear=z)
        np.testing.assert_allclose(np.asarray(r.vicen), np.asarray(vicen),
                                   atol=1e-12)
        assert float(jnp.sum(r.dvirdgdt)) == 0.0


class TestRemap:
    def test_conserves_and_zero_velocity(self, rng):
        from cice5_tpu.models.transport.remap import transport_remap
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        z = jnp.zeros(g.shape)
        # zero velocity: exact identity
        a2, v2, s2, t2 = transport_remap(1800.0, g, topo, tr, uvel=z, vvel=z,
                                         aicen=aicen, vicen=vicen,
                                         vsnon=vsnon, trcrn=trcrn)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(aicen),
                                   atol=1e-14)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(vicen),
                                   atol=1e-14)

    def test_uniform_flow_conserves(self, rng):
        from cice5_tpu.models.transport.remap import transport_remap
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        u = jnp.where(g.umask, 0.3, 0.0)
        v = jnp.where(g.umask, -0.1, 0.0)
        area = np.asarray(g.tarea)
        t0a = float(np.sum(np.asarray(jnp.sum(aicen, 0)) * area))
        t0v = float(np.sum(np.asarray(jnp.sum(vicen, 0)) * area))
        qice = trcrn[:, tr.nt_qice:tr.nt_qice + cfg.nilyr]
        t0e = float(np.sum(np.asarray(
            jnp.sum(jnp.sum(qice, 1) * vicen / cfg.nilyr, 0)) * area))
        a2, v2, s2, t2 = transport_remap(1800.0, g, topo, tr, uvel=u, vvel=v,
                                         aicen=aicen, vicen=vicen,
                                         vsnon=vsnon, trcrn=trcrn)
        t1a = float(np.sum(np.asarray(jnp.sum(a2, 0)) * area))
        t1v = float(np.sum(np.asarray(jnp.sum(v2, 0)) * area))
        qice2 = t2[:, tr.nt_qice:tr.nt_qice + cfg.nilyr]
        t1e = float(np.sum(np.asarray(
            jnp.sum(jnp.sum(qice2, 1) * v2 / cfg.nilyr, 0)) * area))
        np.testing.assert_allclose(t1a, t0a, rtol=1e-12)
        np.testing.assert_allclose(t1v, t0v, rtol=1e-12)
        np.testing.assert_allclose(t1e, t0e, rtol=1e-12)
        # monotone: no negative areas, no new maxima
        assert float(jnp.min(a2)) >= -1e-14
        assert float(jnp.max(a2)) <= float(jnp.max(aicen)) * (1 + 1e-9)

    def test_translation_accuracy_beats_upwind(self, rng):
        """Remap (2nd order) should advect a blob with less diffusion
        than 1st-order upwind."""
        from cice5_tpu.models.transport.remap import transport_remap
        from cice5_tpu.models.transport.upwind import transport_upwind
        cfg, g, tr, topo, aicen, vicen, vsnon, trcrn = make_grid_state(rng)
        ny, nx = g.shape
        # gaussian blob in category 2
        jj, ii = np.mgrid[0:ny, 0:nx]
        blob = 0.8 * np.exp(-((ii - 8) ** 2 + (jj - 10) ** 2) / 8.0)
        blob = blob * np.asarray(g.hm)
        aicen = jnp.zeros_like(aicen).at[2].set(jnp.asarray(blob))
        vicen = aicen * 2.0
        vsnon = aicen * 0.1
        u = jnp.where(g.umask, 0.5, 0.0)
        z = jnp.zeros(g.shape)
        ar = ai = aicen
        vr = vi = vicen
        sr = si = vsnon
        tr_r = tr_i = trcrn
        a0r = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0)
        for _ in range(10):
            ar, vr, sr, tr_r = transport_remap(
                1800.0, g, topo, tr, uvel=u, vvel=z, aicen=ar, vicen=vr,
                vsnon=sr, trcrn=tr_r)
            ai, vi, si, tr_i, a0r = transport_upwind(
                1800.0, g, topo, tr, uvel=u, vvel=z, aicen=ai, vicen=vi,
                vsnon=si, trcrn=tr_i, aice0=a0r)
        # peak preservation: remap's peak decay is well under upwind's
        decay_remap = 0.8 - float(jnp.max(ar))
        decay_upwind = 0.8 - float(jnp.max(ai))
        assert decay_remap < 0.65 * decay_upwind


class TestTransportChecks:
    """Conservation + monotonicity diagnostics
    (ice_transport_driver.F90:1011-1330)."""

    def _setup(self):
        from cice5_tpu.config import GridConfig
        from cice5_tpu import ModelConfig
        from cice5_tpu.grid import rectgrid
        from cice5_tpu.parallel import Topology
        from cice5_tpu.state import build_tracer_registry
        cfg = ModelConfig(grid=GridConfig(nx=24, ny=16, dx_const=20000.0,
                                          dy_const=20000.0),
                          dtype="float64")
        g = rectgrid(cfg, land_mask=np.ones((16, 24)))
        return cfg, g, Topology(ew="cyclic", ns="open"), \
            build_tracer_registry(cfg)

    def test_remap_is_monotone_and_conservative(self, rng):
        from cice5_tpu.models.transport import remap as rem
        cfg, g, topo, tr = self._setup()
        ny, nx = 16, 24
        ncat = cfg.ncat
        aicen = jnp.asarray(0.1 + 0.1 * rng.random((ncat, ny, nx)))
        vicen = aicen * jnp.asarray(1.0 + rng.random((ncat, ny, nx)))
        vsnon = aicen * 0.1
        trcrn = jnp.zeros((ncat, tr.ntrcr, ny, nx))
        trcrn = trcrn.at[:, tr.nt_Tsfc].set(
            jnp.asarray(-10.0 + 5.0 * rng.random((ncat, ny, nx))))
        uvel = jnp.full((ny, nx), 0.08)
        vvel = jnp.full((ny, nx), -0.05)

        # pre-transport bounds for category 0 on the packed tracer table
        hice = vicen[0] / jnp.maximum(aicen[0], ct.puny)
        hsno = vsnon[0] / jnp.maximum(aicen[0], ct.puny)
        tm = jnp.concatenate([hice[None], hsno[None], trcrn[0]], axis=0)
        ttypes = [1, 1] + [1 if tr.depend[i] == 0 else 2
                           for i in range(tr.ntrcr)]
        parents = [-1, -1] + [-1 if tr.depend[i] == 0
                              else (0 if tr.depend[i] == 1 else 1)
                              for i in range(tr.ntrcr)]
        aimask = (aicen[0] > 0.0).astype(jnp.float64)
        tmin, tmax = rem.monotonicity_bounds(tm, aimask, ttypes, parents,
                                             topo)

        m0 = rem.global_conservation(aicen[0], g.tarea, topo)
        a, v, s, t = rem.transport_remap(3600.0, g, topo, tr, uvel=uvel,
                                         vvel=vvel, aicen=aicen,
                                         vicen=vicen, vsnon=vsnon,
                                         trcrn=trcrn)
        m1 = rem.global_conservation(a[0], g.tarea, topo)
        np.testing.assert_allclose(float(m1), float(m0), rtol=1e-12)

        hice_n = v[0] / jnp.maximum(a[0], ct.puny)
        hsno_n = s[0] / jnp.maximum(a[0], ct.puny)
        tm_new = jnp.concatenate([hice_n[None], hsno_n[None], t[0]], axis=0)
        bad = rem.check_monotonicity(tmin, tmax, a[0], tm_new, ttypes,
                                     parents)
        # remap with van-Leer limiting is monotone
        assert int(jnp.sum(bad)) == 0

    def test_violation_detected(self, rng):
        """A synthetic out-of-bounds value IS flagged (the check works)."""
        from cice5_tpu.models.transport import remap as rem
        cfg, g, topo, tr = self._setup()
        ny, nx = 16, 24
        tm = jnp.asarray(rng.random((1, ny, nx)))
        aimask = jnp.ones((ny, nx))
        tmin, tmax = rem.monotonicity_bounds(tm, aimask, [1], [-1], topo)
        tm_bad = tm.at[0, 5, 5].set(100.0)
        bad = rem.check_monotonicity(tmin, tmax, jnp.ones((ny, nx)),
                                     tm_bad, [1], [-1])
        assert bool(bad[0, 5, 5])
        assert int(jnp.sum(bad)) == 1


class TestFixedArea:
    """l_fixed_area remap (ice_transport_remap.F90:229-312, :2253-2388):
    departure areas prescribed from the velocity divergence."""

    def _fields(self, rng, ny=16, nx=24):
        import dataclasses
        from cice5_tpu.config import rect_config
        from cice5_tpu.grid import rectgrid
        from cice5_tpu.state import build_tracer_registry
        cfg = rect_config(ny=ny, nx=nx, dtype="float64",
                          accum_dtype="float64")
        g = rectgrid(cfg, land_mask=np.ones((ny, nx)))
        return cfg, g, Topology(ew="cyclic", ns="open"), \
            build_tracer_registry(cfg)

    def test_uniform_flow_matches_free_scheme(self, rng):
        """For uniform velocity the free geometric departure area equals
        the prescribed divergence area exactly -> identical transport."""
        from cice5_tpu.models.transport import remap as rem
        cfg, g, topo, tr = self._fields(rng)
        ny, nx = g.shape
        ncat = cfg.ncat
        aicen = jnp.asarray(0.2 + 0.5 * rng.random((ncat, ny, nx)))
        vicen = aicen * 1.5
        vsnon = aicen * 0.1
        trcrn = jnp.zeros((ncat, tr.ntrcr, ny, nx))
        trcrn = trcrn.at[:, tr.nt_Tsfc].set(-5.0)
        u = jnp.full((ny, nx), 0.12)
        v = jnp.full((ny, nx), -0.07)
        free = rem.transport_remap(1800.0, g, topo, tr, uvel=u, vvel=v,
                                   aicen=aicen, vicen=vicen, vsnon=vsnon,
                                   trcrn=trcrn)
        fixed = rem.transport_remap(1800.0, g, topo, tr, uvel=u, vvel=v,
                                    aicen=aicen, vicen=vicen, vsnon=vsnon,
                                    trcrn=trcrn, fixed_area=True)
        # away from the open ns boundary the free geometric area equals
        # the prescribed divergence area exactly; at boundary edges the
        # ghost-corner trajectory makes them differ by design (the fixed
        # scheme pins the flux to the prescribed value there)
        for a, b, name in zip(free, fixed, "avst"):
            np.testing.assert_allclose(np.asarray(a)[..., 1:, :],
                                       np.asarray(b)[..., 1:, :],
                                       atol=1e-12, err_msg=name)

    def test_prescribed_areas_exact(self, rng):
        """With unit mass everywhere, the remapped edge mass flux equals
        the prescribed edgearea EXACTLY (the :2921-2954 bugcheck)."""
        from cice5_tpu.models.transport import remap as rem
        cfg, g, topo, tr = self._fields(rng)
        ny, nx = g.shape
        # smooth non-uniform velocity field
        jj, ii = np.mgrid[0:ny, 0:nx]
        u = jnp.asarray(0.15 * np.sin(2 * np.pi * ii / nx)
                        * np.cos(np.pi * jj / ny))
        v = jnp.asarray(0.1 * np.cos(2 * np.pi * ii / nx)
                        * np.sin(np.pi * jj / ny))
        dt = 1800.0
        geom = rem.remap_geometry(dt, g, topo, uvel=u, vvel=v,
                                  fixed_area=True)
        # mm = 1 everywhere: departure-region mass integral = its area
        mm = jnp.ones((ny, nx))
        tm = jnp.zeros((1, ny, nx))
        mm2, _ = rem.remap_fields(g, topo, geom, mm=mm, tm=tm,
                                  tracer_type=(1,), parent=(-1,))
        # total area conservation: uniform mass stays uniform up to the
        # prescribed divergence
        from cice5_tpu.parallel import extend
        uvE = extend(jnp.stack([u, v]), topo,
                     loc=rem.FieldLoc.NECORNER, kind=rem.FieldType.VECTOR)
        htnE = extend(g.HTN, topo, loc=rem.FieldLoc.NFACE)
        vE = uvE[1]
        ea_n = 0.5 * (vE[0:ny + 1, 0:nx] + vE[0:ny + 1, 1:nx + 1]) \
            * htnE[0:ny + 1, 1:nx + 1] * dt
        # fluxes actually realized by the triangles
        fn_area = np.asarray(jnp.sum(geom.north.triarea, axis=0))
        np.testing.assert_allclose(fn_area, np.asarray(ea_n),
                                   atol=1e-9 * float(g.tarea[0, 0]))
        # every north-edge departure area equals the prescribed value
        fe_area = np.asarray(jnp.sum(geom.east.triarea, axis=0))
        assert np.isfinite(fe_area).all()
        assert np.isfinite(np.asarray(mm2)).all()
