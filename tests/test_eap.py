"""EAP dynamics tests: yield-table values against a direct scalar mirror of
the reference integration, anisotropic stress sanity, structure tensor
evolution bounds, driver drift + decomposition invariance, full-step smoke."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cice5_tpu import ModelConfig, constants as ct
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics import eap as eapmod
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.eap import (build_yield_tables, eap, stepa,
                                           update_stress_rdg)
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.parallel import Topology, make_mesh, mesh_topology


def _scalar_kernels(x, y, z, phi):
    """Direct scalar transcription of the reference integrand structure
    (ice_dyn_eap.F90:660-1046) used as an independent oracle."""
    pih = math.pi / 2
    n1t2i11 = math.cos(z + pih - phi) * math.cos(z + phi)
    n1t2i12 = math.cos(z + pih - phi) * math.sin(z + phi)
    n1t2i21 = math.sin(z + pih - phi) * math.cos(z + phi)
    n1t2i22 = math.sin(z + pih - phi) * math.sin(z + phi)
    n2t1i11 = math.cos(z - pih + phi) * math.cos(z - phi)
    n2t1i12 = math.cos(z - pih + phi) * math.sin(z - phi)
    n2t1i21 = math.sin(z - pih + phi) * math.cos(z - phi)
    n2t1i22 = math.sin(z - pih + phi) * math.sin(z - phi)
    t1t2i11 = math.cos(z - phi) * math.cos(z + phi)
    t1t2i12 = math.cos(z - phi) * math.sin(z + phi)
    t1t2i21 = math.sin(z - phi) * math.cos(z + phi)
    t1t2i22 = math.sin(z - phi) * math.sin(z + phi)
    t2t1i12 = math.cos(z + phi) * math.sin(z - phi)
    t2t1i21 = math.sin(z + phi) * math.cos(z - phi)
    d11 = math.cos(y) ** 2 * (math.cos(x) + math.sin(x) * math.tan(y) ** 2)
    d12 = math.cos(y) ** 2 * math.tan(y) * (-math.cos(x) + math.sin(x))
    d22 = math.cos(y) ** 2 * (math.sin(x) + math.cos(x) * math.tan(y) ** 2)
    IIn1t2 = n1t2i11 * d11 + (n1t2i12 + n1t2i21) * d12 + n1t2i22 * d22
    IIn2t1 = n2t1i11 * d11 + (n2t1i12 + n2t1i21) * d12 + n2t1i22 * d22
    IIt1t2 = t1t2i11 * d11 + (t1t2i12 + t1t2i21) * d12 + t1t2i22 * d22
    H1 = 1.0 if -IIn1t2 >= ct.puny else 0.0
    H2 = 1.0 if -IIn2t1 >= ct.puny else 0.0
    sgn = math.copysign(1.0, IIt1t2 + ct.puny)
    r11 = -H1 * n1t2i11 - H2 * n2t1i11
    r12 = 0.5 * ((-H1 * n1t2i12 - H2 * n2t1i12)
                 + (-H1 * n1t2i21 - H2 * n2t1i21))
    r22 = -H1 * n1t2i22 - H2 * n2t1i22
    s11 = sgn * (H1 * t1t2i11 + H2 * t1t2i11)
    s12 = 0.5 * (sgn * (H1 * t1t2i12 + H2 * t2t1i12)
                 + sgn * (H1 * t1t2i21 + H2 * t2t1i21))
    s22 = sgn * (H1 * t1t2i22 + H2 * t1t2i22)
    return r11, r12, r22, s11, s12, s22


class TestYieldTables:
    def test_shapes_finite(self):
        t = build_yield_tables()
        assert t.shape == (6, 41, 41, 21)
        assert np.isfinite(t).all()
        # normalized per-floe stresses are O(1)
        assert np.abs(t).max() < 10.0
        # the bulk of the ridging normal-stress table is compressive
        assert np.mean(t[0] < 0) > 0.5

    def test_against_scalar_integration(self):
        """Spot-check table entries against a scalar re-integration with the
        reference loop structure (ice_dyn_eap.F90:585-600)."""
        t = build_yield_tables()
        nz = 100
        phi = math.pi / 12
        dx = math.pi / 40
        dy = math.pi / 40
        da = 0.5 / 20
        dz = math.pi / nz
        for (ix, iy, ia) in [(5, 7, 3), (20, 1, 10), (41, 41, 20)]:
            x = (math.pi + math.pi / 4 - dx) + ix * dx
            y = -dy + iy * dy
            a = (0.5 - da) + ia * da
            w1 = float(eapmod._w1(a))
            w2 = float(eapmod._w2(a))
            acc = np.zeros(6)
            for iz in range(1, nz + 1):
                z = -math.pi / 2 + iz * dz
                k = _scalar_kernels(x, y, z, phi)
                wt = w1 * math.exp(-w2 * z * z) * dz / math.sin(2 * phi)
                acc += wt * np.asarray(k)
            acc[np.abs(acc) < 1e-6] = 0.0
            got = t[:, ix - 1, iy - 1, ia - 1]
            np.testing.assert_allclose(got, acc, atol=1e-9)

    def test_isotropic_limit_row(self):
        """a = 1 row is the delta-function limit: finite, non-positive
        ridging normal stress."""
        t = build_yield_tables()
        last = t[:, :, :, -1]
        assert np.isfinite(last).all()
        assert np.abs(last).max() < 10.0


class TestUpdateStressRdg:
    def test_convergence_gives_compression(self):
        """Isotropic ice under pure convergence: negative stressp
        (compressive), tiny shear stress."""
        tables = jnp.asarray(build_yield_tables())
        B = (8,)
        f = lambda v: jnp.full(B, float(v), jnp.float64)
        r = update_stress_rdg(f(-1.0e4), f(0.0), f(0.0),
                              f(0.5), f(0.0), f(2.0e4), tables)
        assert float(jnp.max(r.stressp)) < 0.0
        assert abs(float(jnp.max(r.stress12))) < abs(
            float(jnp.min(r.stressp))) * 0.2
        # ridging rate function is a dissipation: sigma_r : D >= 0 when
        # both are compressive (rdg_conv clips at zero; area closing is
        # backstopped by -divu_adv in ridge_prep, ice_mechred.F90:88)
        assert float(jnp.min(r.alphar)) >= 0.0

    def test_stress_scales_with_strength(self):
        tables = jnp.asarray(build_yield_tables())
        f = lambda v: jnp.full((4,), float(v), jnp.float64)
        r1 = update_stress_rdg(f(-1e4), f(2e3), f(1e3), f(0.6), f(0.05),
                               f(1.0e4), tables)
        r2 = update_stress_rdg(f(-1e4), f(2e3), f(1e3), f(0.6), f(0.05),
                               f(3.0e4), tables)
        np.testing.assert_allclose(np.asarray(r2.stressp),
                                   3.0 * np.asarray(r1.stressp), rtol=1e-12)


class TestStepa:
    def test_structure_tensor_stays_bounded(self):
        """With zero stress the tensor relaxes toward isotropy (0.5)."""
        B = (3, 3)
        a11 = jnp.full((4,) + B, 0.9, jnp.float64)
        a12 = jnp.full((4,) + B, 0.2, jnp.float64)
        stress = jnp.zeros((12,) + B, jnp.float64)
        dtei = 120.0 / 3600.0
        for _ in range(2000):
            a11, a12, m11, m12 = stepa(dtei, stress, a11, a12)
        assert abs(float(jnp.mean(a11)) - 0.5) < 0.05
        assert abs(float(jnp.mean(a12))) < 0.05


def setup(ny=24, nx=32, aice_val=0.9, hice=1.0):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, dx_const=20000.0,
                                      dy_const=20000.0),
                      dtype="float64")
    g = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns="open")
    aice = jnp.where(g.tmask, aice_val, 0.0)
    vice = aice * hice
    z = jnp.zeros((ny, nx), jnp.float64)
    fields = dict(
        aice=aice, vice=vice, vsno=aice * 0.0,
        strength=strength_hibler(aice, vice),
        strairxT=jnp.where(g.tmask, 0.1, 0.0), strairyT=z,
        uocn=z, vocn=z, uvel=z, vvel=z,
        stressp=jnp.zeros((4, ny, nx)), stressm=jnp.zeros((4, ny, nx)),
        stress12=jnp.zeros((4, ny, nx)), iceumask=z,
        a11n=jnp.full((4, ny, nx), 0.5), a12n=jnp.zeros((4, ny, nx)))
    return cfg, g, topo, fields


class TestEAPDriver:
    def test_wind_driven_drift(self):
        cfg, g, topo, f = setup()
        p = dyn.EVPParams.classic(3600.0, ndte=120)
        r = eap(3600.0, p, g, topo, **f)
        u = np.asarray(r.evp.uvel)
        umask = np.asarray(g.umask)
        assert np.isfinite(u).all()
        # wind stress in +x pushes ice in +x
        assert u[umask].max() > 1e-3
        # anisotropic stress stays bounded by ~strength
        smax = float(np.abs(np.asarray(r.evp.stressp)).max())
        assert smax < 5.0 * float(jnp.max(f["strength"]))
        # structure tensor physical: a11 in [0, 1], |a12| <= 0.5
        assert 0.0 <= float(jnp.min(r.a11n)) and float(jnp.max(r.a11n)) <= 1.0
        assert float(jnp.max(jnp.abs(r.a12n))) <= 0.5 + 1e-12

    @pytest.mark.parametrize("mesh_shape", [(2, 4)])
    def test_decomposition_invariance(self, mesh_shape):
        cfg, g, topo, f = setup(ny=16, nx=32)
        p = dyn.EVPParams.classic(3600.0, ndte=40)
        r_ref = eap(3600.0, p, g, topo, **f)

        mesh = make_mesh(ny=16, nx=32, shape=mesh_shape)
        stopo = mesh_topology(mesh, ew="cyclic", ns="open")
        spat = P(None, "Y", "X")
        vec = P("Y", "X")
        specs = dict(
            aice=vec, vice=vec, vsno=vec, strength=vec, strairxT=vec,
            strairyT=vec, uocn=vec, vocn=vec, uvel=vec, vvel=vec,
            stressp=spat, stressm=spat, stress12=spat, iceumask=vec,
            a11n=spat, a12n=spat)
        gspec = jax.tree_util.tree_map(
            lambda x: vec if getattr(x, "ndim", 0) == 2 else P(), g)

        @jax.jit
        def run(gs, fs):
            def inner(gl, fl):
                rr = eap(3600.0, p, gl, stopo, **fl)
                return rr.evp.uvel, rr.evp.vvel, rr.a11n
            return shard_map(inner, mesh=mesh,
                             in_specs=(gspec, specs),
                             out_specs=(vec, vec, spat),
                             check_vma=False)(gs, fs)

        u_s, v_s, a11_s = run(g, f)
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(r_ref.evp.uvel),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(a11_s), np.asarray(r_ref.a11n),
                                   atol=1e-11)


class TestEAPStep:
    def test_full_step_smoke(self):
        import dataclasses
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=24, nx=32),
            dyn=dataclasses.replace(cfg.dyn, kdyn=2, ndte=20))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st, diag = m.step(st, m.forcing_at(0))
        assert np.isfinite(np.asarray(st.uvel)).all()
        assert np.isfinite(np.asarray(st.a11n)).all()
        a11 = np.asarray(st.a11n)
        assert a11.min() >= -1e-9 and a11.max() <= 1.0 + 1e-9


def test_eap_step_tensor_diagnostics():
    """A kdyn=2 full step populates the strain-rate and yield-stress
    tensor diagnostics (ice_dyn_eap.F90:1278-1284,1330-1339) in StepDiag;
    EVP steps leave them zero."""
    import dataclasses
    import jax.numpy as jnp
    from cice5_tpu.config import rect_config
    from cice5_tpu.driver.model import Model

    cfg = rect_config(24, 32)
    cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, kdyn=2, ndte=30))
    m = Model(cfg)
    st = m.init_state(ice_mask=m.grid.tmask)
    st, d = m.step(st, m.forcing_at(0))
    for arr in (d.e11, d.e12, d.e22, d.yieldstress11, d.yieldstress12,
                d.yieldstress22):
        assert bool(jnp.isfinite(arr).all())
    assert float(jnp.abs(d.e11).max()) > 0.0
    assert float(jnp.abs(d.yieldstress11).max()) > 0.0
