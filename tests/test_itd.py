"""ITD tests: conservation of area/volume/energy/tracers under category
shifts, rebin, linear remapping, frazil growth, lateral melt — the
reference's column_conservation_check oracle (ice_itd.F90:1299)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import ModelConfig, build_tracer_registry, constants as ct
from cice5_tpu.config import TracerConfig
from cice5_tpu.models.thermo import itd, shared


def make_state(rng, cfg, tr, B=(6,), seed_thick=None):
    ncat = cfg.ncat
    hin_max = itd.category_bounds(ncat, cfg.kitd, cfg.kcatbound)
    a = rng.uniform(0.01, 0.18, (ncat,) + B)
    aicen = jnp.asarray(a)
    # thickness at category midpoints (cap top category)
    mids = [(hin_max[n] + min(hin_max[n + 1], hin_max[n] + 2.0)) / 2
            for n in range(ncat)]
    h = np.asarray(mids)[:, None] * np.ones((1,) + B)
    if seed_thick is not None:
        h = h * seed_thick
    vicen = jnp.asarray(a * h)
    vsnon = jnp.asarray(a * 0.1)
    trcrn = jnp.zeros((ncat, tr.ntrcr) + B)
    trcrn = trcrn.at[:, tr.nt_Tsfc].set(-5.0)
    sal = shared.salinity_profile(cfg.nilyr, 3.2)
    for k in range(cfg.nilyr):
        Tm = -float(sal[k]) * ct.depressT
        trcrn = trcrn.at[:, tr.nt_qice + k].set(
            float(shared.ice_enthalpy(jnp.asarray(Tm - 3.0), jnp.asarray(Tm))))
        trcrn = trcrn.at[:, tr.nt_sice + k].set(float(sal[k]))
    for k in range(cfg.nslyr):
        trcrn = trcrn.at[:, tr.nt_qsno + k].set(
            float(shared.snow_enthalpy(jnp.asarray(-8.0))))
    return hin_max, aicen, vicen, vsnon, trcrn


def totals(tr, cfg, aicen, vicen, vsnon, trcrn):
    qice = trcrn[:, tr.nt_qice:tr.nt_qice + cfg.nilyr]
    qsno = trcrn[:, tr.nt_qsno:tr.nt_qsno + cfg.nslyr]
    return dict(
        a=np.asarray(jnp.sum(aicen, 0)),
        v=np.asarray(jnp.sum(vicen, 0)),
        s=np.asarray(jnp.sum(vsnon, 0)),
        e=np.asarray(jnp.sum(jnp.sum(qice, 1) * vicen / cfg.nilyr, 0)),
        es=np.asarray(jnp.sum(jnp.sum(qsno, 1) * vsnon / cfg.nslyr, 0)),
        salt=np.asarray(jnp.sum(
            jnp.sum(trcrn[:, tr.nt_sice:tr.nt_sice + cfg.nilyr], 1)
            * vicen / cfg.nilyr, 0)),
    )


@pytest.fixture
def cfg():
    return ModelConfig(dtype="float64")


@pytest.fixture
def tr(cfg):
    return build_tracer_registry(cfg)


class TestBounds:
    def test_kcatbound1(self):
        h = itd.category_bounds(5, 1, 1)
        np.testing.assert_allclose(h, [0.0, 0.6, 1.4, 2.4, 3.6, 5.0])

    def test_wmo(self):
        h = itd.category_bounds(5, 1, 2)
        np.testing.assert_allclose(h[1:5], [0.3, 0.7, 1.2, 2.0])


class TestAggregate:
    def test_aggregate_roundtrip(self, rng, cfg, tr):
        _, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        agg = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
        np.testing.assert_allclose(np.asarray(agg.aice),
                                   np.asarray(jnp.sum(aicen, 0)))
        # uniform tracers: aggregate equals the uniform value
        np.testing.assert_allclose(np.asarray(agg.trcr[tr.nt_Tsfc]), -5.0)


class TestShiftRebin:
    def test_shift_conserves(self, rng, cfg, tr):
        hin_max, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        t0 = totals(tr, cfg, aicen, vicen, vsnon, trcrn)
        B = aicen.shape[1:]
        ncat = cfg.ncat
        donor = jnp.full((ncat - 1,) + B, -1, jnp.int32)
        da = jnp.zeros((ncat - 1,) + B)
        dv = jnp.zeros_like(da)
        # shift half of cat 0 up, half of cat 3 down at boundary 2
        donor = donor.at[0].set(0)
        da = da.at[0].set(aicen[0] * 0.5)
        dv = dv.at[0].set(vicen[0] * 0.5)
        donor = donor.at[2].set(3)
        da = da.at[2].set(aicen[3] * 0.5)
        dv = dv.at[2].set(vicen[3] * 0.5)
        a2, v2, s2, t2 = itd.shift_ice(tr, aicen, vicen, vsnon, trcrn,
                                       donor, da, dv)
        t1 = totals(tr, cfg, a2, v2, s2, t2)
        for k in t0:
            np.testing.assert_allclose(t1[k], t0[k], rtol=1e-12, err_msg=k)
        assert np.all(np.asarray(a2) >= -1e-15)

    def test_rebin_enforces_bounds(self, rng, cfg, tr):
        hin_max, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        # force cat 2 too thick and cat 4 too thin
        vicen = vicen.at[2].set(aicen[2] * (hin_max[3] + 1.0))
        vicen = vicen.at[4].set(aicen[4] * (hin_max[3] * 0.9))
        t0 = totals(tr, cfg, aicen, vicen, vsnon, trcrn)
        a2, v2, s2, t2 = itd.rebin(tr, hin_max, aicen, vicen, vsnon, trcrn)
        t1 = totals(tr, cfg, a2, v2, s2, t2)
        for k in t0:
            np.testing.assert_allclose(t1[k], t0[k], rtol=1e-10, err_msg=k)
        h = np.asarray(v2 / np.maximum(np.asarray(a2), 1e-11))
        a2np = np.asarray(a2)
        for n in range(cfg.ncat):
            hasice = a2np[n] > ct.puny
            if n < cfg.ncat - 1:
                assert np.all(h[n][hasice] <= hin_max[n + 1] + 1e-9)
            assert np.all(h[n][hasice] >= hin_max[n] - 1e-9)


class TestLinearITD:
    def test_conserves_after_uniform_growth(self, rng, cfg, tr):
        hin_max, aicen0, vicen0, vsnon, trcrn = make_state(rng, cfg, tr)
        # thermo growth: each category thickens by ~5 cm (more for thin)
        growth = jnp.asarray([0.08, 0.06, 0.05, 0.04, 0.03])[:, None]
        vicen = vicen0 + aicen0 * growth
        t0 = totals(tr, cfg, aicen0, vicen, vsnon, trcrn)
        a2, v2, s2, t2 = itd.linear_itd(
            tr, hin_max, cfg.nslyr, aicen_init=aicen0, vicen_init=vicen0,
            aicen=aicen0, vicen=vicen, vsnon=vsnon, trcrn=trcrn)
        t1 = totals(tr, cfg, a2, v2, s2, t2)
        np.testing.assert_allclose(t1["v"], t0["v"], rtol=1e-10)
        np.testing.assert_allclose(t1["s"], t0["s"], rtol=1e-10)
        np.testing.assert_allclose(t1["e"], t0["e"], rtol=1e-9)
        np.testing.assert_allclose(t1["salt"], t0["salt"], rtol=1e-9)
        # growth should move some ice upward in category space
        assert np.any(np.asarray(a2) != np.asarray(aicen0))

    def test_melt_shrinks_cat1_area(self, rng, cfg, tr):
        hin_max, aicen0, vicen0, vsnon, trcrn = make_state(rng, cfg, tr)
        melt = jnp.asarray([0.04, 0.03, 0.02, 0.02, 0.01])[:, None]
        vicen = jnp.maximum(vicen0 - aicen0 * melt, 0.3 * vicen0)
        a2, v2, s2, t2 = itd.linear_itd(
            tr, hin_max, cfg.nslyr, aicen_init=aicen0, vicen_init=vicen0,
            aicen=aicen0, vicen=vicen, vsnon=vsnon, trcrn=trcrn)
        t0 = totals(tr, cfg, aicen0, vicen, vsnon, trcrn)
        t1 = totals(tr, cfg, a2, v2, s2, t2)
        np.testing.assert_allclose(t1["v"], t0["v"], rtol=1e-10)
        # thin-ice melt removes area
        assert np.all(np.asarray(jnp.sum(a2, 0))
                      <= np.asarray(jnp.sum(aicen0, 0)) + 1e-12)


class TestNewIceLateralMelt:
    def test_add_new_ice_conserves_energy_volume(self, rng, cfg, tr):
        hin_max, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        B = aicen.shape[1:]
        agg = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
        frzmlt = jnp.full(B, 150.0)      # strong freezing potential
        sal = shared.salinity_profile(cfg.nilyr, 3.2)
        r = itd.add_new_ice(3600.0, tr, hin_max, cfg.nilyr,
                            aicen=aicen, vicen=vicen, trcrn=trcrn,
                            aice=agg.aice, aice0=agg.aice0, frzmlt=frzmlt,
                            Tf=jnp.full(B, -1.8), salinz=sal)
        dv = np.asarray(jnp.sum(r.vicen, 0) - jnp.sum(vicen, 0))
        expected = 150.0 * 3600.0 / (ct.rhoi * ct.Lfresh)
        np.testing.assert_allclose(dv, expected, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(r.frazil), expected, rtol=1e-12)
        # area grows only in category 1
        np.testing.assert_allclose(np.asarray(r.aicen[1:]),
                                   np.asarray(aicen[1:]))

    def test_add_new_ice_no_open_water(self, rng, cfg, tr):
        """aice ~ 1: new ice thickens existing categories."""
        hin_max, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        aicen = aicen / jnp.sum(aicen, 0, keepdims=True)   # aice = 1
        agg = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
        B = aicen.shape[1:]
        r = itd.add_new_ice(3600.0, tr, hin_max, cfg.nilyr,
                            aicen=aicen, vicen=vicen, trcrn=trcrn,
                            aice=agg.aice, aice0=agg.aice0,
                            frzmlt=jnp.full(B, 100.0),
                            Tf=jnp.full(B, -1.8),
                            salinz=shared.salinity_profile(cfg.nilyr, 3.2))
        np.testing.assert_allclose(np.asarray(r.aicen), np.asarray(aicen))
        assert np.all(np.asarray(r.vicen) > np.asarray(vicen))

    def test_lateral_melt_budget(self, rng, cfg, tr):
        hin_max, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        B = aicen.shape[1:]
        rside = jnp.full(B, 0.25)
        dt = 3600.0
        r = itd.lateral_melt(dt, tr, cfg.nilyr, cfg.nslyr, aicen=aicen,
                             vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                             rside=rside)
        np.testing.assert_allclose(np.asarray(r.aicen),
                                   np.asarray(aicen) * 0.75)
        exp_fresh = np.asarray(jnp.sum(ct.rhos * vsnon + ct.rhoi * vicen, 0)
                               ) * 0.25 / dt
        np.testing.assert_allclose(np.asarray(r.fresh), exp_fresh, rtol=1e-12)
        assert np.all(np.asarray(r.fhocn) < 0.0)   # melting needs heat


class TestZap:
    def test_zap_small_and_conserve_to_ocean(self, rng, cfg, tr):
        hin_max, aicen, vicen, vsnon, trcrn = make_state(rng, cfg, tr)
        aicen = aicen.at[1].set(ct.puny * 0.5)     # tiny category
        vicen = vicen.at[1].set(ct.puny * 0.5 * 1.0)
        dt = 3600.0
        r = itd.zap_small_areas(dt, tr, cfg.nilyr, cfg.nslyr, aicen=aicen,
                                vicen=vicen, vsnon=vsnon, trcrn=trcrn)
        assert np.all(np.asarray(r.aicen[1]) == 0.0)
        assert np.all(np.asarray(r.vicen[1]) == 0.0)
        np.testing.assert_allclose(np.asarray(r.trcrn[1, tr.nt_Tsfc]),
                                   ct.Tocnfrz)
        assert np.all(np.asarray(r.dfresh) > 0.0)


class TestZapSnowTemperature:
    def test_bad_snow_zapped_to_ocean(self, cfg, tr):
        from cice5_tpu import constants as ct
        B = (4,)
        ncat = cfg.ncat
        aicen = jnp.full((ncat,) + B, 0.15)
        vsnon = jnp.full((ncat,) + B, 0.02)
        trcrn = jnp.zeros((ncat, tr.ntrcr) + B)
        # healthy snow enthalpy everywhere...
        qs_ok = -ct.rhos * (ct.Lfresh + ct.cp_ice * 10.0)   # T = -10 C
        trcrn = trcrn.at[:, tr.nt_qsno].set(qs_ok)
        # ...except one insane category/cell (T << -100 C)
        qs_bad = -ct.rhos * (ct.Lfresh + ct.cp_ice * 500.0)
        trcrn = trcrn.at[1, tr.nt_qsno, 2].set(qs_bad)
        vs, t2, dfresh, dfhocn, _dfaero = itd.zap_snow_temperature(
            3600.0, tr, cfg.nslyr, aicen=aicen, vsnon=vsnon, trcrn=trcrn)
        # the bad cell's snow is gone, others untouched
        assert float(vs[1, 2]) == 0.0
        assert float(vs[0, 2]) == 0.02
        assert float(vs[1, 1]) == 0.02
        # mass + energy fluxes to the ocean from the zapped snow only
        np.testing.assert_allclose(float(dfresh[2]),
                                   ct.rhos * 0.02 / 3600.0, rtol=1e-6)
        assert float(dfhocn[2]) < 0.0
        assert float(dfresh[0]) == 0.0
        # snow enthalpy reset to latent-only
        np.testing.assert_allclose(float(t2[1, tr.nt_qsno, 2]),
                                   -ct.rhos * ct.Lfresh, rtol=1e-6)


class TestMushyFrazil:
    def test_mushy_frazil_salinity_and_enthalpy(self):
        """ktherm=2 frazil forms as mush: Si0 = sss - dSin0_frazil,
        enthalpy from the liquidus at phi_init (ice_therm_itd.F90:
        1460-1492) — saltier, less negative enthalpy than fresh latent
        ice, so MORE volume per joule extracted."""
        import jax.numpy as jnp
        from cice5_tpu import constants as ct
        from cice5_tpu.models.thermo import itd
        from cice5_tpu.state import build_tracer_registry
        from cice5_tpu.config import rect_config
        cfg = rect_config()
        tr = build_tracer_registry(cfg)
        B = (4, 6)
        ncat, nilyr = cfg.ncat, cfg.nilyr
        aicen = jnp.zeros((ncat,) + B)          # all open water
        vicen = aicen * 0.5
        trcrn = jnp.zeros((ncat, tr.ntrcr) + B)
        hin_max = itd.category_bounds(ncat, 1, 1)
        from cice5_tpu.models.thermo.shared import salinity_profile
        salinz = salinity_profile(nilyr, 3.2)
        kw = dict(aicen=aicen, vicen=vicen, trcrn=trcrn,
                  aice=jnp.sum(aicen, 0),
                  aice0=1.0 - jnp.sum(aicen, 0),
                  frzmlt=jnp.full(B, 150.0), Tf=jnp.full(B, -1.8),
                  salinz=salinz)
        r1 = itd.add_new_ice(3600.0, tr, hin_max, nilyr, ktherm=1, **kw)
        r2 = itd.add_new_ice(3600.0, tr, hin_max, nilyr, ktherm=2,
                             sss=jnp.full(B, 34.0), **kw)
        # mushy frazil enthalpy is less negative -> more frazil volume
        assert float(jnp.max(r2.frazil)) > float(jnp.max(r1.frazil)) * 1.05
        # new ice carries Si0 = sss - 3 in the salinity tracers
        s0 = tr.nt_sice
        sal_new = np.asarray(r2.trcrn[0, s0:s0 + nilyr])
        grow = np.asarray(r2.frazil) > 1e-8
        np.testing.assert_allclose(
            sal_new[:, grow].max(), 31.0, atol=2.0)
        # mushy path returns the POP frazil-difference freshwater flux
        assert float(jnp.max(jnp.abs(r2.dfresh))) > 0.0
        assert float(jnp.max(jnp.abs(r1.dfresh))) == 0.0


class TestConservationUtilities:
    """aggregate_area / column_sum / column_conservation_check /
    itd_conservation_* / zerolayer_check (ice_itd.F90:468,1251,1299,2428;
    ice_therm_itd.F90:783-860)."""

    def _state(self, ktherm=1):
        from cice5_tpu.config import rect_config
        from cice5_tpu.state import build_tracer_registry
        cfg = rect_config()
        tr = build_tracer_registry(cfg)
        B = (4, 6)
        ncat, nilyr, nslyr = cfg.ncat, cfg.nilyr, cfg.nslyr
        rng = np.random.RandomState(3)
        aicen = jnp.asarray(rng.uniform(0.0, 0.19, (ncat,) + B))
        vicen = aicen * jnp.asarray(rng.uniform(0.5, 3.0, (ncat,) + B))
        vsnon = aicen * 0.1
        trcrn = jnp.zeros((ncat, tr.ntrcr) + B)
        qi = -2.5e8 if ktherm else -ct.rhoi * ct.Lfresh
        trcrn = trcrn.at[:, tr.nt_qice:tr.nt_qice + nilyr].set(qi)
        trcrn = trcrn.at[:, tr.nt_qsno:tr.nt_qsno + nslyr].set(
            -1.0e8 if ktherm else -ct.rhos * ct.Lfresh)
        trcrn = trcrn.at[:, tr.nt_sice:tr.nt_sice + nilyr].set(5.0)
        return tr, cfg, aicen, vicen, vsnon, trcrn

    def test_aggregate_area(self):
        tr, cfg, aicen, *_ = self._state()
        aice, aice0 = itd.aggregate_area(aicen)
        np.testing.assert_allclose(np.asarray(aice),
                                   np.asarray(jnp.sum(aicen, 0)))
        np.testing.assert_allclose(np.asarray(aice + aice0),
                                   np.maximum(np.asarray(aice), 1.0))

    def test_column_conservation_check(self):
        x1 = jnp.ones((4, 6))
        nbad, maxerr = itd.column_conservation_check(x1, x1 + 1e-13, 1e-11)
        assert int(nbad) == 0
        x2 = x1.at[2, 3].add(1e-6)
        nbad, maxerr = itd.column_conservation_check(x1, x2, 1e-11)
        assert int(nbad) == 1 and float(maxerr) > 9e-7

    def test_itd_sums_conserved_under_shift(self):
        tr, cfg, aicen, vicen, vsnon, trcrn = self._state()
        pre = itd.itd_conservation_sums(tr, cfg.nilyr, cfg.nslyr,
                                        aicen, vicen, vsnon, trcrn)
        hin_max = itd.category_bounds(cfg.ncat, 1, 1)
        out = itd.rebin(tr, hin_max, aicen, vicen, vsnon, trcrn)
        post = itd.itd_conservation_sums(tr, cfg.nilyr, cfg.nslyr, *out)
        assert int(itd.itd_conservation_check(pre, post)) == 0

    def test_zerolayer_check(self):
        tr, cfg, aicen, vicen, vsnon, trcrn = self._state(ktherm=0)
        assert int(itd.zerolayer_check(tr, cfg.nilyr, cfg.nslyr, aicen,
                                       vicen, vsnon, trcrn)) == 0
        # corrupt one cell's ice enthalpy -> flagged
        bad = trcrn.at[1, tr.nt_qice, 1, 1].add(1e7)
        assert int(itd.zerolayer_check(tr, cfg.nilyr, cfg.nslyr, aicen,
                                       vicen, vsnon, bad)) >= 1
