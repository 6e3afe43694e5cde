"""Brine-height and skeletal BGC tests: bio-grid remap correctness against
linear profiles, brine relaxation toward sea level, permeability gating,
algal growth/nutrient budgets, ocean-flux conservation, full-step smoke."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import constants as ct
from cice5_tpu.models.tracers import algae, brine


class TestBioGridRemap:
    def test_linear_profile_preserved(self):
        """Sampling a linear-in-depth profile returns the linear values at
        bio-grid positions (hbr == hin)."""
        nilyr, nblyr = 7, 7
        bgrid, igrid, cgrid = brine.bio_grids(nilyr, nblyr)
        hice = jnp.full((4,), 2.0)
        hbr = jnp.full((4,), 2.0)
        prof = jnp.asarray(5.0 + 10.0 * cgrid)[None, :] * jnp.ones((4, 1))
        out = brine.remap_to_bio_grid(prof, hice, hbr, cgrid,
                                      bgrid[:nblyr + 1])
        # interior bio points fall inside the donor profile: linear exact
        expect = 5.0 + 10.0 * bgrid[1:nblyr + 1]
        np.testing.assert_allclose(np.asarray(out)[:, 1:],
                                   np.tile(expect, (4, 1)), rtol=1e-6)

    def test_constant_profile_any_offset(self):
        nilyr, nblyr = 7, 7
        bgrid, igrid, cgrid = brine.bio_grids(nilyr, nblyr)
        prof = jnp.full((3, nilyr), 4.2)
        for hbr_val in (1.5, 2.0, 2.4):   # hbr <, ==, > hice
            out = brine.remap_to_bio_grid(prof, jnp.full((3,), 2.0),
                                          jnp.full((3,), hbr_val), cgrid,
                                          bgrid[:nblyr + 1])
            np.testing.assert_allclose(np.asarray(out), 4.2, rtol=1e-6)


class TestHbrine:
    def _micro(self, B=(4,), S=5.0, T=-5.0):
        nilyr = 7
        zS = jnp.full(B + (nilyr,), S)
        from cice5_tpu.models.thermo import mushy
        zq = jnp.full(B + (nilyr,),
                      float(mushy.enthalpy_mush(jnp.asarray(T),
                                                jnp.asarray(S))))
        return zS, zq

    def test_micro_structure_physical(self):
        zS, zq = self._micro()
        ms = brine.compute_microS_mushy(zS, zq, jnp.full((4,), 1.5),
                                        jnp.full((4,), 1.5),
                                        jnp.full((4,), 34.0),
                                        jnp.full((4,), -1.8), nblyr=7)
        assert float(jnp.min(ms.bphin)) > 0.0
        assert float(jnp.max(ms.bphin)) <= 1.0
        assert float(jnp.min(ms.kperm)) >= 0.0
        # ocean boundary point is fully liquid
        np.testing.assert_allclose(np.asarray(ms.bphin[..., -1]), 1.0)
        # cold ice: porosity well below 1 inside
        assert float(jnp.max(ms.bphin[..., 1:-1])) < 0.9

    def test_brine_relaxes_toward_sea_level(self):
        """With positive permeability, hbr decays toward h_ocn."""
        B = (4,)
        f = lambda v: jnp.full(B, float(v))
        hin = f(1.5)
        hsn = f(0.0)
        h_ocn = brine.RHOSI / ct.rhow * 1.5
        r = brine.update_hbrine(
            3600.0, meltb=f(0.0), meltt=f(0.0), melts=f(0.0),
            hin=hin, hsn=hsn, hin_old=hin,
            hbr_old=f(1.5),                 # brine above sea level
            dhS_top=f(0.0), dhS_bottom=f(0.0),
            kperm=f(1.0e-11), zphi_min=f(0.2))
        hbr = float(r.hbr[0])
        assert h_ocn <= hbr < 1.5           # moved toward sea level
        assert float(r.darcy_V[0]) < 0.0    # downward flushing

    def test_impermeable_ice_holds_brine(self):
        B = (2,)
        f = lambda v: jnp.full(B, float(v))
        r = brine.update_hbrine(
            3600.0, meltb=f(0.0), meltt=f(0.0), melts=f(0.0),
            hin=f(1.5), hsn=f(0.0), hin_old=f(1.5), hbr_old=f(1.5),
            dhS_top=f(0.0), dhS_bottom=f(0.0),
            kperm=f(0.0), zphi_min=f(0.2))
        np.testing.assert_allclose(np.asarray(r.hbr), 1.5, rtol=1e-12)

    def test_congelation_raises_brine(self):
        B = (2,)
        f = lambda v: jnp.full(B, float(v))
        pf = brine.preflushing_changes(
            aicen=f(0.9), vicen=f(0.9 * 1.55), vsnon=f(0.0),
            meltb=f(0.0), meltt=f(0.0), congel=f(0.05), snoice=f(0.0),
            hice_old=f(1.5), fbri=f(1.0), first_ice=f(0.0))
        np.testing.assert_allclose(np.asarray(pf.dhbr_bot), 0.05,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(pf.hbr_old), 1.5, atol=1e-9)


def _registry(**kw):
    from cice5_tpu.config import rect_config
    from cice5_tpu.state import build_tracer_registry
    cfg = rect_config()
    cfg = cfg.replace(tracers=dataclasses.replace(
        cfg.tracers, skl_bgc=True, tr_brine=True, **kw))
    return cfg, build_tracer_registry(cfg)


class TestSklBgc:
    def test_registry_layout(self):
        cfg, tr = _registry()
        assert tr.nbtrcr == 9
        assert tr.bgc_names[0] == "N"
        assert tr.nt_fbri >= 0
        assert all(nt >= 0 for nt in tr.nt_bgc)

    def test_seeding_from_ocean(self):
        cfg, tr = _registry()
        B = (4,)
        nb = tr.nbtrcr
        ob = algae.default_ocean_bio(tr, B, jnp.float64)
        r = algae.skl_biogeochemistry(
            3600.0, tr, conc=jnp.zeros((nb,) + B), ocean_bio=ob,
            aicen=jnp.full(B, 0.9), meltb=jnp.zeros(B),
            congel=jnp.zeros(B), fswthru=jnp.zeros(B),
            first_ice=jnp.ones(B))
        iN = list(tr.bgc_names).index("N")
        expect = algae.OCEAN_BIO_DEFAULT["N"] * algae.SK_L / algae.PHI_SK
        np.testing.assert_allclose(np.asarray(r.conc[iN]), expect,
                                   rtol=1e-2)

    def test_growth_consumes_nutrients(self):
        """Light + nutrients + warm bottom: algae grow, nitrate falls,
        the N increase is balanced by nutrient drawdown."""
        cfg, tr = _registry()
        B = (4,)
        nb = tr.nbtrcr
        ob = algae.default_ocean_bio(tr, B, jnp.float64)
        conc0 = ob * algae.SK_L / algae.PHI_SK
        dt = 86400.0   # one day for measurable growth
        r = algae.skl_biogeochemistry(
            dt, tr, conc=conc0, ocean_bio=ob, aicen=jnp.full(B, 0.9),
            meltb=jnp.zeros(B), congel=jnp.zeros(B),
            fswthru=jnp.full(B, 50.0), first_ice=jnp.zeros(B))
        names = list(tr.bgc_names)
        iN, iNO = names.index("N"), names.index("NO")
        assert float(jnp.min(r.conc[iN] - conc0[iN])) > 0.0   # algae grew
        assert float(jnp.max(r.conc[iNO] - conc0[iNO])) < 0.0  # NO3 used
        assert float(jnp.min(r.grow_N)) > 0.0

    def test_dark_no_growth(self):
        cfg, tr = _registry()
        B = (2,)
        ob = algae.default_ocean_bio(tr, B, jnp.float64)
        conc0 = ob * algae.SK_L / algae.PHI_SK
        r = algae.skl_biogeochemistry(
            3600.0, tr, conc=conc0, ocean_bio=ob, aicen=jnp.full(B, 0.9),
            meltb=jnp.zeros(B), congel=jnp.zeros(B),
            fswthru=jnp.zeros(B), first_ice=jnp.zeros(B))
        iN = list(tr.bgc_names).index("N")
        # no light: mortality/respiration only, algal N cannot increase
        assert float(jnp.max(r.conc[iN] - conc0[iN])) <= 0.0

    def test_melt_fluxes_to_ocean(self):
        cfg, tr = _registry()
        B = (2,)
        ob = algae.default_ocean_bio(tr, B, jnp.float64)
        conc0 = 2.0 * ob * algae.SK_L / algae.PHI_SK   # enriched ice
        r = algae.skl_biogeochemistry(
            3600.0, tr, conc=conc0, ocean_bio=ob, aicen=jnp.full(B, 0.9),
            meltb=jnp.full(B, 0.02), congel=jnp.zeros(B),
            fswthru=jnp.zeros(B), first_ice=jnp.zeros(B))
        iN = list(tr.bgc_names).index("N")
        assert float(jnp.min(r.flux_bio[iN])) > 0.0   # algae flushed out

    def test_conservation_closed_no_exchange(self):
        """With no melt/growth/light, d(conc) = -flux*dt/phi_sk for each
        dissolved tracer (chemistry only moves mass between tracers)."""
        cfg, tr = _registry()
        B = (3,)
        ob = algae.default_ocean_bio(tr, B, jnp.float64)
        conc0 = ob * algae.SK_L / algae.PHI_SK
        dt = 3600.0
        r = algae.skl_biogeochemistry(
            dt, tr, conc=conc0, ocean_bio=ob, aicen=jnp.full(B, 0.9),
            meltb=jnp.zeros(B), congel=jnp.zeros(B),
            fswthru=jnp.zeros(B), first_ice=jnp.zeros(B))
        assert np.isfinite(np.asarray(r.conc)).all()
        assert float(jnp.min(r.conc)) >= 0.0


class TestBgcStep:
    def test_full_step_smoke(self):
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=24, nx=32),
            thermo=dataclasses.replace(cfg.thermo, ktherm=2),
            tracers=dataclasses.replace(cfg.tracers, skl_bgc=True,
                                        tr_brine=True),
            dyn=dataclasses.replace(cfg.dyn, ndte=20))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st, diag = m.step(st, m.forcing_at(0))
        fbri = np.asarray(st.trcrn[:, m.tr.nt_fbri])
        assert np.isfinite(fbri).all()
        b0, nb = m.tr.nt_bgc[0], m.tr.nbtrcr
        bgc = np.asarray(st.trcrn[:, b0:b0 + nb])
        assert np.isfinite(bgc).all()
        # seeded cells carry algae
        assert bgc.max() > 0.0
        # fbri stays within physical range where there is ice
        ai = np.asarray(st.aicen)
        assert fbri[ai > 0.2].min() > 0.0
        assert fbri[ai > 0.2].max() < 2.0
        assert diag.flux_bio.shape[0] == nb
        # second step: first_ice cleared, PP defined
        st, diag = m.step(st, m.forcing_at(1))
        assert np.isfinite(np.asarray(diag.PP_net)).all()
