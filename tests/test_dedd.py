"""Delta-Eddington radiation tests: energy closure (absorbed + reflected =
incident), physically-ordered albedos (cold snow > bare ice > pond > ocean),
tuning-knob response, zenith-angle behavior."""
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import constants as ct
from cice5_tpu.models.radiation.dedd import (compute_coszen, compute_dEdd,
                                             shortwave_dEdd)


def _inputs(B=(8,), hi=1.5, hs=0.2, apnd=0.0, hpnd=0.0, Tsf=-10.0,
            coszen=0.5):
    f = lambda v: jnp.full(B, float(v), jnp.float64)
    return dict(
        nilyr=7, nslyr=1,
        aicen=f(0.9), vicen=f(0.9 * hi), vsnon=f(0.9 * hs),
        Tsfcn=f(Tsf), apnd=f(apnd), hpnd=f(hpnd),
        coszen=f(coszen), fnidr=f(0.7),
        swvdr=f(100.0), swvdf=f(80.0), swidr=f(110.0), swidf=f(60.0))


class TestDEdd:
    def test_energy_closure(self):
        inp = _inputs()
        r = shortwave_dEdd(**inp)
        inc = 100.0 + 80.0 + 110.0 + 60.0
        refl = (np.asarray(r.alvdrn) * 100.0 + np.asarray(r.alvdfn) * 80.0
                + np.asarray(r.alidrn) * 110.0 + np.asarray(r.alidfn) * 60.0)
        absorbed = (np.asarray(r.fswsfcn) + np.asarray(r.fswintn)
                    + np.asarray(r.fswthrun))
        # absorbed + reflected ~ incident (ocean absorbs fthru; small
        # residual from the ocean albedo under the ice)
        np.testing.assert_allclose(absorbed + refl, inc, rtol=2e-2)
        # interior absorption sum matches layer absorption
        np.testing.assert_allclose(
            np.asarray(jnp.sum(r.Iswabsn, 0) + jnp.sum(r.Sswabsn, 0)),
            np.asarray(r.fswintn), rtol=1e-6, atol=1e-6)

    def test_albedo_ordering(self):
        snow = shortwave_dEdd(**_inputs(hs=0.3, Tsf=-20.0))
        bare = shortwave_dEdd(**_inputs(hs=0.0))
        pond = shortwave_dEdd(**_inputs(hs=0.0, apnd=0.6, hpnd=0.25))
        bb = lambda r: float(jnp.mean(
            ct.awtvdr * r.alvdrn + ct.awtidr * r.alidrn
            + ct.awtvdf * r.alvdfn + ct.awtidf * r.alidfn))
        a_snow, a_bare, a_pond = bb(snow), bb(bare), bb(pond)
        assert a_snow > 0.75          # cold dry snow is bright
        assert 0.4 < a_bare < 0.8     # bare ice intermediate
        assert a_pond < a_bare        # ponds darken the surface
        assert a_pond > 0.1

    def test_thin_ice_darker(self):
        thick = shortwave_dEdd(**_inputs(hs=0.0, hi=2.0))
        thin = shortwave_dEdd(**_inputs(hs=0.0, hi=0.3))
        assert float(jnp.mean(thin.alvdfn)) < float(jnp.mean(thick.alvdfn))
        # more light through thin ice
        assert float(jnp.mean(thin.fswthrun)) > \
            float(jnp.mean(thick.fswthrun))

    def test_R_snw_tuning_brightens(self):
        lo = shortwave_dEdd(**_inputs(Tsf=-1.0), R_snw=-1.0)
        hi = shortwave_dEdd(**_inputs(Tsf=-1.0), R_snw=1.5)
        assert float(jnp.mean(hi.alvdfn)) > float(jnp.mean(lo.alvdfn))

    def test_dark_when_sun_below_horizon(self):
        r = shortwave_dEdd(**_inputs(coszen=-0.2))
        assert float(jnp.max(jnp.abs(r.fswsfcn))) == 0.0
        assert float(jnp.max(jnp.abs(r.fswthrun))) == 0.0

    def test_coszen(self):
        # midday at the pole in summer: positive; midnight winter: negative
        cz_summer = compute_coszen(jnp.asarray(np.deg2rad(80.0)),
                                   jnp.asarray(0.0), 172.0, 43200.0)
        cz_winter = compute_coszen(jnp.asarray(np.deg2rad(80.0)),
                                   jnp.asarray(0.0), 355.0, 43200.0)
        assert float(cz_summer) > 0.2
        assert float(cz_winter) < 0.0


class TestDedupFastPathEquivalence:
    """shortwave_dEdd's deduplicated-layer solver must match the generic
    per-case compute_dEdd pipeline exactly (same math, shared layers
    computed once)."""

    def _compute_ref(self, srftyp, inp, hs_eff, rsnw, hp):
        swid = inp["swidr"] + inp["swidf"]
        return compute_dEdd(
            nilyr=7, nslyr=1, srftyp=srftyp, coszen=inp["coszen"],
            fnidr=inp["fnidr"], swvdr=inp["swvdr"], swvdf=inp["swvdf"],
            swidr=inp["swidr"], swidf=inp["swidf"], hs=hs_eff, rsnw=rsnw,
            hi=jnp.maximum(inp["vicen"] / inp["aicen"], ct.puny), hp=hp)

    @pytest.mark.parametrize("case", ["snow", "bare", "pond"])
    def test_pure_surface_matches_generic(self, case):
        from cice5_tpu.models.radiation.dedd import set_snow
        if case == "snow":
            inp = _inputs(hs=0.3, Tsf=-15.0)     # fs = 1
            srf = 1
        elif case == "bare":
            inp = _inputs(hs=0.0)                 # fi = 1
            srf = 0
        else:
            inp = _inputs(hs=0.0, apnd=1.0, hpnd=0.3)   # fp = 1
            srf = 2
        r = shortwave_dEdd(**inp)
        fs, hs, rsnw = set_snow(inp["aicen"], inp["vsnon"], inp["Tsfcn"],
                                R_snw=1.5, rsnw_mlt=1500.0, dT_mlt=1.5,
                                hs0=0.03)
        hs_eff = (jnp.zeros_like(hs) if srf != 1
                  else jnp.maximum(hs, ct.hs_min))
        hp = inp["hpnd"] if srf == 2 else jnp.zeros_like(hs)
        ref = self._compute_ref(srf, inp, hs_eff, rsnw, hp)
        np.testing.assert_allclose(np.asarray(r.alvdrn),
                                   np.asarray(ref.avdr), atol=1e-10)
        np.testing.assert_allclose(np.asarray(r.alidfn),
                                   np.asarray(ref.aidf), atol=1e-10)
        np.testing.assert_allclose(np.asarray(r.fswsfcn),
                                   np.asarray(ref.fsfc), atol=1e-8)
        np.testing.assert_allclose(np.asarray(r.fswthrun),
                                   np.asarray(ref.fthru), atol=1e-8)
        np.testing.assert_allclose(np.asarray(r.Iswabsn),
                                   np.asarray(ref.Iabs), atol=1e-8)
