"""Mushy-layer thermodynamics tests: constitutive consistency, Picard
convergence + energy conservation, drainage desalination, snow-ice
flooding (the ktherm=2 physics of ice_therm_mushy.F90)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import ModelConfig, constants as ct
from cice5_tpu.models.thermo import mushy, shared, vertical
from cice5_tpu.models.atmo import atmo_boundary_layer


class TestConstitutive:
    def test_temperature_enthalpy_roundtrip(self, rng):
        T = jnp.asarray(rng.uniform(-25.0, -0.5, 200))
        S = jnp.asarray(rng.uniform(0.5, 15.0, 200))
        q = mushy.enthalpy_mush(T, S)
        T2 = mushy.temperature_mush(q, S)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-6)

    def test_liquidus_inverse(self, rng):
        T = jnp.asarray(rng.uniform(-20.0, -0.5, 100))
        Sbr = mushy.liquidus_brine_salinity(T)
        T2 = mushy.liquidus_temperature(Sbr)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-9)

    def test_liquid_fraction_bounds(self, rng):
        T = jnp.asarray(rng.uniform(-25.0, -0.1, 100))
        S = jnp.asarray(rng.uniform(0.5, 12.0, 100))
        phi = mushy.liquid_fraction(T, S)
        assert float(jnp.min(phi)) > 0.0
        assert float(jnp.max(phi)) <= 1.0 + 1e-12
        # colder -> less liquid
        phi_cold = mushy.liquid_fraction(T - 10.0, S)
        assert np.all(np.asarray(phi_cold) <= np.asarray(phi) + 1e-12)

    def test_conductivity_between_brine_and_ice(self, rng):
        T = jnp.asarray(rng.uniform(-25.0, -0.5, 50))
        S = jnp.asarray(rng.uniform(0.5, 10.0, 50))
        km = mushy.conductivity_mush(T, S)
        assert float(jnp.min(km)) >= mushy.KB - 1e-12
        assert float(jnp.max(km)) <= mushy.KI + 1e-12


def _col(B=(4,), Tair=-20.0, sw=0.0, Tsf=-15.0, hi=1.5, hs=0.2):
    nilyr, nslyr = 7, 1
    f = lambda v: jnp.full(B, float(v), jnp.float64)
    zSin = jnp.broadcast_to(
        jnp.asarray([6.0, 5.0, 4.5, 4.0, 3.8, 3.6, 3.5])[:, None],
        (nilyr,) + B)
    fr = (jnp.arange(nilyr) + 0.5) / nilyr
    zTin = jnp.broadcast_to((Tsf * 0.9 + fr * (-1.8 - Tsf * 0.9))[:, None],
                            (nilyr,) + B)
    zqin = mushy.enthalpy_mush(zTin, zSin)
    zqsn = mushy.enthalpy_snow(jnp.full((nslyr,) + B, min(Tsf, -1.0)))
    abl = atmo_boundary_layer(sfctype="ice", Tsf=f(Tsf),
                              potT=f(Tair + ct.Tffresh), uatm=f(5.0),
                              vatm=f(0.0), wind=f(5.0), zlvl=f(10.0),
                              Qa=f(0.0003), rhoa=f(1.3))
    return dict(
        nilyr=nilyr, nslyr=nslyr, mask=jnp.ones(B, bool),
        rhoa=f(1.3), flw=f(180.0), potT=f(Tair + ct.Tffresh), Qa=f(0.0003),
        shcoef=abl.shcoef, lhcoef=abl.lhcoef,
        fswsfc=f(sw * 0.6), fswint=f(sw * 0.3),
        Sswabs=jnp.zeros((nslyr,) + B),
        Iswabs=jnp.broadcast_to(f(sw * 0.3 / nilyr), (nilyr,) + B),
        hilyr=f(hi / nilyr), hslyr=f(hs / nslyr),
        zqin=zqin, zSin=zSin, zqsn=zqsn,
        hpond=f(0.0), apond=f(0.0), Tsf=f(Tsf), Tbot=f(-1.8), sss=f(34.0))


class TestMushySolver:
    def test_cold_column_converges_conserves(self):
        inp = _col()
        r = mushy.temperature_changes_salinity(3600.0, **inp)
        assert bool(jnp.all(r.converged))
        assert bool(jnp.all(r.Tsf <= 1e-3))
        assert bool(jnp.all(r.zTin < 0.0))
        # energy-flux conservation over the solve
        einit = (jnp.sum(inp["hslyr"] * inp["zqsn"], 0)
                 + jnp.sum(inp["hilyr"] * inp["zqin"], 0))
        efinal = (jnp.sum(r.hslyr * r.zqsn, 0)
                  + jnp.sum(r.hilyr * r.zqin, 0))
        lhs = (efinal - einit) / 3600.0
        rhs = (r.fcondtopn - r.fcondbot + inp["fswint"] - r.fadvocn)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=5e-3)

    def test_melting_surface(self):
        inp = _col(Tair=3.0, sw=500.0, Tsf=-0.2)
        r = mushy.temperature_changes_salinity(3600.0, **inp)
        assert bool(jnp.all(r.converged))
        assert bool(jnp.all(r.Tsf <= ct.puny))
        # melting: surface flux exceeds conduction
        melt = np.asarray(r.Tsf) >= -1e-6
        fs = np.asarray(r.fsurfn)
        fc = np.asarray(r.fcondtopn)
        assert np.all(fs[melt] >= fc[melt] - 2e-3)

    def test_desalination_over_time(self):
        """Gravity drainage reduces bulk salinity of warm permeable ice."""
        inp = _col(Tair=-3.0, Tsf=-3.0)
        # warm the column so it is permeable
        nilyr = inp["nilyr"]
        zTin = jnp.full((nilyr,) + (4,), -2.2)
        inp["zSin"] = jnp.full((nilyr,) + (4,), 10.0)
        inp["zqin"] = mushy.enthalpy_mush(zTin, inp["zSin"])
        S0 = float(jnp.mean(inp["zSin"]))
        r = mushy.temperature_changes_salinity(3600.0, **inp)
        S1 = float(jnp.mean(r.zSin))
        assert S1 < S0   # drained salt

    def test_snow_ice_flooding(self):
        """Heavy snow load floods the interface and makes snow ice."""
        inp = _col(hi=0.5, hs=0.5)   # 0.5 m snow on 0.5 m ice: negative fb
        r = mushy.temperature_changes_salinity(3600.0, **inp)
        assert bool(jnp.all(r.snoice > 0.0))
        assert bool(jnp.all(r.hilyr > inp["hilyr"]))
        assert bool(jnp.all(r.hslyr < inp["hslyr"]))


class TestMushyVertical:
    def test_thermo_vertical_ktherm2(self):
        cfg = ModelConfig(dtype="float64", accum_dtype="float64")
        cfg = cfg.replace(thermo=cfg.thermo.__class__(ktherm=2))
        B = (4,)
        f = lambda v: jnp.full(B, float(v), jnp.float64)
        nilyr, nslyr = cfg.nilyr, cfg.nslyr
        zSin = jnp.broadcast_to(
            jnp.asarray([6.0, 5.0, 4.5, 4.0, 3.8, 3.6, 3.5])[:, None],
            (nilyr,) + B)
        fr = (jnp.arange(nilyr) + 0.5) / nilyr
        zTin = jnp.broadcast_to((-12.0 + fr * 10.2)[:, None], (nilyr,) + B)
        zqin = mushy.enthalpy_mush(zTin, zSin)
        zqsn = mushy.enthalpy_snow(f(-14.0)[None])
        abl = atmo_boundary_layer(
            sfctype="ice", Tsf=f(-14.0), potT=f(-25.0 + ct.Tffresh),
            uatm=f(5.0), vatm=f(0.0), wind=f(5.0), zlvl=f(10.0),
            Qa=f(0.0003), rhoa=f(1.3))
        res = vertical.thermo_vertical(
            3600.0, cfg, aicen=f(0.9), vicen=f(0.9 * 1.5),
            vsnon=f(0.9 * 0.2), Tsfcn=f(-14.0), zqin=zqin, zqsn=zqsn,
            zSin=zSin, flw=f(170.0), potT=f(-25.0 + ct.Tffresh),
            Qa=f(0.0003), rhoa=f(1.3), fsnow=f(1e-6),
            shcoef=abl.shcoef, lhcoef=abl.lhcoef, fswsfc=f(0.0),
            fswint=f(0.0), Sswabs=jnp.zeros((nslyr,) + B),
            Iswabs=jnp.zeros((nilyr,) + B), fbot=f(-0.5), Tbot=f(-1.8),
            sss=f(34.0))
        assert bool(jnp.all(res.converged))
        assert np.isfinite(np.asarray(res.vicen)).all()
        assert bool(jnp.all(res.congel > 0.0))     # cold: bottom growth
        assert bool(jnp.all(res.vicen > 0.9 * 1.5))
        # salinity stays positive and bounded
        assert float(jnp.min(res.zSin)) > 0.0
        assert float(jnp.max(res.zSin)) < 35.0
