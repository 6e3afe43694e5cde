"""Column thermodynamics tests: BL99 solver convergence and energy
conservation; thickness-change budgets (the reference's built-in
conservation_check_vthermo oracle, SURVEY.md section 4.1)."""
import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.config import ModelConfig
from cice5_tpu.models.thermo import bl99, shared, vertical
from cice5_tpu.models.atmo import atmo_boundary_layer


def _column_inputs(B=(4,), Tair_C=-20.0, sw=0.0, dtype=jnp.float64,
                   Tsf=-17.0, Tsn=-18.0, Ttop=-15.0):
    """A plausible winter column state + forcing."""
    nilyr, nslyr = 7, 1
    f = lambda v: jnp.full(B, v, dtype)
    zSin = jnp.broadcast_to(
        shared.salinity_profile(nilyr, 3.2).astype(dtype)[:, None], (nilyr,) + B)
    Tmlt = -zSin * ct.depressT
    # linear T profile from Ttop at top to -1.8 at bottom
    fracs = (jnp.arange(nilyr, dtype=dtype) + 0.5) / nilyr
    zTin = jnp.broadcast_to((Ttop + fracs * (-1.8 - Ttop))[:, None],
                            (nilyr,) + B)
    zTin = jnp.minimum(zTin, Tmlt - 0.1)
    zTsn = jnp.full((nslyr,) + B, Tsn, dtype)
    inputs = dict(
        mask=jnp.ones(B, bool),
        rhoa=f(1.3), flw=f(180.0), potT=f(Tair_C + ct.Tffresh),
        Qa=f(0.0003), shcoef=f(10.0), lhcoef=f(8.0),
        fswsfc=f(sw * 0.6), fswint=f(sw * 0.3),
        Sswabs=jnp.zeros((nslyr,) + B, dtype),
        Iswabs=jnp.broadcast_to(f(sw * 0.3 / nilyr), (nilyr,) + B),
        hilyr=f(1.4 / nilyr), hslyr=f(0.2 / nslyr),
        zTin=zTin, zSin=zSin, zTsn=zTsn, Tsf=f(Tsf), Tbot=f(-1.8),
    )
    einit = (jnp.sum(inputs["hslyr"] * shared.snow_enthalpy(zTsn), axis=0)
             + jnp.sum(inputs["hilyr"] * shared.ice_enthalpy(zTin, Tmlt), axis=0))
    inputs["einit"] = einit
    return inputs, nilyr, nslyr


class TestBL99:
    def test_converges_and_conserves_cold(self):
        inputs, nilyr, nslyr = _column_inputs()
        r = bl99.temperature_changes(3600.0, nilyr=nilyr, nslyr=nslyr,
                                     conduct="bubbly", ksno=0.3,
                                     l_brine=True, **inputs)
        assert bool(jnp.all(r.converged))
        assert bool(jnp.all(r.Tsf <= 0.0))
        assert bool(jnp.all(r.zTin < 0.0))
        # energy-flux conservation (condition 5 of the solver)
        enew = (jnp.sum(inputs["hslyr"] * r.zqsn, axis=0)
                + jnp.sum(inputs["hilyr"] * r.zqin, axis=0))
        lhs = (enew - inputs["einit"]) / 3600.0
        rhs = r.fcondtopn - r.fcondbot + r.fswint
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=2 * shared.ferrmax)

    def test_melting_surface_clamped(self):
        inputs, nilyr, nslyr = _column_inputs(Tair_C=5.0, sw=600.0,
                                              Tsf=-0.5, Tsn=-0.8, Ttop=-3.0)
        r = bl99.temperature_changes(3600.0, nilyr=nilyr, nslyr=nslyr,
                                     conduct="bubbly", ksno=0.3,
                                     l_brine=True, **inputs)
        assert bool(jnp.all(r.converged))
        assert bool(jnp.all(r.Tsf <= ct.puny))
        # melting surface: net surface flux must exceed conduction
        melt = np.asarray(r.Tsf) >= 0.0
        assert melt.any()
        assert np.all(np.asarray(r.fsurfn)[melt] >=
                      np.asarray(r.fcondtopn)[melt] - 1e-6)

    def test_masked_cells_unchanged(self):
        inputs, nilyr, nslyr = _column_inputs(B=(6,))
        mask = jnp.asarray([True, False, True, False, True, True])
        inputs["mask"] = mask
        r = bl99.temperature_changes(3600.0, nilyr=nilyr, nslyr=nslyr,
                                     conduct="bubbly", ksno=0.3,
                                     l_brine=True, **inputs)
        mnp = ~np.asarray(mask)
        np.testing.assert_array_equal(np.asarray(r.Tsf)[mnp],
                                      np.asarray(inputs["Tsf"])[mnp])
        np.testing.assert_array_equal(np.asarray(r.zTin)[:, mnp],
                                      np.asarray(inputs["zTin"])[:, mnp])


class TestAdjustEnthalpy:
    def test_conserves_total_energy(self, rng):
        nlyr, B = 7, (16,)
        dz = jnp.asarray(rng.uniform(0.05, 0.4, (nlyr,) + B))
        q = jnp.asarray(rng.uniform(-3e8, -1e8, (nlyr,) + B))
        hn = jnp.sum(dz, axis=0)
        hlyr = hn / nlyr
        z1 = vertical._interface_depths(dz)
        z2 = vertical._interface_depths(jnp.broadcast_to(hlyr, (nlyr,) + B))
        qnew = vertical.adjust_enthalpy(z1, z2, hlyr, hn, q)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(qnew * hlyr[None], axis=0)),
            np.asarray(jnp.sum(q * dz, axis=0)), rtol=1e-12)


class TestThermoVertical:
    def _run(self, Tair_C, sw, frzmlt_sign):
        cfg = ModelConfig(dtype="float64", accum_dtype="float64")
        B = (4,)
        f = lambda v: jnp.full(B, float(v), jnp.float64)
        nilyr, nslyr = cfg.nilyr, cfg.nslyr
        zSin = jnp.broadcast_to(
            shared.salinity_profile(nilyr, 3.2)[:, None], (nilyr,) + B)
        Tmlt = -zSin * ct.depressT
        fr = (jnp.arange(nilyr, dtype=jnp.float64) + 0.5) / nilyr
        zTin = jnp.minimum(jnp.broadcast_to((-12.0 + fr * 10.0)[:, None],
                                            (nilyr,) + B), Tmlt - 0.2)
        zqin = shared.ice_enthalpy(zTin, Tmlt)
        zqsn = shared.snow_enthalpy(jnp.full((nslyr,) + B, -15.0, jnp.float64))
        abl = atmo_boundary_layer(
            sfctype="ice", Tsf=f(-14.0), potT=f(Tair_C + ct.Tffresh),
            uatm=f(5.0), vatm=f(0.0), wind=f(5.0), zlvl=f(10.0),
            Qa=f(0.0004), rhoa=f(1.3))
        res = vertical.thermo_vertical(
            3600.0, cfg,
            aicen=f(0.9), vicen=f(0.9 * 1.5), vsnon=f(0.9 * 0.2),
            Tsfcn=f(-14.0), zqin=zqin, zqsn=zqsn, zSin=zSin,
            flw=f(170.0), potT=f(Tair_C + ct.Tffresh), Qa=f(0.0004),
            rhoa=f(1.3), fsnow=f(1e-5 if frzmlt_sign > 0 else 0.0),
            shcoef=abl.shcoef, lhcoef=abl.lhcoef,
            fswsfc=f(sw * 0.7), fswint=f(sw * 0.2),
            Sswabs=jnp.zeros((nslyr,) + B, jnp.float64),
            Iswabs=jnp.broadcast_to(f(sw * 0.2 / nilyr), (nilyr,) + B),
            fbot=f(-150.0) if frzmlt_sign < 0 else f(-0.5),
            Tbot=f(-1.8), sss=f(34.0))
        return res

    def test_cold_grows_ice(self):
        res = self._run(Tair_C=-25.0, sw=0.0, frzmlt_sign=1)
        assert bool(jnp.all(res.converged))
        assert bool(jnp.all(res.congel > 0.0))       # basal growth
        assert bool(jnp.all(res.ferr < shared.ferrmax))
        assert bool(jnp.all(res.vicen > 0.9 * 1.5))  # thicker ice

    def test_warm_melts_ice(self):
        res = self._run(Tair_C=2.0, sw=500.0, frzmlt_sign=-1)
        assert bool(jnp.all(res.converged))
        assert bool(jnp.all(res.meltb + res.meltt + res.melts > 0.0))
        assert bool(jnp.all(res.ferr < shared.ferrmax))
        assert bool(jnp.all(res.vicen < 0.9 * 1.5))

    def test_fresh_water_budget(self):
        res = self._run(Tair_C=-25.0, sw=0.0, frzmlt_sign=1)
        # total ice+snow mass change = (evap - fresh)*dt + new snowfall mass
        # (freshn = evapn - (rhoi dhi + rhos dhs_excl_new)/dt)
        assert np.all(np.isfinite(np.asarray(res.freshn)))
        assert bool(jnp.all(res.fsaltn < 0.0))  # growing ice takes up salt
