"""Coupling API tests: scale_fluxes math, field merge (incl. fsw splitting,
derived Tf/wind), full coupled loop with callback exchange cadence."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.config import rect_config
from cice5_tpu.driver.coupled import CoupledModel, scale_fluxes
from cice5_tpu.driver.model import Model


def _model(ny=12, nx=16):
    cfg = rect_config()
    cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, ny=ny, nx=nx),
                      dyn=dataclasses.replace(cfg.dyn, ndte=10))
    m = Model(cfg)
    st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    return m, st


class TestScaleFluxes:
    def test_division_and_defaults(self):
        m, st = _model()
        st1, diag = m.step(st, m.forcing_at(0))
        f = m.forcing_at(0)
        sf = scale_fluxes(diag, aice=diag.aice, tmask=m.grid.tmask,
                          Tf=f.Tf, Tair=f.Tair, Qa=f.Qa)
        aice = np.asarray(diag.aice)
        tm = np.asarray(m.grid.tmask)
        ice = (aice > ct.puny) & tm
        # where ice: scaled = mean / aice
        np.testing.assert_allclose(
            np.asarray(sf.fsens)[ice],
            np.asarray(diag.fsens)[ice] / aice[ice], rtol=1e-5)
        # ice-free: zero fluxes, blackbody flwout
        if (~ice).any():
            np.testing.assert_allclose(np.asarray(sf.fsens)[~ice], 0.0)
            Tf = np.asarray(f.Tf)
            expect = -ct.stefan_boltzmann * (Tf[~ice] + ct.Tffresh) ** 4
            np.testing.assert_allclose(np.asarray(sf.flwout)[~ice], expect,
                                       rtol=1e-5)


class TestCoupledModel:
    def test_field_merge(self):
        m, st = _model()
        cm = CoupledModel(model=m)
        shape = m.grid.shape
        cm.from_atm({"fsw": np.full(shape, 200.0),
                     "Tair": np.full(shape, 260.0),
                     "uatm": np.full(shape, 3.0),
                     "vatm": np.full(shape, 4.0)})
        f = cm._forcing
        np.testing.assert_allclose(
            np.asarray(f.swvdr + f.swvdf + f.swidr + f.swidf), 200.0,
            rtol=1e-5)
        np.testing.assert_allclose(np.asarray(f.potT), 260.0)
        np.testing.assert_allclose(np.asarray(f.wind), 5.0, rtol=1e-6)
        cm.from_ocn({"sss": np.full(shape, 30.0)})
        np.testing.assert_allclose(np.asarray(cm._forcing.Tf),
                                   -ct.depressT * 30.0, rtol=1e-5)

    def test_unknown_field_rejected(self):
        m, st = _model()
        cm = CoupledModel(model=m)
        import pytest
        with pytest.raises(KeyError):
            cm.from_atm({"bogus": np.zeros(m.grid.shape)})

    def test_coupled_loop_cadence(self):
        m, st = _model()
        calls = {"atm": 0, "ocn": 0, "put": 0}
        shape = m.grid.shape

        def get_atm(t):
            calls["atm"] += 1
            return {"Tair": np.full(shape, 255.0)}

        def get_ocn(t):
            calls["ocn"] += 1
            return {"sss": np.full(shape, 33.0)}

        received = []

        def put_ocn(t, fields):
            calls["put"] += 1
            received.append(fields)

        cm = CoupledModel(model=m, get_atm=get_atm, get_ocn=get_ocn,
                          put_ocn=put_ocn, num_cpl_ai=2, num_cpl_io=3)
        state, diag = cm.run(st, 6)
        assert calls["atm"] == 3     # steps 0, 2, 4
        assert calls["ocn"] == 2     # steps 0, 3
        assert calls["put"] == 2     # after steps 3, 6
        out = received[-1]
        assert set(out) >= {"strocnxT", "fresh", "fsalt", "fhocn",
                            "fswthru", "aice"}
        assert np.isfinite(np.asarray(out["fhocn"])).all()
        assert float(jnp.max(jnp.asarray(out["aice"]))) > 0.5

    def test_boundary_checksums(self):
        """Checksum ledger (cpl_interface.F90:753 write_boundary_checksums):
        one finite sum per inbound field + outbound exchange, stable
        between identical exchanges."""
        m = Model(rect_config(ny=8, nx=8))
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        cm = CoupledModel(model=m)
        st2, diag = m.step(st, cm._forcing)
        out = cm.into_ocn(st2, diag)
        s1 = cm.boundary_checksums(3600.0, out)
        s2 = cm.boundary_checksums(3600.0, out)
        assert s1 == s2
        assert s1["time"] == 3600.0
        for k in ("Tair", "sst", "out_fhocn", "out_aice"):
            assert k in s1 and np.isfinite(s1[k])


class TestCoupledRadiationOrdering:
    """cfg.coupled_radiation restores the reference coupled-mode
    ordering: prep_radiation rescale at step start + step_radiation at
    step end (ice_step_mod.F90:33-154, :1364; VERDICT r3 item 7)."""

    def _cfg(self, coupled):
        cfg = rect_config(ny=12, nx=16)
        return cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=12, nx=16),
            dyn=dataclasses.replace(cfg.dyn, ndte=10),
            dtype="float64", accum_dtype="float64",
            coupled_radiation=coupled)

    def test_constant_forcing_matches_standalone(self):
        """Under CONSTANT forcing the two orderings are identical: the
        end-of-step radiation on state k equals the start-of-step
        radiation on the same state, and the prep_radiation rescale
        factor is exactly 1."""
        ref = Model(self._cfg(False))
        cm = Model(self._cfg(True))
        f = ref.forcing_at(24 * 180)   # mid-summer: nonzero SW
        st_r = ref.init_state(ice_mask=np.asarray(ref.grid.tmask))
        st_c = cm.init_state(ice_mask=np.asarray(cm.grid.tmask))
        # init_state prefilled the radiation memory with forcing_at(0);
        # re-seed with the loop's forcing so the constant-forcing
        # equivalence is exact (init_shortwave uses the initial forcing)
        from cice5_tpu.driver.step import prefill_radiation
        st_c = prefill_radiation(st_c, f, cm.cfg, cm.tr)
        for k in range(3):
            st_r, d_r = ref.step(st_r, f)
            st_c, d_c = cm.step(st_c, f)
        np.testing.assert_allclose(np.asarray(st_c.vicen),
                                   np.asarray(st_r.vicen), rtol=0,
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(st_c.trcrn),
                                   np.asarray(st_r.trcrn), rtol=0,
                                   atol=1e-6)
        assert float(np.asarray(d_r.fswabs).max()) > 1.0   # sun is up
        np.testing.assert_allclose(np.asarray(d_c.fswabs),
                                   np.asarray(d_r.fswabs), rtol=0,
                                   atol=1e-9)

    def test_varying_forcing_one_step_sw_lag(self):
        """With time-varying SW the coupled ordering differs from the
        standalone one only through the documented one-step SW lag: the
        coupled step's thermo SW equals last step's absorption rescaled
        to the new incoming SW."""
        cm = Model(self._cfg(True))
        st = cm.init_state(ice_mask=np.asarray(cm.grid.tmask))
        # mid-summer hours: nonzero, differing coszen
        f0, f1 = cm.forcing_at(24 * 180), cm.forcing_at(24 * 180 + 6)
        st1, d1 = cm.step(st, f0)
        # rad memory after step 1 is the end-of-step radiation; scale
        # factor is the ice-only net SW under f0
        rp = np.asarray(st1.rad_prev)
        assert rp.shape[1] == 3 + cm.cfg.nslyr + cm.cfg.nilyr
        assert np.isfinite(rp).all()
        st2, d2 = cm.step(st1, f1)
        # thermo SW in step 2 = rad_prev * netsw(f1)/netsw(f0):
        al = np.asarray(st1.rad_alb)
        net1 = (np.asarray(f1.swvdr) * (1 - al[0])
                + np.asarray(f1.swvdf) * (1 - al[1])
                + np.asarray(f1.swidr) * (1 - al[2])
                + np.asarray(f1.swidf) * (1 - al[3]))
        sfac = np.where(
            (np.asarray(st1.aicen.sum(0)) > 0)
            & (np.asarray(st1.scale_factor) > ct.puny),
            net1 / np.maximum(np.asarray(st1.scale_factor), ct.puny), 1.0)
        expected_fswabs = np.asarray(
            (st1.aicen * (st1.rad_prev[:, 0] + st1.rad_prev[:, 1]
                          + st1.rad_prev[:, 2])).sum(0)) * sfac
        np.testing.assert_allclose(np.asarray(d2.fswabs),
                                   expected_fswabs, rtol=1e-10,
                                   atol=1e-10)

    def test_interleave_periods(self):
        """CoupledModel.run honours num_cpl_ai/num_cpl_io exchange
        cadences (drivers/auscom/CICE_RunMod.F90:128-240 coupled loop)
        with the coupled radiation ordering active."""
        m = Model(self._cfg(True))
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        calls = {"atm": [], "ocn": [], "put": []}
        shape = m.grid.shape

        def get_atm(t):
            calls["atm"].append(t)
            return {"Tair": np.full(shape, 263.0)}

        def get_ocn(t):
            calls["ocn"].append(t)
            return {"sst": np.full(shape, -1.5)}

        def put_ocn(t, out):
            calls["put"].append(t)
            assert "fhocn" in out and "aice" in out

        cm = CoupledModel(model=m, get_atm=get_atm, get_ocn=get_ocn,
                          put_ocn=put_ocn, num_cpl_ai=2, num_cpl_io=3)
        st, diag = cm.run(st, nsteps=6)
        assert len(calls["atm"]) == 3      # steps 0, 2, 4
        assert len(calls["ocn"]) == 2      # steps 0, 3
        assert len(calls["put"]) == 2      # after steps 3, 6
        assert np.isfinite(np.asarray(st.vicen)).all()
