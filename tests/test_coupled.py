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
