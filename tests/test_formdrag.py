"""Form drag tests: neutral limits, ridged-ice enhancement, pond/floe-edge
contributions, drag caps, full-step smoke with formdrag on."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.models.formdrag import (CAMAX, CWMAX, CSA, CSW,
                                       neutral_drag_coeffs)


def _inputs(B=(6,), ai=0.9, hi=2.0, hs=0.2, ncat=5, ardg_frac=0.0,
            apnd_val=0.0):
    f = lambda v: jnp.full(B, float(v), jnp.float64)
    fc = lambda v: jnp.full((ncat,) + B, float(v), jnp.float64)
    kw = dict(
        aice=f(ai), vice=f(ai * hi), vsno=f(ai * hs),
        aicen=fc(ai / ncat), vicen=fc(ai * hi / ncat),
        alvl=fc(1.0 - ardg_frac), vlvl=fc(1.0 - ardg_frac),
        apnd=fc(apnd_val), hpnd=fc(0.1 if apnd_val else 0.0),
        ipnd=fc(0.0))
    return kw


class TestFormDrag:
    def test_level_ice_near_skin_drag(self):
        """All level ice, no ponds: drag ~ skin + floe edge only."""
        r = neutral_drag_coeffs(**_inputs())
        assert float(jnp.max(r.Cdn_atm_rdg)) == 0.0
        assert float(jnp.max(r.Cdn_ocn_keel)) == 0.0
        assert float(jnp.max(r.Cdn_atm_pond)) == 0.0
        np.testing.assert_allclose(np.asarray(r.Cdn_atm_skin), CSA)
        np.testing.assert_allclose(np.asarray(r.Cdn_ocn_skin), CSW)
        assert float(jnp.min(r.Cdn_atm)) > 0.0

    def test_ridges_add_drag(self):
        lvl = neutral_drag_coeffs(**_inputs(ardg_frac=0.0))
        rdg = neutral_drag_coeffs(**_inputs(ardg_frac=0.5, hi=3.0))
        assert float(jnp.min(rdg.Cdn_atm_rdg)) > 0.0
        assert float(jnp.min(rdg.Cdn_ocn_keel)) > 0.0
        assert float(jnp.min(rdg.hridge)) > 0.0
        assert float(jnp.min(rdg.hkeel)) > float(jnp.min(rdg.hridge))
        # total atmo drag higher with ridges
        assert float(jnp.min(rdg.Cdn_atm - lvl.Cdn_atm)) > 0.0

    def test_ponds_add_drag(self):
        dry = neutral_drag_coeffs(**_inputs())
        wet = neutral_drag_coeffs(**_inputs(apnd_val=0.3))
        assert float(jnp.min(wet.Cdn_atm_pond)) > 0.0
        assert float(jnp.max(dry.Cdn_atm_pond)) == 0.0

    def test_caps_respected(self):
        r = neutral_drag_coeffs(**_inputs(ardg_frac=0.95, hi=8.0,
                                          apnd_val=0.9))
        assert float(jnp.max(r.Cdn_atm)) <= CAMAX + 1e-12
        assert float(jnp.max(r.Cdn_ocn)) <= CWMAX + 1e-12

    def test_ice_free_defaults(self):
        kw = _inputs(ai=0.0, hi=0.0, hs=0.0)
        kw["aice"] = jnp.zeros((6,))
        r = neutral_drag_coeffs(**kw)
        cd_neutral = (ct.vonkar / np.log(ct.zref / ct.iceruf)) ** 2
        np.testing.assert_allclose(np.asarray(r.Cdn_atm), cd_neutral,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(r.Cdn_ocn), ct.dragio,
                                   rtol=1e-6)

    def test_draft_physical(self):
        r = neutral_drag_coeffs(**_inputs(hi=2.0, hs=0.2))
        hd = np.asarray(r.hdraft)
        hf = np.asarray(r.hfreebd)
        assert (hd > 0).all() and (hf > 0).all()
        np.testing.assert_allclose(hd + hf, 2.2, rtol=1e-6)


class TestFormDragStep:
    def test_full_step_smoke(self):
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=24, nx=32),
            tracers=dataclasses.replace(cfg.tracers, tr_lvl=True,
                                        tr_pond_lvl=True),
            forcing=dataclasses.replace(cfg.forcing, formdrag=True),
            dyn=dataclasses.replace(cfg.dyn, ndte=20))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        st, diag = m.step(st, m.forcing_at(0))
        assert np.isfinite(np.asarray(st.uvel)).all()
        assert np.isfinite(np.asarray(diag.fsens)).all()
