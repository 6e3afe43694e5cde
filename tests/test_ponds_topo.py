"""Topographic melt ponds (ice_meltpond_topo.F90 compute_ponds_topo :69,
pond_area :379, calc_hpond :651, permeability_phi :812)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo import shared as thshared
from cice5_tpu.models.tracers.ponds import (compute_ponds_topo,
                                            permeability_phi)

NCAT, NILYR = 5, 7
B = (4, 6)


def _itd_state(hs=0.0, cold=True, dtype=jnp.float64):
    """A cell with a full parabolic-ish ITD of distinct thicknesses."""
    hcat = np.array([0.3, 0.8, 1.5, 2.5, 4.0])
    acat = np.array([0.15, 0.25, 0.25, 0.2, 0.1])
    aicen = jnp.asarray(np.broadcast_to(acat[:, None, None],
                                        (NCAT,) + B), dtype)
    vicen = aicen * jnp.asarray(hcat, dtype)[:, None, None]
    vsnon = aicen * hs
    Ti = -10.0 if cold else -0.5
    sal = 3.2
    q = thshared.ice_enthalpy(jnp.full((NILYR, NCAT) + B, Ti, dtype),
                              -sal * ct.depressT)
    s = jnp.full((NILYR, NCAT) + B, sal, dtype)
    Tsfcn = jnp.full((NCAT,) + B, Ti, dtype)
    return aicen, vicen, vsnon, q, s, Tsfcn


def _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd,
          meltt=0.0, fsurf=0.0, ktherm=2, dt=3600.0):
    aice = jnp.sum(aicen, 0)
    vice = jnp.sum(vicen, 0)
    vsno = jnp.sum(vsnon, 0)
    shp = aice.shape
    return compute_ponds_topo(
        dt, aice=aice, aicen=aicen, vice=vice, vicen=vicen, vsno=vsno,
        vsnon=vsnon, meltt=jnp.full(shp, meltt, aice.dtype),
        fsurf=jnp.full(shp, fsurf, aice.dtype), Tsfcn=Tsfcn,
        Tf=jnp.full(shp, -1.8, aice.dtype), qicen=q, sicen=s,
        apnd=apnd, hpnd=hpnd, ipnd=ipnd, ktherm=ktherm)


class TestPondAreaHypsometry:
    def test_water_fills_lowest_categories(self):
        """Water ponds on the THINNEST ice first (lowest surface), and the
        thickest category never ponds (pond_area: m_index <= ncat-1)."""
        aicen, vicen, vsnon, q, s, Tsfcn = _itd_state()
        # modest water volume spread initially over all categories
        apnd = jnp.full((NCAT,) + B, 0.3, aicen.dtype)
        hpnd = jnp.full((NCAT,) + B, 0.05, aicen.dtype)
        ipnd = jnp.zeros((NCAT,) + B, aicen.dtype)
        r = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd)
        ap = np.asarray(r.apnd)
        assert ap[0].min() > 0.0          # thinnest category ponds
        assert ap[-1].max() == 0.0        # thickest never ponds
        # pond depth decreases with category thickness (same water level)
        hp = np.asarray(r.hpnd)
        ponded = ap[:, 0, 0] > 0
        depths = hp[ponded, 0, 0]
        assert (np.diff(depths) <= 1e-12).all()

    def test_liquid_water_conservation(self):
        """volp_new == volp_old + dfpond: every source/sink of liquid pond
        water is mirrored in the fpond flux (compute_ponds_topo fpond
        bookkeeping + pond_area dvolp)."""
        aicen, vicen, vsnon, q, s, Tsfcn = _itd_state()
        rng = np.random.default_rng(7)
        apnd = jnp.asarray(rng.uniform(0, 0.5, (NCAT,) + B))
        hpnd = jnp.asarray(rng.uniform(0, 0.3, (NCAT,) + B))
        ipnd = jnp.asarray(rng.uniform(0, 0.02, (NCAT,) + B))
        volp0 = np.asarray(jnp.sum(hpnd * apnd * aicen, 0))
        for ktherm, meltt in ((2, 0.0), (1, 0.0), (2, 0.01)):
            r = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd,
                      meltt=meltt, ktherm=ktherm)
            volp1 = np.asarray(jnp.sum(r.hpnd * r.apnd * aicen, 0))
            np.testing.assert_allclose(volp1, volp0 + np.asarray(r.dfpond),
                                       atol=1e-12)

    def test_thin_ice_ponds_removed(self):
        """aice<=0.01 or hi<=0.1 removes all ponds and returns the water
        (compute_ponds_topo :213-222)."""
        aicen, vicen, vsnon, q, s, Tsfcn = _itd_state()
        vicen = vicen * 0.02              # hi ~ 0.03 m everywhere
        apnd = jnp.full((NCAT,) + B, 0.4, aicen.dtype)
        hpnd = jnp.full((NCAT,) + B, 0.1, aicen.dtype)
        ipnd = jnp.zeros((NCAT,) + B, aicen.dtype)
        volp0 = np.asarray(jnp.sum(hpnd * apnd * aicen, 0))
        r = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd)
        assert np.asarray(r.apnd).max() == 0.0
        np.testing.assert_allclose(np.asarray(r.dfpond), -volp0, atol=1e-12)

    def test_overflow_drains(self):
        """More water than the hypsometry can hold drains to the ocean
        (pond_area :539-549)."""
        aicen, vicen, vsnon, q, s, Tsfcn = _itd_state()
        apnd = jnp.full((NCAT,) + B, 1.0, aicen.dtype)
        hpnd = jnp.full((NCAT,) + B, 10.0, aicen.dtype)   # absurd volume
        ipnd = jnp.zeros((NCAT,) + B, aicen.dtype)
        r = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd)
        assert float(jnp.max(r.dfpond)) < 0.0             # net drainage
        volp1 = np.asarray(jnp.sum(r.hpnd * r.apnd * aicen, 0))
        assert np.isfinite(volp1).all()
        assert (volp1 < 10.0).all()


class TestLidEvolution:
    def _ponded(self):
        aicen, vicen, vsnon, q, s, Tsfcn = _itd_state()
        apnd = jnp.full((NCAT,) + B, 0.4, aicen.dtype)
        hpnd = jnp.full((NCAT,) + B, 0.1, aicen.dtype)
        return aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd

    def test_cold_surface_grows_lid(self):
        """Tsfc << Tp: existing lid thickens, liquid pond shrinks
        (compute_ponds_topo :277-295)."""
        aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd = self._ponded()
        ipnd = jnp.full((NCAT,) + B, 0.01, aicen.dtype)
        r = _call(aicen, vicen, vsnon, q, s, Tsfcn - 5.0, apnd, hpnd, ipnd)
        # categories with liquid water keep/grow their lid (dry ponded
        # categories get the lid zapped, :322-344)
        wet = np.asarray(r.hpnd) > 1e-6
        assert wet.any()
        assert (np.asarray(r.ipnd)[wet] > 0.0).all()
        # frozen water left the liquid budget
        assert float(jnp.sum(r.dfpond)) < 0.0

    def test_new_lid_forms_from_negative_fsurf(self):
        """No lid + strongly negative surface flux: lid nucleates
        (compute_ponds_topo :297-315)."""
        aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd = self._ponded()
        ipnd = jnp.zeros((NCAT,) + B, aicen.dtype)
        r = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd,
                  fsurf=-200.0)
        ponded = np.asarray(r.apnd)[:-1] > 0
        assert np.asarray(r.ipnd)[:-1][ponded].max() > 0.0

    def test_warm_surface_melts_lid(self):
        """Tsfc ~ 0 with surface melt: lid thins back into the pond
        (compute_ponds_topo :253-274)."""
        aicen, vicen, vsnon, q, s, Tsfcn = _itd_state(cold=False)
        Tsfcn = jnp.full_like(Tsfcn, -0.05)   # above Tp = -0.15 C
        apnd = jnp.full((NCAT,) + B, 0.4, aicen.dtype)
        hpnd = jnp.full((NCAT,) + B, 0.1, aicen.dtype)
        ipnd = jnp.full((NCAT,) + B, 0.05, aicen.dtype)
        vuin0 = jnp.sum(ipnd * apnd * aicen, 0)
        r0 = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd,
                   meltt=0.0)
        r1 = _call(aicen, vicen, vsnon, q, s, Tsfcn, apnd, hpnd, ipnd,
                   meltt=0.02)
        vuin1 = jnp.sum(r1.vuin, 0)
        assert float(jnp.max(vuin1 - vuin0)) <= 1e-12   # lid never grows
        # melt run returns more water to the ponds than the no-melt run
        assert float(jnp.sum(r1.dfpond)) > float(jnp.sum(r0.dfpond))


class TestPermeability:
    def test_cold_ice_impermeable(self):
        q = thshared.ice_enthalpy(jnp.full((NILYR, 3), -15.0, jnp.float64),
                                  -3.2 * ct.depressT)
        s = jnp.full((NILYR, 3), 3.2, jnp.float64)
        perm = permeability_phi(q, s, jnp.full((3,), -15.0), -1.8)
        assert (np.asarray(perm) < 1e-10).all()

    def test_warm_ice_permeable(self):
        q = thshared.ice_enthalpy(jnp.full((NILYR, 3), -0.8, jnp.float64),
                                  -3.2 * ct.depressT)
        s = jnp.full((NILYR, 3), 3.2, jnp.float64)
        perm = permeability_phi(q, s, jnp.full((3,), -0.5), -1.8)
        assert (np.asarray(perm) > 1e-10).all()


class TestTopoInStep:
    def test_full_step_with_topo_ponds(self):
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        cfg = rect_config()
        cfg = cfg.replace(
            grid=dataclasses.replace(cfg.grid, ny=16, nx=24),
            thermo=dataclasses.replace(cfg.thermo, ktherm=2),
            tracers=dataclasses.replace(cfg.tracers, tr_pond_topo=True),
            dyn=dataclasses.replace(cfg.dyn, ndte=10))
        m = Model(cfg)
        st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        # seed ponds so the scheme has water to move
        tr = m.tr
        st = st.replace(trcrn=st.trcrn
                        .at[:, tr.nt_apnd].set(0.3 * (st.aicen > 0))
                        .at[:, tr.nt_hpnd].set(0.08 * (st.aicen > 0)))
        for k in range(3):
            st, diag = m.step(st, m.forcing_at(k))
        ap = np.asarray(st.trcrn[:, tr.nt_apnd])
        hp = np.asarray(st.trcrn[:, tr.nt_hpnd])
        ip = np.asarray(st.trcrn[:, tr.nt_ipnd])
        assert np.isfinite(ap).all() and np.isfinite(hp).all() \
            and np.isfinite(ip).all()
        assert ap.min() >= 0.0 and ap.max() <= 1.0 + 1e-6
        assert hp.min() >= 0.0
