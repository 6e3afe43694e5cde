"""Orbital parameter machinery (shr_orb_params Berger-1978 series +
shr_orb_decl declination), vs ice_orbital.F90 / csm_share/shr_orb_mod.F90."""
import math

import numpy as np
import pytest

from cice5_tpu.models.radiation.orbital import shr_orb_params, OrbitalParams
from cice5_tpu.models.radiation import dedd


class TestShrOrbParams:
    def test_amip_ii_epoch(self):
        """The series evaluated near 1995 must reproduce the AMIP II set
        quoted in shr_orb_mod.F90:344-349 (obliq=23.4441, eccen=0.016715,
        mvelp=102.7) to series accuracy."""
        p = shr_orb_params(1995)
        assert abs(p.eccen - 0.016715) < 5e-5
        assert abs(p.obliq - 23.4441) < 5e-3
        assert abs(p.mvelp - 102.7) < 0.2

    def test_reference_default_year(self):
        """iyear_AD=1950 (ice_orbital.F90:46 init_orbit default): obliqr
        must match the present-epoch constant used in radiation/dedd.py."""
        p = shr_orb_params(1950)
        assert abs(p.obliqr - 0.409215) < 1e-5
        assert 0.0162 < p.eccen < 0.0172

    def test_explicit_parameters_branch(self):
        """iyear_AD=None + explicit (eccen, obliq, mvelp) — the
        SHR_ORB_UNDEF_INT branch (shr_orb_mod.F90:336-369)."""
        p = shr_orb_params(None, eccen=0.016715, obliq=23.4441, mvelp=102.7)
        assert p.eccen == 0.016715
        assert p.obliqr == pytest.approx(23.4441 * math.pi / 180.0)
        assert p.mvelpp == pytest.approx((102.7 + 180.0) * math.pi / 180.0)
        # lambm0: mean longitude at v.e. is a small negative angle
        assert -0.04 < p.lambm0 < 0.0

    def test_explicit_parameters_validated(self):
        with pytest.raises(ValueError):
            shr_orb_params(None, eccen=0.5, obliq=23.4, mvelp=102.7)
        with pytest.raises(ValueError):
            shr_orb_params(None, eccen=0.0167, obliq=120.0, mvelp=102.7)
        with pytest.raises(ValueError):
            shr_orb_params(None, eccen=0.0167, obliq=23.4, mvelp=400.0)
        with pytest.raises(ValueError):
            shr_orb_params(None)

    def test_secular_drift_sign(self):
        """Obliquity is currently decreasing (~47 arcsec/century): the
        series must show obliq(2000) < obliq(1900)."""
        assert shr_orb_params(2000).obliq < shr_orb_params(1900).obliq
        # eccentricity is slowly decreasing in the current epoch too
        assert shr_orb_params(2000).eccen < shr_orb_params(1800).eccen

    def test_paleo_years(self):
        """Series stays physical over its +-1e6 yr validity window."""
        for y in (-100000, -10000, 0, 10000):
            p = shr_orb_params(y)
            assert 0.0 <= p.eccen < 0.06
            assert 22.0 < p.obliq < 24.6
            assert 0.0 <= p.mvelp < 360.0
        with pytest.raises(ValueError):
            shr_orb_params(1950 + 2_000_000)


class TestDeclinationConsistency:
    def test_decl_from_computed_params(self):
        """shr_orb_decl fed with series-computed params agrees with the
        hardcoded present-epoch constants in dedd.py to < 0.1 deg of
        declination at all seasons (the constants ARE a shr_orb_params
        evaluation at the present epoch)."""
        p = shr_orb_params(1990)
        for yday in (1.0, 80.5, 172.0, 264.0, 355.0):
            d_new, eccf_new = dedd.shr_orb_decl(
                yday, eccen=p.eccen, obliqr=p.obliqr,
                lambm0=p.lambm0, mvelpp=p.mvelpp)
            d_old, eccf_old = dedd.shr_orb_decl(yday)
            assert abs(float(d_new) - float(d_old)) < 0.1 * math.pi / 180.0
            assert abs(float(eccf_new) - float(eccf_old)) < 1e-3

    def test_solstice_declination(self):
        """At the June solstice the declination equals +obliquity."""
        p = shr_orb_params(2000)
        ydays = np.linspace(150.0, 200.0, 501)
        decl = np.array([float(dedd.shr_orb_decl(
            y, eccen=p.eccen, obliqr=p.obliqr, lambm0=p.lambm0,
            mvelpp=p.mvelpp)[0]) for y in ydays])
        assert abs(decl.max() - p.obliqr) < 1e-4

    def test_equinox_declination_zero(self):
        """Near the vernal equinox (calday ~80.5) declination ~ 0."""
        p = shr_orb_params(2000)
        d, _ = dedd.shr_orb_decl(80.5, eccen=p.eccen, obliqr=p.obliqr,
                                 lambm0=p.lambm0, mvelpp=p.mvelpp)
        assert abs(float(d)) < 0.01


class TestConfigWiring:
    def test_model_orbital_config(self):
        """ShortwaveConfig.iyear_orb / orb_* reach Model.orb and the
        forcing's coszen (ice_orbital.F90 init_orbit -> compute_coszen)."""
        from cice5_tpu.config import rect_config
        from cice5_tpu.driver.model import Model
        import dataclasses as dc
        m1950 = Model(rect_config(ny=8, nx=8))
        assert m1950.orb.eccen == pytest.approx(
            shr_orb_params(1950).eccen)
        cfg = rect_config(ny=8, nx=8)
        cfg = dc.replace(cfg, shortwave=dc.replace(
            cfg.shortwave, iyear_orb=None, orb_eccen=0.03,
            orb_obliq=24.0, orb_mvelp=90.0))
        m = Model(cfg)
        assert m.orb.eccen == 0.03
        f1 = m1950.forcing_at(0)
        f2 = m.forcing_at(0)
        # different orbits -> different declination -> different coszen
        assert not np.allclose(np.asarray(f1.coszen), np.asarray(f2.coszen))
