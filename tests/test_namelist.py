"""ice_in namelist ingestion (cice5_tpu/namelist.py): the reference's
config surface (ice_init.F90:135-199) must map onto ModelConfig."""
import numpy as np
import pytest

from cice5_tpu.namelist import config_from_ice_in, parse_namelist

REF = "/root/reference/input_templates"


class TestParser:
    def test_gx1_values(self):
        g = parse_namelist(f"{REF}/gx1/ice_in")
        s = g["setup_nml"]
        assert s["dt"] == 3600.0 and s["npt"] == 8760
        assert s["use_leap_years"] is False
        assert s["histfreq"] == ["m", "x", "x", "x", "x"]
        assert s["latpnt"] == [90.0, -65.0]
        assert g["dynamics_nml"]["mu_rdg"] == 3
        assert g["thermo_nml"]["dsdt_slow_mode"] == -5.0e-8
        assert g["forcing_nml"]["atm_data_type"] == "LYq"

    def test_fortran_spellings(self, tmp_path):
        p = tmp_path / "nl"
        p.write_text("&g\n x = 17.\n , y = 1.d-11\n , z = 'a b'\n"
                     " , w = .TRUE.\n/\n")
        g = parse_namelist(str(p))["g"]
        assert g["x"] == 17.0 and g["y"] == 1.0e-11
        assert g["z"] == "a b" and g["w"] is True


class TestConfigMapping:
    @pytest.mark.parametrize("name,nx,ny", [
        ("col", 5, 5), ("gx3", 100, 116), ("gx1", 320, 384),
        ("tp1", 100, 116)])
    def test_all_templates_ingest(self, name, nx, ny):
        cfg, run = config_from_ice_in(f"{REF}/{name}/ice_in", nx=nx, ny=ny)
        # every entry is either mapped or listed in run['unmapped'];
        # the shipped templates must leave only the documented leftovers
        allowed = {"phi_snow", "snowinfil"}
        assert set(run["unmapped"]) <= allowed, run["unmapped"]
        assert len(run["icefields"]) > 100
        assert cfg.thermo.ktherm == 2
        assert cfg.grid.nx == nx and cfg.grid.ny == ny

    def test_gx1_matches_parity_config(self):
        """The ingested gx1 ice_in must agree with the hand-written
        gx1_parity_config on every physics option both define."""
        from cice5_tpu.config import gx1_parity_config
        cfg, run = config_from_ice_in(f"{REF}/gx1/ice_in", nx=320, ny=384)
        ref = gx1_parity_config()
        assert cfg.thermo.ktherm == ref.thermo.ktherm == 2
        assert cfg.thermo.dSdt_slow_mode == ref.thermo.dSdt_slow_mode
        assert cfg.shortwave.shortwave == ref.shortwave.shortwave == "dEdd"
        assert cfg.shortwave.R_snw == ref.shortwave.R_snw == 1.5
        assert cfg.dyn.ndte == ref.dyn.ndte == 120
        assert cfg.dyn.kstrength == ref.dyn.kstrength == 1
        assert cfg.dyn.advection == ref.dyn.advection == "remap"
        assert cfg.tracers.tr_iage and cfg.tracers.tr_FY
        assert cfg.tracers.tr_pond_lvl and not cfg.tracers.tr_pond_cesm
        assert cfg.tracers.frzpnd == ref.tracers.frzpnd == "hlid"
        assert cfg.forcing.oceanmixed_ice
        assert cfg.kcatbound == ref.kcatbound == 0
        assert cfg.time.dt == 3600.0
        # dynamics mu_rdg: gx1 ice_in says 3 (parity config keeps the
        # reference namelist default 4; the CMHB runs used the template)
        assert cfg.dyn.mu_rdg == 3.0
        # run controls
        assert run["histfreq"][0] == "m" and run["diagfreq"] == 24
        assert run["atm_data_type"] == "LYq" if "atm_data_type" in run \
            else True

    def test_ingested_config_builds_model(self):
        """A Model built from the ingested col ice_in must step."""
        from cice5_tpu.driver.model import Model
        cfg, run = config_from_ice_in(
            f"{REF}/col/ice_in", nx=8, ny=8, strict=False,
            # col has kdyn implicit 0 (no dynamics_nml kdyn=0? it ships
            # kdyn=0) — keep whatever it says; shrink for test speed
        )
        cfg = cfg.replace(
            grid=cfg.grid.__class__(nx=8, ny=8, grid_type="rectangular",
                                    lat0=71.35),
            dtype="float64", accum_dtype="float64")
        m = Model(cfg)
        s = m.init_state(ice_mask=np.asarray(m.grid.tmask))
        s2, _ = m.step(s, m.forcing_at(0))
        assert np.isfinite(np.asarray(s2.vicen)).all()

    def test_strict_raises_on_unknown(self, tmp_path):
        p = tmp_path / "ice_in"
        p.write_text("&thermo_nml\n ktherm = 2\n , made_up_option = 3\n/\n")
        with pytest.raises(ValueError):
            config_from_ice_in(str(p), nx=4, ny=4, strict=True)
        cfg, run = config_from_ice_in(str(p), nx=4, ny=4)
        assert run["unmapped"] == {"made_up_option": 3}


class TestMushyParamsWired:
    def test_dsdt_slow_mode_changes_drainage(self):
        """dSdt_slow_mode must actually reach the mushy drainage solver
        (the dead-flag regression of round 1)."""
        import jax.numpy as jnp
        from cice5_tpu.models.thermo.mushy import explicit_flow_velocities
        nilyr = 4
        shape = (nilyr, 3)
        zSin = jnp.full(shape, 10.0)
        zTin = jnp.full(shape, -4.0)
        Tsf = jnp.full((3,), -20.0)
        Tbot = jnp.full((3,), -1.8)
        sss = jnp.full((3,), 32.0)
        qocn = jnp.zeros((3,))
        hilyr = jnp.full((3,), 0.4)
        hin = hilyr * nilyr
        _, dS1, _, _ = explicit_flow_velocities(
            3600.0, zSin, zTin, Tsf, Tbot, sss, qocn, hilyr, hin,
            dSdt_slow=-1.5e-7)
        _, dS2, _, _ = explicit_flow_velocities(
            3600.0, zSin, zTin, Tsf, Tbot, sss, qocn, hilyr, hin,
            dSdt_slow=-5.0e-8)
        assert float(jnp.abs(dS1 - dS2).max()) > 0.0
        np.testing.assert_allclose(np.asarray(dS1), 3.0 * np.asarray(dS2),
                                   rtol=1e-6)


class TestIcefieldsMapping:
    def test_every_selected_flag_maps_to_catalog_fields(self):
        """Every f_* history flag selected (non-'x') in the 4 shipped
        ice_in templates maps onto real catalog fields under a
        configuration with the relevant physics enabled
        (ice_history_shared.F90:186-358 + the per-module icefields
        groups; VERDICT r3 item 4)."""
        import dataclasses
        from cice5_tpu.config import rect_config
        from cice5_tpu.io.history import fields_for_icefields
        from cice5_tpu.namelist import config_from_ice_in
        from cice5_tpu.state import build_tracer_registry

        cfg = rect_config()
        cfg = cfg.replace(
            tracers=dataclasses.replace(
                cfg.tracers, tr_iage=True, tr_FY=True, tr_lvl=True,
                tr_pond_lvl=True, tr_aero=True, n_aero=3, tr_brine=True,
                skl_bgc=True),
            dyn=dataclasses.replace(cfg.dyn, diag_mechred=True),
            forcing=dataclasses.replace(cfg.forcing, formdrag=True))
        tr = build_tracer_registry(cfg)
        base = "/root/reference/input_templates"
        shapes = {"col": (8, 8), "gx3": (100, 116), "gx1": (320, 384),
                  "tp1": (100, 116)}
        for tmpl, (nx, ny) in shapes.items():
            _c, run = config_from_ice_in(f"{base}/{tmpl}/ice_in",
                                         nx=nx, ny=ny)
            ice = run.get("icefields", {})
            assert ice, tmpl
            fields, unmapped = fields_for_icefields(ice, cfg, tr)
            assert not unmapped, (tmpl, unmapped)
            assert len(fields) > 50, (tmpl, len(fields))
