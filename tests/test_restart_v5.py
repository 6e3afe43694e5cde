"""CICE 5 restart interchange: binary + netCDF round trips through the
repo-side v5 writer/reader (spec: ice_restart_driver.F90:45-516 dumpfile/
restartfile; io_binary/ice_restart.F90:100-310 supplemental files;
io_netcdf/ice_restart.F90:223-340), and a continue-run integration."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu.config import rect_config
from cice5_tpu.driver.model import Model
from cice5_tpu.io import restart_v5 as r5


def _model(kdyn=1, **tr_over):
    cfg = rect_config(ny=12, nx=16)
    tro = dict(tr_iage=True, tr_FY=True, tr_lvl=True, tr_pond_lvl=True,
               tr_aero=True, n_aero=2, tr_brine=True, skl_bgc=True)
    tro.update(tr_over)
    cfg = cfg.replace(
        tracers=dataclasses.replace(cfg.tracers, **tro),
        dyn=dataclasses.replace(cfg.dyn, ndte=10, kdyn=kdyn),
        # oceanmixed on so the v5 dump carries sst/frzmlt
        # (ice_restart_driver.F90:180-184)
        forcing=dataclasses.replace(cfg.forcing, oceanmixed_ice=True),
        dtype="float64", accum_dtype="float64")
    return Model(cfg)


def _rich_state(m, seed=3):
    rng = np.random.default_rng(seed)
    st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    shp2 = m.grid.shape

    def r2():
        return jnp.asarray(rng.standard_normal(shp2))

    st = st.replace(
        uvel=0.1 * r2(), vvel=0.1 * r2(),
        stressp=0.01 * jnp.asarray(rng.standard_normal((4,) + shp2)),
        stressm=0.01 * jnp.asarray(rng.standard_normal((4,) + shp2)),
        stress12=0.01 * jnp.asarray(rng.standard_normal((4,) + shp2)),
        scale_factor=jnp.abs(r2()), iceumask=(r2() > 0).astype(jnp.float64),
        strocnxT=0.01 * r2(), strocnyT=0.01 * r2(),
        sst=-1.0 + 0.1 * r2(), frzmlt=10.0 * r2(),
        frz_onset=jnp.abs(r2()) * 100.0,
        first_ice=(r2() > 0).astype(jnp.float64)[None]
        * jnp.ones_like(st.first_ice))
    # seed every tracer slot with distinct values so slot mapping errors
    # are caught
    trcrn = st.trcrn
    for it in range(m.tr.ntrcr):
        trcrn = trcrn.at[:, it].add(0.001 * (it + 1))
    return st.replace(trcrn=trcrn)


# fields the v5 format round-trips exactly (mlt_onset is not in the v5
# dump; a11n/a12n only under kdyn=2)
CORE_FIELDS = ("aicen", "vicen", "vsnon", "trcrn", "uvel", "vvel",
               "stressp", "stressm", "stress12", "scale_factor",
               "iceumask", "strocnxT", "strocnyT", "sst", "frzmlt",
               "frz_onset", "first_ice")


@pytest.mark.parametrize("kdyn", [1, 2])
def test_binary_roundtrip(tmp_path, kdyn):
    m = _model(kdyn=kdyn)
    st = _rich_state(m)
    core = str(tmp_path / "iced.1997-01-02-00000")
    paths = r5.write_restart_v5(st, core, m.cfg, m.tr, istep=24,
                                time=86400.0, time_forc=43200.0)
    # supplemental files exist with the reference naming convention
    names = {os.path.basename(p) for p in paths}
    assert "iced.iage.1997-01-02-00000" in names
    assert "iced.brine.1997-01-02-00000" in names
    assert "iced.aero.1997-01-02-00000" in names
    assert "iced.bgc.1997-01-02-00000" in names
    if kdyn == 2:
        assert "iced.eap.1997-01-02-00000" in names
    st2, meta = r5.read_restart_v5(core, m.cfg, m.tr)
    assert meta["istep"] == 24 and meta["time"] == 86400.0
    assert meta["time_forc"] == 43200.0
    assert "missing_files" not in meta
    fields = CORE_FIELDS + (("a11n", "a12n") if kdyn == 2 else ())
    for f in fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st2, f)), np.asarray(getattr(st, f)),
            err_msg=f)


def test_binary_roundtrip_restart_ext(tmp_path):
    """restart_ext=true interchange: ghost-inclusive (ny+2, nx+2) records
    (ice_read_write.F90:554 ice_read_ext / ice_write_ext, nghost=1) are
    written with the real halo image as the ring and read back by
    auto-detection from the record size; the interior round-trips
    exactly and equals the non-ext read."""
    m = _model()
    st = _rich_state(m, seed=11)
    core = str(tmp_path / "iced.1997-01-02-00000")
    r5.write_restart_v5(st, core, m.cfg, m.tr, istep=24, time=86400.0,
                        restart_ext=True, topo=m.topo)
    # record payloads really are ghost-inclusive
    ny, nx = m.grid.shape
    from cice5_tpu.io.restart import _fseq_records
    recs = _fseq_records(core)
    next(recs)                                   # header
    assert len(next(recs)) == (ny + 2) * (nx + 2) * 8
    st2, meta = r5.read_restart_v5(core, m.cfg, m.tr)
    assert "missing_files" not in meta
    for f in CORE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(st2, f)), np.asarray(getattr(st, f)),
            err_msg=f)
    # edge-replicate fallback (no topology available) still round-trips
    r5.write_restart_v5(st, core + ".norepl", m.cfg, m.tr, istep=24,
                        time=86400.0, restart_ext=True)
    st3, _ = r5.read_restart_v5(core + ".norepl", m.cfg, m.tr)
    np.testing.assert_array_equal(np.asarray(st3.aicen),
                                  np.asarray(st.aicen))


@pytest.mark.parametrize("coszen,om", [(True, True), (True, False),
                                       (False, False)])
def test_coszen_and_oceanmixed_autodetect(tmp_path, coszen, om):
    """CESM builds (#ifdef CCSMCOUPLED) insert a coszen record between
    vvel and scale_factor (ice_restart_driver.F90:128-130) and
    oceanmixed_ice appends sst/frzmlt (:179-182); the reader detects
    both build variants from the record count."""
    m = _model()
    st = _rich_state(m, seed=5)
    core = str(tmp_path / "iced.cz")
    r5.write_restart_v5(st, core, m.cfg, m.tr, istep=7, time=3600.0,
                        coszen=coszen, oceanmixed=om,
                        extras={"coszen": np.full(m.grid.shape, 0.3)})
    st2, meta = r5.read_restart_v5(core, m.cfg, m.tr)
    for f in ("aicen", "trcrn", "uvel", "stressp", "iceumask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st2, f)), np.asarray(getattr(st, f)),
            err_msg=f)
    if om:
        np.testing.assert_array_equal(np.asarray(st2.sst),
                                      np.asarray(st.sst))
    if coszen:
        np.testing.assert_array_equal(meta["coszen"], 0.3)


def test_restart_ext_tripole_field_semantics(tmp_path):
    """restart_ext ghosts are FIELD-APPROPRIATE on a tripole grid: the
    reference's restartfile_ext consumes ghost records verbatim with no
    HaloUpdate, so uvel/vvel must export the negated NEcorner fold image
    (ice_restart_driver.F90:296-298 field_loc_NEcorner/field_type_vector)
    and stress ghosts the folded corner PARTNER (ice_HaloUpdate_stress
    pairs, ice_dyn_evp.F90:425-445), with the interior rows written
    verbatim (no degenerate-row symmetrization leaking into an export)."""
    from cice5_tpu.constants import FieldLoc, FieldType
    from cice5_tpu.parallel import Topology
    from cice5_tpu.parallel import halo
    m = _model()
    topo = Topology(ew="cyclic", ns="tripole")
    st = _rich_state(m, seed=13)
    core = str(tmp_path / "iced.ext")
    r5.write_restart_v5(st, core, m.cfg, m.tr, istep=0, time=0.0,
                        restart_ext=True, topo=topo)
    ny, nx = m.grid.shape
    from cice5_tpu.io.restart import _fseq_records
    recs = list(_fseq_records(core))[1:]
    names = []
    for vname, kind in r5._core_fields(m.cfg, m.tr, True):
        names += [vname] * (m.cfg.ncat if kind == "cat" else 1)

    def rec(vname):
        a = np.frombuffer(recs[names.index(vname)], ">f8")
        return a.reshape(ny + 2, nx + 2)

    u = rec("uvel")
    np.testing.assert_array_equal(u[1:-1, 1:-1], np.asarray(st.uvel))
    expect = np.asarray(halo.extend(st.uvel, topo, loc=FieldLoc.NECORNER,
                                    kind=FieldType.VECTOR))
    np.testing.assert_array_equal(u[-1, 1:-1], expect[-1, 1:-1])
    # and it IS the vector fold, not a scalar-center one
    scal = np.asarray(halo.extend(st.uvel, topo))
    assert not np.array_equal(u[-1, 1:-1], scal[-1, 1:-1])
    sp1 = rec("stressp_1")
    np.testing.assert_array_equal(sp1[1:-1, 1:-1],
                                  np.asarray(st.stressp[0]))
    exp_p = np.asarray(halo.extend(st.stressp[0], topo,
                                   fold_partner=st.stressp[2]))
    np.testing.assert_array_equal(sp1[-1, 1:-1], exp_p[-1, 1:-1])
    assert not np.array_equal(
        sp1[-1, 1:-1], np.asarray(halo.extend(st.stressp[0], topo))[-1, 1:-1])


def test_netcdf_roundtrip(tmp_path):
    m = _model()
    st = _rich_state(m, seed=5)
    p = str(tmp_path / "iced.1998-07-01-00000.nc")
    r5.write_restart_v5_nc(st, p, m.cfg, m.tr, istep=8760, time=3.15e7)
    st2, meta = r5.read_restart_v5_nc(p, m.cfg, m.tr)
    assert meta["istep"] == 8760
    assert "missing_vars" not in meta
    for f in CORE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(st2, f)), np.asarray(getattr(st, f)),
            err_msg=f)


def test_missing_tracer_files_reported(tmp_path):
    """A core-only dump still reads (tracers default); the absent
    supplemental files are surfaced in meta."""
    m = _model()
    st = _rich_state(m)
    core = str(tmp_path / "iced.2000-01-01-00000")
    r5._write_bin_file(core, r5._core_fields(m.cfg, m.tr, True),
                       lambda v, k: 0.1 * np.ones(
                           (m.cfg.ncat, 12, 16) if k == "cat"
                           else (12, 16)),
                       istep=0, time=0.0, time_forc=0.0)
    st2, meta = r5.read_restart_v5(core, m.cfg, m.tr)
    assert len(meta.get("missing_files", [])) >= 4


def test_continue_run_from_v5(tmp_path):
    """runtype='continue' integration: a v5 dump written by one model
    instance restarts another and steps cleanly."""
    m = _model()
    st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    st, _ = m.step(st, m.forcing_at(0))
    core = str(tmp_path / "iced.1997-01-02-00000")
    r5.write_restart_v5(st, core, m.cfg, m.tr, istep=1, time=3600.0)

    m2 = _model()
    st2, meta = r5.read_restart_v5(core, m2.cfg, m2.tr)
    st3, diag = m2.step(st2, m2.forcing_at(meta["istep"]))
    assert int(np.asarray(diag.state_bad)) == 0
    assert np.isfinite(np.asarray(st3.vicen)).all()
    # the restart carried the full prognostic state: stepping the
    # original and the reloaded state gives identical results
    st4, _ = m.step(st, m.forcing_at(1))
    np.testing.assert_array_equal(np.asarray(st4.vicen),
                                  np.asarray(st3.vicen))
