"""Per-shard (parallel) restart IO (io/shard_io.py — the PIO
box-rearranger / per-block parallel-write analog, SURVEY §2.10.10)."""
import dataclasses

import numpy as np

import jax

from cice5_tpu.config import rect_config
from cice5_tpu.driver.sharded import ShardedModel
from cice5_tpu.io.shard_io import dump_sharded, restore_sharded


def test_sharded_dump_restore_roundtrip(tmp_path):
    cfg = rect_config(ny=16, nx=32)
    cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=10))
    sm = ShardedModel(cfg, mesh_shape=(2, 4))
    st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))
    st, _ = sm.step(st, sm.forcing_at(0))

    dump_sharded(st, str(tmp_path / "ckpt"), istep=1, time=3600.0)
    st2, meta = restore_sharded(str(tmp_path / "ckpt"))
    assert meta["istep"] == 1 and meta["num_processes"] == 1
    for f in dataclasses.fields(st):
        a = np.asarray(getattr(st, f.name))
        b = np.asarray(getattr(st2, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f.name)  # bit-exact

    # restored state continues the run on the mesh
    st3, _ = sm.step(sm.put(st2), sm.forcing_at(1))
    assert np.isfinite(np.asarray(st3.vicen)).all()


def test_sharded_history_dump_assemble(tmp_path):
    """Per-shard history write (dump_history_sharded + assemble_history)
    produces the SAME netCDF contents as the gather-based write_netcdf
    (io_pio/ice_history_write.F90 parallel path vs io_netcdf gather)."""
    from scipy.io import netcdf_file

    from cice5_tpu.io import history as hist_mod
    from cice5_tpu.io.shard_io import (assemble_history,
                                       dump_history_sharded)

    cfg = rect_config(ny=16, nx=32)
    cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=10))
    sm = ShardedModel(cfg, mesh_shape=(2, 4))
    st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))

    fields = hist_mod.available_fields(cfg, sm.tr)
    st_a = hist_mod.HistoryStream(fields, freq="1", freq_n=2)
    st_b = hist_mod.HistoryStream(fields, freq="1", freq_n=2)
    for k in range(2):
        f = sm.forcing_at(k)
        st, diag = sm.step(st, f)
        vals = hist_mod.diag_to_values(diag, st, sm.grid, sm.tr, f,
                                       cfg.nilyr, cfg.nslyr)
        st_a.accum(vals, (k + 1) * 3600.0)
        st_b.accum(vals, (k + 1) * 3600.0)
    info = sm.calendar.info(2, 3600.0)

    p_ref = str(tmp_path / "gathered.nc")
    hist_mod.write_netcdf(st_a, sm.grid, info, p_ref)
    dump_history_sharded(st_b, info, str(tmp_path / "tiles"))
    p_par = assemble_history(str(tmp_path / "tiles"), sm.grid,
                             str(tmp_path / "assembled.nc"))

    with netcdf_file(p_ref, "r", mmap=False) as fa, \
            netcdf_file(p_par, "r", mmap=False) as fb:
        assert set(fa.variables) == set(fb.variables)
        for name in fa.variables:
            a = np.asarray(fa.variables[name][:])
            b = np.asarray(fb.variables[name][:])
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_read_write_xyt_roundtrip(tmp_path):
    """Generalized binary record IO (io/xyt.py, the ice_read_write.F90
    surface): write_xyt -> read_xyt/read_global/read_xyzt roundtrip."""
    from cice5_tpu.io import xyt

    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 8))
    b = rng.normal(size=(6, 8))
    path = str(tmp_path / "recs.bin")
    xyt.write_xyt(path, [a, b])
    np.testing.assert_array_equal(xyt.read_xyt(path, 8, 6, nrec=1), a)
    np.testing.assert_array_equal(xyt.read_global(path, 8, 6, nrec=2), b)
    both = xyt.read_xyt(path, 8, 6, nrec=1, count=2)
    np.testing.assert_array_equal(both[1], b)
    # 3-D block read: 2 planes as one xyzt record
    z = xyt.read_xyzt(path, 8, 6, nz=2)
    np.testing.assert_array_equal(z[0], a)
    # int records + EOF guard
    k = rng.integers(0, 5, size=(6, 8)).astype(np.int32)
    pk = str(tmp_path / "kmt.bin")
    xyt.write_xyt(pk, k, atype="ida4")
    np.testing.assert_array_equal(xyt.read_xyt(pk, 8, 6, atype="ida4"), k)
    import pytest as _pytest
    with _pytest.raises(EOFError):
        xyt.read_xyt(pk, 8, 6, nrec=2, atype="ida4")
    # netCDF variant
    pn = str(tmp_path / "f.nc")
    xyt.write_xyt_nc(pn, {"a": a, "b": b})
    np.testing.assert_allclose(xyt.read_xyt_nc(pn, "a"), a)
    # ghost-inclusive read
    ext = np.pad(a, 1)
    pe = str(tmp_path / "ext.bin")
    xyt.write_xyt(pe, ext)
    np.testing.assert_array_equal(xyt.read_ext(pe, 8, 6), ext)
