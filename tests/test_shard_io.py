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
