"""Ocean-column packing (driver/step.py ColumnPacking): the TPU analog of
the reference's compressed cell index lists (icells/indxi/indxj,
ice_therm_vertical.F90:186-200, ice_itd.F90). The column-physics section
gathers only ocean cells into a (rows, 128) batch, skips land entirely,
and scatters results back. One step must agree with the dense path at the
ulp level (the gather/scatter changes fusion, not math)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import grid as G
from cice5_tpu.config import rect_config
from cice5_tpu.driver.model import Model
from cice5_tpu.driver.step import LANE, pack_columns


def landy_grid(ny=48, nx=64, cfg=None):
    land = np.zeros((ny, nx), bool)
    land[:6] = True
    land[20:28, 10:30] = True
    land[35:42, 40:60] = True
    return G.rectgrid(cfg, land_mask=~land), land


class TestPackColumns:
    def test_shapes_and_padding(self):
        cfg = rect_config(ny=48, nx=64)
        gr, land = landy_grid(cfg=cfg)
        p = pack_columns(gr.tmask)
        assert p is not None
        n_ocn = int(np.sum(~land))
        P = p.gidx.shape[0]
        assert P % (16 * LANE) == 0 and P >= n_ocn
        # pads gather a land cell and scatter out of bounds (dropped)
        assert np.all(np.asarray(p.sidx[n_ocn:]) == 48 * 64)
        gpad = np.asarray(p.gidx[n_ocn:])
        assert np.all(land.ravel()[gpad])
        # ocean part is the identity mapping
        ocn = np.flatnonzero(~land.ravel())
        assert np.array_equal(np.asarray(p.gidx[:n_ocn]), ocn)
        assert np.array_equal(np.asarray(p.sidx[:n_ocn]), ocn)

    def test_no_land_returns_none(self):
        assert pack_columns(np.ones((32, 32), bool)) is None
        assert pack_columns(np.zeros((32, 32), bool)) is None


class TestPackedStepEquivalence:
    def test_one_step_matches_dense(self):
        ny, nx = 48, 64
        cfg = rect_config(ny=ny, nx=nx, dtype="float64",
                          accum_dtype="float64")
        gr, _ = landy_grid(ny, nx, cfg)

        def run(compact):
            c = dataclasses.replace(cfg, grid=dataclasses.replace(
                cfg.grid, compact_columns=compact))
            m = Model(c, grid=gr)
            st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
            f = m.forcing_at(0)
            return (*m._jstep(st, f, m.grid), m)

        s1, d1, m1 = run("auto")      # auto == off on every backend
        assert m1.packing is None
        s2, d2, m2 = run("on")
        assert m2.packing is not None

        def close(a, b, name):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:
                return
            if a.dtype == bool:
                assert np.array_equal(a, b), name
                return
            scale = max(float(np.max(np.abs(a))), 1.0)
            # one step: only fusion-order ulp noise is allowed
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-12 * scale,
                                       err_msg=name)

        for k in dataclasses.asdict(s1):
            close(getattr(s1, k), getattr(s2, k), f"state.{k}")
        for k in d1._fields:
            close(getattr(d1, k), getattr(d2, k), f"diag.{k}")
