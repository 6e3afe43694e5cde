"""ShardedModel tests: multi-device step trajectory matches the
single-device Model (the Model-level decomposition-invariance oracle),
state stays sharded, gather works."""
import dataclasses

import jax
import numpy as np
import pytest

from cice5_tpu.config import rect_config
from cice5_tpu.driver.model import Model
from cice5_tpu.driver.sharded import ShardedModel


def _cfg(ny=16, nx=32):
    cfg = rect_config()
    return cfg.replace(grid=dataclasses.replace(cfg.grid, ny=ny, nx=nx),
                       dyn=dataclasses.replace(cfg.dyn, ndte=15))


class TestShardedModel:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
    def test_matches_single_device(self, mesh_shape):
        cfg = _cfg()
        ref = Model(cfg)
        st_ref = ref.init_state(ice_mask=np.asarray(ref.grid.tmask))
        sm = ShardedModel(cfg, mesh_shape=mesh_shape)
        st_s = sm.put(st_ref)

        for k in range(2):
            st_ref, d_ref = ref.step(st_ref, ref.forcing_at(k))
            st_s, d_s = sm.step(st_s, sm.forcing_at(k))

        np.testing.assert_allclose(np.asarray(st_s.vicen),
                                   np.asarray(st_ref.vicen), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_s.uvel),
                                   np.asarray(st_ref.uvel), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_s.fhocn),
                                   np.asarray(d_ref.fhocn), atol=1e-4)

    def test_state_is_sharded(self):
        cfg = _cfg()
        sm = ShardedModel(cfg, mesh_shape=(2, 4))
        st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))
        shardings = st.aicen.sharding
        assert len(shardings.device_set) == 8
        # run + gather round-trip
        st = sm.run(st, 1)
        host = sm.gather(st)
        assert isinstance(host.aicen, np.ndarray)
        assert np.isfinite(host.aicen).all()
