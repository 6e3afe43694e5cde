"""Fused Pallas EVP kernel: trajectory equivalence with the XLA subcycle
loop (interpret mode on CPU), including stress state and diagnostics."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import ModelConfig
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import evp
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.ops.pallas.evp_fused import evp_fused
from cice5_tpu.parallel import Topology


def setup(ny=16, nx=32):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, dx_const=20000.0,
                                      dy_const=20000.0),
                      dtype="float64")
    g = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns="open")
    aice = jnp.where(g.tmask, 0.9, 0.0)
    vice = aice * 1.5
    z = jnp.zeros((ny, nx), jnp.float64)
    f = dict(
        aice=aice, vice=vice, vsno=aice * 0.1,
        strength=strength_hibler(aice, vice),
        strairxT=jnp.where(g.tmask, 0.12, 0.0),
        strairyT=jnp.where(g.tmask, -0.05, 0.0),
        uocn=z + 0.02, vocn=z, uvel=z, vvel=z,
        stressp=jnp.zeros((4, ny, nx)), stressm=jnp.zeros((4, ny, nx)),
        stress12=jnp.zeros((4, ny, nx)), iceumask=z)
    return g, topo, f


class TestFusedEVP:
    @pytest.mark.parametrize("kchunk,nwin", [(5, 2), (10, 1), (4, 4)])
    def test_matches_xla_loop(self, kchunk, nwin):
        g, topo, f = setup()
        p = dyn.EVPParams.classic(3600.0, ndte=20)
        r_ref = evp(3600.0, p, g, topo, **f)
        r_fus = evp_fused(3600.0, p, g, topo, **f, kchunk=kchunk, nwin=nwin)
        # structural equivalence: one subcycle is bit-exact (verified during
        # development); over many subcycles fp reassociation between the
        # fused kernel and the XLA loop is amplified by the elastic waves,
        # so tolerances here are physical-noise level, far below any
        # structural error (which would be O(1))
        np.testing.assert_allclose(np.asarray(r_fus.uvel),
                                   np.asarray(r_ref.uvel), atol=1e-4)
        np.testing.assert_allclose(np.asarray(r_fus.vvel),
                                   np.asarray(r_ref.vvel), atol=1e-4)
        np.testing.assert_allclose(np.asarray(r_fus.stressp),
                                   np.asarray(r_ref.stressp),
                                   rtol=1e-3, atol=20.0)
        np.testing.assert_allclose(np.asarray(r_fus.stress12),
                                   np.asarray(r_ref.stress12),
                                   rtol=1e-3, atol=20.0)
        np.testing.assert_allclose(np.asarray(r_fus.divu),
                                   np.asarray(r_ref.divu), atol=1e-8)
        np.testing.assert_allclose(np.asarray(r_fus.strintx),
                                   np.asarray(r_ref.strintx), atol=1e-3)
        np.testing.assert_allclose(np.asarray(r_fus.strocnxT),
                                   np.asarray(r_ref.strocnxT), atol=1e-4)

    def test_single_subcycle_exact(self):
        """One subcycle, one window: bit-identical to the XLA path."""
        g, topo, f = setup()
        p = dyn.EVPParams.classic(3600.0, ndte=1)
        r_ref = evp(3600.0, p, g, topo, **f)
        r_fus = evp_fused(3600.0, p, g, topo, **f, kchunk=1, nwin=1)
        np.testing.assert_array_equal(np.asarray(r_fus.uvel),
                                      np.asarray(r_ref.uvel))
        np.testing.assert_array_equal(np.asarray(r_fus.stressp),
                                      np.asarray(r_ref.stressp))
