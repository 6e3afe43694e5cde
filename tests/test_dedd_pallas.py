"""Fused Pallas delta-Eddington kernel vs the XLA path.

The kernel body (ops/pallas/dedd_fused.py) calls the SAME
shortwave_dEdd physics on VMEM tiles, so this is an execution-path
equivalence test, not a physics test (those live in test_dedd.py).
Runs in Pallas interpret mode on the CPU test mesh; differences come
only from f32 fusion-order rounding and TRMIN/threshold gate flips on
near-threshold cells (~1e-4 relative).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cice5_tpu.models.radiation.dedd import shortwave_dEdd
from cice5_tpu.ops.pallas.dedd_fused import shortwave_dEdd_tiled


@pytest.mark.parametrize("pond_scheme", ["cesm", "lvl", "topo"])
def test_dedd_pallas_matches_xla(pond_scheme):
    rng = np.random.default_rng(7)
    ncat, ny, nx = 2, 8, 128
    nilyr, nslyr = 7, 1
    f = lambda *s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)
    aicen = f(ncat, ny, nx)
    # ice-free row band (all of block 0 at block_rows=4) + one fully
    # ice-free category: these blocks take the kernel's lit-skip branch
    # (flags == 0), which must write the same zeros the dense XLA path
    # produces
    aicen = aicen.at[:, :4].set(0.0)
    aicen = aicen.at[1].set(0.0)
    vicen = aicen * f(ncat, ny, nx) * 3
    vsnon = aicen * f(ncat, ny, nx) * 0.3
    Tsfcn = -10 + 10 * f(ncat, ny, nx)
    apnd = 0.3 * f(ncat, ny, nx)
    hpnd = 0.2 * f(ncat, ny, nx)
    coszen = f(ny, nx)
    coszen = coszen.at[-2:].set(-0.2)    # polar-night rows: dark skip
    kw = dict(nilyr=nilyr, nslyr=nslyr, coszen=coszen,
              fnidr=f(ny, nx), swvdr=f(ny, nx) * 100,
              swvdf=f(ny, nx) * 80, swidr=f(ny, nx) * 60,
              swidf=f(ny, nx) * 40, pond_scheme=pond_scheme)
    ref = jax.vmap(lambda a, v, s, t, p, h: shortwave_dEdd(
        aicen=a, vicen=v, vsnon=s, Tsfcn=t, apnd=p, hpnd=h, **kw))(
        aicen, vicen, vsnon, Tsfcn, apnd, hpnd)
    out = shortwave_dEdd_tiled(
        aicen=aicen, vicen=vicen, vsnon=vsnon, Tsfcn=Tsfcn, apnd=apnd,
        hpnd=hpnd, interpret=True, block_rows=4, **kw)
    # the skipped blocks must be EXACTLY the XLA zeros, not approximately
    for a, b in zip(ref, out):
        assert np.all(np.asarray(a)[..., :4, :] == 0.0)
        assert np.all(np.asarray(b)[..., :4, :] == 0.0)
        assert np.all(np.asarray(b)[1] == 0.0)
    for name, a, b in zip(ref._fields, ref, out):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1.0)
        bad = np.abs(a - b) > 2e-3 * scale
        # near-threshold cells (TRMIN / puny dark gates) are bistable
        # under 1-ulp fusion-order differences: allow a tiny count of
        # gate flips, bounded in magnitude
        frac = bad.mean()
        assert frac <= 1e-3, (name, frac)
        assert np.max(np.abs(a - b)) <= 0.01 * scale, name
