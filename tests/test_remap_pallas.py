"""Fused Pallas remap-integrals kernel vs the XLA path.

The kernel (ops/pallas/remap_flux.py) runs the SAME `_integrals` code
on VMEM row tiles, so this is an execution-path equivalence test; the
remap physics itself is covered by test_transport_ridge.py. Interpret
mode on the CPU test mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cice5_tpu.config import rect_config
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.transport import remap as rm
from cice5_tpu.parallel import Topology


def test_remap_batch_matches_vmap():
    cfg = rect_config(ny=16, nx=128)
    grid = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns="open")
    rng = np.random.default_rng(1)
    ncat, ntrace, ny, nx = 2, 6, 16, 128
    f = lambda *s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)
    mm = f(ncat, ny, nx)
    tm = f(ncat, ntrace, ny, nx)
    # force the kernel's block-skip branch (lit_blk == 0): category 0
    # fully ice-free, and rows 0..13 of the last category zero so row
    # block 0's whole two-block window (incl. the W=2 ring, zero on the
    # open south boundary) holds no ice — mirrors test_dedd_pallas
    mm = mm.at[0].set(0.0)
    mm = mm.at[-1, :14].set(0.0)
    # one tracer of each dependency class, incl. a type-3 chain
    tracer_type = (1, 1, 1, 2, 3, 2)
    parent = (-1, -1, -1, 0, 3, 1)
    uvel = 0.2 * (f(ny, nx) - 0.5)
    vvel = 0.2 * (f(ny, nx) - 0.5)
    geom = rm.remap_geometry(3600.0, grid, topo, uvel=uvel, vvel=vvel)
    ref = jax.vmap(lambda m, t: rm.remap_fields(
        grid, topo, geom, mm=m, tm=t, tracer_type=tracer_type,
        parent=parent))(mm, tm)
    out = rm.remap_fields_batch(grid, topo, geom, mm=mm, tm=tm,
                                tracer_type=tracer_type, parent=parent,
                                interpret=True)
    for name, a, b in zip(("mm", "tm"), ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, err_msg=name)
    # skipped blocks must write the SAME exact zeros as the XLA path
    # (reconstruction of a zero mass field is exactly zero)
    assert np.all(np.asarray(out[0])[0] == 0.0)
    assert np.all(np.asarray(out[0])[-1, :6] == 0.0)


def test_remap_batch_matches_vmap_tripole():
    """Same equivalence across a tripole U-fold seam: the kernel
    RECOMPUTES reconstructions at fold-ghost cells from the folded raw
    fields, which must match the XLA path's folded (VECTOR-parity)
    extension of locally-computed tc/tx/ty."""
    cfg = rect_config(ny=16, nx=128)
    grid = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns="tripole")
    rng = np.random.default_rng(7)
    ncat, ntrace, ny, nx = 2, 4, 16, 128
    f = lambda *s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)
    mm = f(ncat, ny, nx)
    tm = f(ncat, ntrace, ny, nx)
    # exercise the skip branch across the seam config too: ice-free
    # category + an ice-free south band covering row block 0's window
    mm = mm.at[0].set(0.0)
    mm = mm.at[-1, :14].set(0.0)
    tracer_type = (1, 1, 2, 3)
    parent = (-1, -1, 0, 2)
    uvel = 0.2 * (f(ny, nx) - 0.5)
    vvel = 0.2 * (f(ny, nx) - 0.5)
    geom = rm.remap_geometry(3600.0, grid, topo, uvel=uvel, vvel=vvel)
    ref = jax.vmap(lambda m, t: rm.remap_fields(
        grid, topo, geom, mm=m, tm=t, tracer_type=tracer_type,
        parent=parent))(mm, tm)
    out = rm.remap_fields_batch(grid, topo, geom, mm=mm, tm=tm,
                                tracer_type=tracer_type, parent=parent,
                                interpret=True)
    for name, a, b in zip(("mm", "tm"), ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, err_msg=name)
    assert np.all(np.asarray(out[0])[0] == 0.0)
    assert np.all(np.asarray(out[0])[-1, :6] == 0.0)
