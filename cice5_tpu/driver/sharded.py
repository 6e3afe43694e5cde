"""Multi-device model driver: the user-facing SPMD surface.

The reference scales by MPI rank decomposition configured at build time
(ice_domain.F90 block distribution; SURVEY.md section 2.10). Here the same
model step runs unchanged under ``shard_map`` over a 2-D (Y, X) device
mesh: spatial fields are sharded on their trailing (ny, nx) axes, halo
exchanges become ICI ppermutes inside the step (parallel/halo.py), and
global reductions ride psum. One class wraps the mesh plumbing so a
multi-chip run looks exactly like a single-chip one:

    m = ShardedModel(cfg)                  # uses all local devices
    state = m.init_state()                 # device-sharded State
    state = m.run(state, nsteps=24)

Decomposition invariance (same trajectory on any mesh shape) is tested in
tests/test_sharded_model.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cice5_tpu.config import ModelConfig
from cice5_tpu.driver.model import Model
from cice5_tpu.driver.step import step as step_fn
from cice5_tpu.parallel import make_mesh
from cice5_tpu.parallel.mesh import mesh_topology


def spatial_spec(x):
    """PartitionSpec sharding the trailing (ny, nx) axes."""
    n = getattr(x, "ndim", 0)
    if n >= 2:
        return P(*([None] * (n - 2)), "Y", "X")
    return P()


@dataclass
class ShardedModel:
    """Model wrapper running the step under shard_map over a device mesh.

    devices: flat list (defaults to jax.devices()); mesh shape chosen by
    make_mesh to divide (ny, nx) evenly.
    """
    cfg: ModelConfig
    devices: list | None = None
    mesh_shape: tuple | None = None
    grid: object | None = None    # optional pre-built Grid (synthesized
    # or read elsewhere), like Model(cfg, grid=...)

    def __post_init__(self):
        cfg = self.cfg
        self.inner = Model(cfg, grid=self.grid)
        self.grid = self.inner.grid
        self.tr = self.inner.tr
        self.calendar = self.inner.calendar
        devs = self.devices if self.devices is not None else jax.devices()
        self.mesh = make_mesh(devices=devs, ny=cfg.grid.ny, nx=cfg.grid.nx,
                              shape=self.mesh_shape)
        self.topo = mesh_topology(self.mesh, ew=cfg.grid.ew_boundary,
                                  ns=cfg.grid.ns_boundary)
        fn = partial(step_fn, cfg=cfg, tr=self.tr, topo=self.topo,
                     hin_max=self.inner.hin_max, salinz=self.inner.salinz)

        st0 = self.inner.init_state()
        f0 = self.inner.forcing_at(0)
        out_shape = jax.eval_shape(
            lambda s, f: step_fn(s, f, self.grid, cfg=cfg, tr=self.tr,
                                 topo=self.inner.topo,
                                 hin_max=self.inner.hin_max,
                                 salinz=self.inner.salinz), st0, f0)
        self._in_specs = (jax.tree.map(spatial_spec, st0),
                          jax.tree.map(spatial_spec, f0),
                          jax.tree.map(spatial_spec, self.grid))
        self._out_specs = jax.tree.map(spatial_spec, out_shape)
        self._jstep = jax.jit(shard_map(
            fn, mesh=self.mesh, in_specs=self._in_specs,
            out_specs=self._out_specs, check_vma=False))
        self._grid_dev = self.put(self.grid, self._in_specs[2])

    def put(self, tree, specs=None):
        """device_put a pytree with the model's spatial sharding.

        Multi-host: every process holds the same global array (built
        deterministically); make_array_from_callback slices out each
        process's addressable shards (the scatter_global analog,
        mpi/ice_gather_scatter.F90:968)."""
        specs = specs if specs is not None else jax.tree.map(spatial_spec,
                                                             tree)
        multihost = jax.process_count() > 1

        def _put(x, s):
            sh = NamedSharding(self.mesh, s)
            if not multihost:
                return jax.device_put(x, sh)
            xn = np.asarray(x)
            return jax.make_array_from_callback(xn.shape, sh,
                                                lambda idx: xn[idx])
        return jax.tree.map(_put, tree, specs)

    def init_state(self, **kw):
        return self.put(self.inner.init_state(**kw))

    @property
    def forcing_provider(self):
        return self.inner.forcing_provider

    @forcing_provider.setter
    def forcing_provider(self, fn):
        self.inner.forcing_provider = fn

    def forcing_at(self, istep: int):
        return self.put(self.inner.forcing_at(istep))

    def step(self, state, forcing):
        return self._jstep(state, forcing, self._grid_dev)

    def run(self, state, nsteps: int, **kw):
        """Full driver loop — feature-equivalent to Model.run: runtime
        diagnostics, history accumulation/write, restart dumps, and
        check_state all work on the sharded state (gathers happen at the
        numpy boundaries of the IO layer)."""
        from cice5_tpu.driver.model import run_loop
        return run_loop(self, state, nsteps, **kw)

    def gather(self, tree):
        """Bring a sharded pytree fully to host numpy (for IO); multi-host
        arrays ride a process allgather (parallel/distributed.to_host)."""
        from cice5_tpu.parallel.distributed import to_host
        return jax.tree.map(to_host, tree)
