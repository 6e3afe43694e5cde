"""Sharded run: the production multi-chip shape.

The same jitted step runs under shard_map over a 2-D mesh of every
visible device (the reference's MPI block decomposition, SURVEY §2.10).
Halo exchanges become ICI ppermutes inside the step; history/restart/
diagnostics gather at the numpy boundary. On one device this degenerates
to the single-chip program; on a CPU host with
XLA_FLAGS=--xla_force_host_platform_device_count=8 it exercises a real
8-way decomposition.
"""
import jax
import numpy as np

from cice5_tpu.config import rect_config
from cice5_tpu.driver.sharded import ShardedModel

cfg = rect_config(ny=128, nx=128, dtype="float32")
m = ShardedModel(cfg)
print(f"mesh: {dict(zip(m.mesh.axis_names, m.mesh.devices.shape))} "
      f"over {len(jax.devices())} devices")

state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
state = m.run(state, nsteps=6, diag_every=3)
host = m.gather(state)
print("aice max:", float(np.asarray(host.aicen).sum(0).max()))
