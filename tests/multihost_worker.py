"""Worker process for the multi-host decomposition-invariance test
(launched by tests/test_multihost.py; NOT a pytest module).

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <outdir>
"""
import sys

coordinator, nprocs, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4])

import jax

jax.config.update("jax_enable_x64", True)

from cice5_tpu.parallel.distributed import (initialize_distributed,
                                            is_primary, to_host)

initialize_distributed(coordinator_address=coordinator,
                       num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

import dataclasses

import numpy as np

from cice5_tpu.config import rect_config
from cice5_tpu.driver.sharded import ShardedModel

cfg = rect_config(ny=16, nx=32, dtype="float64", accum_dtype="float64")
cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=12))

sm = ShardedModel(cfg, mesh_shape=(2, 4))   # mesh spans both processes
st = sm.init_state(ice_mask=np.asarray(sm.grid.tmask))
f = sm.forcing_at(0)
st, diag = sm.step(st, f)
st, diag = sm.step(st, sm.forcing_at(1))

out = {name: to_host(getattr(st, name))
       for name in ("aicen", "vicen", "uvel", "vvel")}
if is_primary():
    np.savez(f"{outdir}/multihost_result.npz", **out)
print(f"proc {pid}: ok", flush=True)
