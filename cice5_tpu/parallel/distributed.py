"""Multi-host execution: process initialization + host-side gathers.

The reference scales by MPI ranks (mpi/ice_communicate.F90:52
init_communicate, 18,000 tasks in BASELINE.md). The TPU-native equivalent
is one JAX process per host, a global 2-D device Mesh spanning all
processes (ICI within a slice, DCN across), and the SAME shard_map step —
nothing in the model code changes between single-host and multi-host; only
the IO boundary needs process-aware gathers.

Launch pattern (SURVEY §4(f)):

    from cice5_tpu.parallel.distributed import initialize_distributed
    initialize_distributed()          # env-driven on TPU pods; explicit
                                      # coordinator for CPU/GPU clusters
    sm = ShardedModel(cfg)            # mesh over jax.devices() = global
    state = sm.init_state()
    sm.run(state, nsteps, ...)        # IO gathers to process 0

Tested with 2 localhost CPU processes x 4 virtual devices in
tests/test_multihost.py.
"""
from __future__ import annotations

import numpy as np

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """jax.distributed.initialize with an idempotency guard.

    On TPU pods all arguments come from the environment; on CPU/GPU
    clusters pass coordinator_address ("host:port"), num_processes, and
    process_id explicitly."""
    # guard WITHOUT touching the backend (jax.process_count would
    # initialize XLA before distributed setup)
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def is_primary() -> bool:
    """True on the process that should write files (master_task analog)."""
    return jax.process_index() == 0


def to_host(x) -> np.ndarray:
    """Gather any (possibly multi-host sharded) array to host numpy.

    Single-host / fully-addressable arrays take the plain np.asarray path;
    multi-host global arrays ride an allgather over DCN
    (the gather_global analog, mpi/ice_gather_scatter.F90:71)."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
