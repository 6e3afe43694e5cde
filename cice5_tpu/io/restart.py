"""Restart (checkpoint/resume) with exact round-trip.

Equivalent of /root/reference/source/ice_restart_driver.F90 (dumpfile :45,
restartfile :191) + the pointer-file convention
(input_templates/gx3/ice_in 'ice.restart_file'). The reference writes every
prognostic field needed for bit-exact continuation (state, velocities, the 12
stress components, iceumask, scale_factor, strocnT...); here the State pytree
IS that field set, so a restart is one compressed npz of the pytree plus
step/time metadata. Bitwise round-trip is guaranteed by writing raw arrays.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from cice5_tpu.state import State

POINTER_NAME = "ice.restart_file"


def dump(state: State, path: str, *, istep: int, time: float,
         extra: dict | None = None, pointer_dir: str | None = None) -> str:
    """Write a restart file and update the pointer file."""
    from cice5_tpu.parallel.distributed import to_host
    fields = {f.name: to_host(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    meta = dict(istep=istep, time=time, version=1, **(extra or {}))
    from cice5_tpu.parallel.distributed import is_primary
    if not is_primary():       # gathers above are collective; one writer
        return path
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **fields)
    pdir = pointer_dir or os.path.dirname(os.path.abspath(path))
    with open(os.path.join(pdir, POINTER_NAME), "w") as f:
        f.write(os.path.abspath(path) + ("" if path.endswith(".npz")
                                         else ".npz") + "\n")
    return path


def restore(path: str | None = None, *, pointer_dir: str | None = None,
            dtype=None) -> tuple[State, dict]:
    """Read a restart (directly or via the pointer file).

    Returns (state, meta)."""
    if path is None:
        with open(os.path.join(pointer_dir, POINTER_NAME)) as f:
            path = f.read().strip()
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        names = [f.name for f in dataclasses.fields(State)]
        arrays = {}
        for n in names:
            a = z[n]
            arrays[n] = jnp.asarray(a if dtype is None else a.astype(dtype))
    return State(**arrays), meta
