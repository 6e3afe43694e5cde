"""Per-shard (parallel) restart IO — the PIO box-rearranger analog.

The reference's parallel output paths (io_pio/ box rearranger,
io_netcdf/ice_history_write.F90:1508-1816 per-block parallel puts) avoid
funnelling the global state through one writer task. Here every JAX
process writes exactly its addressable shards to its own file —
no cross-process gather at all (the DCN stays idle during checkpoints) —
and restore reassembles the global arrays from all process files.

Single-process sharded runs degenerate to one file holding all device
shards; the format is identical either way.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cice5_tpu.state import State

_MANIFEST = "manifest.json"


def dump_sharded(state: State, dirpath: str, *, istep: int, time: float,
                 extra: dict | None = None) -> str:
    """Write this process's shards of every State field to
    <dirpath>/shards.pNNN.npz (+ a manifest on the primary)."""
    os.makedirs(dirpath, exist_ok=True)
    pid = jax.process_index()
    arrays = {}
    index = {}
    for f in dataclasses.fields(state):
        arr = getattr(state, f.name)
        arr = jnp.asarray(arr)
        shards = [s for s in arr.addressable_shards]
        for k, s in enumerate(shards):
            arrays[f"{f.name}::{k}"] = np.asarray(s.data)
            index[f"{f.name}::{k}"] = [
                [sl.start or 0,
                 sl.stop if sl.stop is not None else dim]
                for sl, dim in zip(s.index, arr.shape)]
        index[f"{f.name}::shape"] = list(arr.shape)
        index[f"{f.name}::dtype"] = str(arr.dtype)
    path = os.path.join(dirpath, f"shards.p{pid:03d}.npz")
    np.savez_compressed(path, __index__=json.dumps(index), **arrays)
    if pid == 0:
        meta = dict(istep=istep, time=time, version=1,
                    num_processes=jax.process_count(),
                    fields=[f.name for f in dataclasses.fields(state)],
                    **(extra or {}))
        with open(os.path.join(dirpath, _MANIFEST), "w") as fh:
            json.dump(meta, fh)
    return path


def restore_sharded(dirpath: str) -> tuple[State, dict]:
    """Reassemble a State from all per-process shard files."""
    with open(os.path.join(dirpath, _MANIFEST)) as fh:
        meta = json.load(fh)
    fields: dict = {}
    shapes: dict = {}
    dtypes: dict = {}
    import glob
    for path in sorted(glob.glob(os.path.join(dirpath, "shards.p*.npz"))):
        with np.load(path, allow_pickle=False) as z:
            index = json.loads(str(z["__index__"]))
            for key in z.files:
                if key == "__index__":
                    continue
                name = key.split("::")[0]
                if name not in shapes:
                    shapes[name] = tuple(index[f"{name}::shape"])
                    dtypes[name] = index[f"{name}::dtype"]
                    fields[name] = np.zeros(shapes[name], dtypes[name])
                sl = tuple(slice(a, b) for a, b in index[key])
                fields[name][sl] = z[key]
    arrays = {n: jnp.asarray(v) for n, v in fields.items()}
    return State(**arrays), meta
