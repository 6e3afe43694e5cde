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


# ---------------------------------------------------------------------
# Per-shard (parallel) HISTORY write — the io_pio/ice_history_write.F90
# analog (box-rearranger decompositions, ice_pio_initdecomp_{2d,3d,4d},
# io_pio/ice_pio.F90:25-63): every process writes only its addressable
# tiles of the accumulation buffers; an assembler merges tiles into one
# classic netCDF file identical to the gather-writer's output.
# ---------------------------------------------------------------------

def dump_history_sharded(stream, info, dirpath: str) -> str:
    """Write this process's tiles of every accumulation buffer of one
    HistoryStream to <dirpath>/hist.pNNN.npz (+ manifest on the primary).

    No cross-process communication at all — the DCN stays idle; cf. the
    gather-based write_netcdf which allgathers every buffer."""
    os.makedirs(dirpath, exist_ok=True)
    pid = jax.process_index()
    arrays = {}
    index = {}
    for dims, buf in stream.buf.items():
        arr = jnp.asarray(buf)
        for k, s in enumerate(arr.addressable_shards):
            arrays[f"{dims}::{k}"] = np.asarray(s.data)
            index[f"{dims}::{k}"] = [
                [sl.start or 0, sl.stop if sl.stop is not None else dim]
                for sl, dim in zip(s.index, arr.shape)]
        index[f"{dims}::shape"] = list(arr.shape)
        index[f"{dims}::dtype"] = str(arr.dtype)
    path = os.path.join(dirpath, f"hist.p{pid:03d}.npz")
    np.savez_compressed(path, __index__=json.dumps(index), **arrays)
    if pid == 0:
        meta = dict(
            version=1, nsamples=stream.nsamples, time=info.time,
            year=info.year, month=info.month, mday=info.mday,
            sec=info.sec, suffix=stream.suffix,
            num_processes=jax.process_count(),
            groups={dims: [[f.name, f.units, f.long_name, f.scale,
                            bool(f.instantaneous)] for f in fl]
                    for dims, fl in stream.groups.items()})
        with open(os.path.join(dirpath, "hist_manifest.json"), "w") as fh:
            json.dump(meta, fh)
    stream.reset()
    return path


def assemble_history(dirpath: str, grid, out_path: str,
                     case_name: str = "cice5_tpu") -> str:
    """Merge per-process history tiles into ONE classic netCDF-3 file with
    the same layout as io.history.write_netcdf (time/coords/2D/3Dc/4D
    variables). Runs anywhere the tile files are visible (offline
    post-processing, like the reference's multi-file PIO modes)."""
    import glob

    from scipy.io import netcdf_file
    with open(os.path.join(dirpath, "hist_manifest.json")) as fh:
        meta = json.load(fh)
    bufs: dict = {}
    for path in sorted(glob.glob(os.path.join(dirpath, "hist.p*.npz"))):
        with np.load(path, allow_pickle=False) as z:
            index = json.loads(str(z["__index__"]))
            for key in z.files:
                if key == "__index__":
                    continue
                dims = key.split("::")[0]
                if dims not in bufs:
                    bufs[dims] = np.zeros(
                        tuple(index[f"{dims}::shape"]),
                        index[f"{dims}::dtype"])
                sl = tuple(slice(a, b) for a, b in index[key])
                bufs[dims][sl] = z[key]

    ns = max(meta["nsamples"], 1)
    ny, nx = np.asarray(grid.hm).shape
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with netcdf_file(out_path, "w", version=2) as f:
        f.createDimension("time", None)
        f.createDimension("nj", ny)
        f.createDimension("ni", nx)
        if any(d in bufs for d in ("3Dc", "4Di", "4Ds")):
            ncat = next(bufs[d].shape[-3] for d in ("3Dc", "4Di", "4Ds")
                        if d in bufs)
            f.createDimension("nc", ncat)
        if "4Di" in bufs:
            f.createDimension("nkice", bufs["4Di"].shape[1])
        if "4Ds" in bufs:
            f.createDimension("nksnow", bufs["4Ds"].shape[1])
        if "3Db" in bufs:
            f.createDimension("nkbio", bufs["3Db"].shape[1])
        tv = f.createVariable("time", "d", ("time",))
        tv.units = "days since 0001-01-01 00:00:00"
        tv[0] = meta["time"] / 86400.0
        from cice5_tpu.io.history import write_coord_grid_vars
        write_coord_grid_vars(f, grid)
        dimmap = {"2D": ("time", "nj", "ni"),
                  "3Dc": ("time", "nc", "nj", "ni"),
                  "3Db": ("time", "nkbio", "nj", "ni"),
                  "4Di": ("time", "nkice", "nc", "nj", "ni"),
                  "4Ds": ("time", "nksnow", "nc", "nj", "ni")}
        for dims, fl in meta["groups"].items():
            if dims not in bufs:
                continue
            for k, (name, units, long_name, scale, inst) in enumerate(fl):
                v = f.createVariable(name, "f", dimmap[dims])
                v.units = units
                v.long_name = long_name
                out = bufs[dims][k] if inst else bufs[dims][k] / ns
                v[0] = (out * scale).astype(np.float32)
        f.history = (f"{case_name} history, nsamples={meta['nsamples']}, "
                     f"assembled from {meta['num_processes']} process "
                     f"tile file(s)")
    return out_path
