"""Generalized 2-D/3-D field read/write — the ice_read_write.F90 surface.

Equivalents of /root/reference/source/ice_read_write.F90:
``ice_read_xyt`` (:150) / ``ice_read_xyzt`` (:294) master-task record
reads, ``ice_read_global`` (:445), ``ice_read_ext`` (ghost-inclusive,
:554), ``ice_write_xyt`` (:690), and their ``_nc`` variants.

Redesign: there is no master-task scatter loop — files are read on host
into numpy and placed onto the device mesh in one ``jax.device_put`` with
the caller's NamedSharding (``scatter_xyt``); writes gather through
``multihost_utils`` / addressable shards (``gather_xyt``) and the primary
process writes. Binary records are big-endian Fortran-ordered POP-style
direct-access records (the reference's ``ice_read`` unformatted layout);
netCDF goes through scipy (classic format, no external library).
"""
from __future__ import annotations

import numpy as np

_DTYPES = {"rda8": ">f8", "rda4": ">f4", "ida4": ">i4"}


def read_xyt(path: str, nx: int, ny: int, nrec: int = 1, *,
             atype: str = "rda8", count: int = 1):
    """Read ``count`` consecutive (ny, nx) records starting at 1-based
    record ``nrec`` from a direct-access binary file
    (ice_read_write.F90:150 ice_read_xyt semantics).

    Returns (ny, nx) for count=1 else (count, ny, nx), native f64/i32."""
    dt = np.dtype(_DTYPES[atype])
    n = nx * ny
    raw = np.fromfile(path, dtype=dt, count=n * (nrec - 1 + count),
                      offset=0)
    if raw.size < n * (nrec - 1 + count):
        raise EOFError(f"{path}: wanted {count} record(s) at {nrec}, "
                       f"file holds {raw.size // n}")
    recs = raw[n * (nrec - 1):].reshape(count, ny, nx)
    recs = recs.astype(np.int32 if atype == "ida4" else np.float64)
    return recs[0] if count == 1 else recs


def read_xyzt(path: str, nx: int, ny: int, nz: int, nrec: int = 1, *,
              atype: str = "rda8"):
    """Read one (nz, ny, nx) record block (ice_read_xyzt, :294)."""
    flat = read_xyt(path, nx, ny, nrec=1 + (nrec - 1) * nz, atype=atype,
                    count=nz)
    return flat


def read_global(path: str, nx: int, ny: int, nrec: int = 1, *,
                atype: str = "rda8"):
    """Alias for the global-array read (ice_read_global, :445): the dense
    design has no block scatter, so global == xyt."""
    return read_xyt(path, nx, ny, nrec, atype=atype)


def read_ext(path: str, nx: int, ny: int, nrec: int = 1, *,
             atype: str = "rda8"):
    """Ghost-inclusive read (ice_read_ext, :554): the file stores
    (ny+2, nx+2) including a 1-cell boundary ring."""
    return read_xyt(path, nx + 2, ny + 2, nrec, atype=atype)


def write_xyt(path: str, fields, *, atype: str = "rda8",
              append: bool = False) -> str:
    """Write (ny, nx) record(s) as big-endian direct-access binary
    (ice_write_xyt, :690). ``fields``: one array or a sequence; only the
    primary process writes (multi-host safe)."""
    from cice5_tpu.parallel.distributed import is_primary
    arrs = fields if isinstance(fields, (list, tuple)) else [fields]
    host = [gather_xyt(a) for a in arrs]
    if not is_primary():
        return path
    dt = np.dtype(_DTYPES[atype])
    with open(path, "ab" if append else "wb") as fh:
        for a in host:
            np.ascontiguousarray(a, dtype=dt).tofile(fh)
    return path


def read_xyt_nc(path: str, varname: str, nrec: int | None = None):
    """netCDF variant (ice_read_nc_xyt): read one record (or all) of a
    variable; scipy classic netCDF-3."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as f:
        v = f.variables[varname]
        data = np.asarray(v[:]).copy()
    if nrec is not None and data.ndim >= 3:
        return data[nrec - 1]
    return data


def write_xyt_nc(path: str, fields: dict, *, dims=("nj", "ni"),
                 attrs: dict | None = None) -> str:
    """netCDF variant of write_xyt: write named (ny, nx) fields into one
    classic netCDF-3 file (primary process only)."""
    from scipy.io import netcdf_file
    from cice5_tpu.parallel.distributed import is_primary
    host = {k: gather_xyt(v) for k, v in fields.items()}
    if not is_primary():
        return path
    with netcdf_file(path, "w", version=2) as f:
        first = next(iter(host.values()))
        ny, nx = first.shape[-2:]
        f.createDimension(dims[0], ny)
        f.createDimension(dims[1], nx)
        for name, arr in host.items():
            v = f.createVariable(name, "d", dims)
            v[:] = np.asarray(arr, np.float64)
            for ak, av in (attrs or {}).get(name, {}).items():
                setattr(v, ak, av)
    return path


def scatter_xyt(arr, sharding=None):
    """Host (global) array -> device array under ``sharding`` — the
    replacement for the master-task scatter_global loop
    (ice_read_write.F90:188-236): ONE device_put, XLA moves the tiles."""
    import jax
    a = np.asarray(arr)
    if sharding is None:
        return jax.device_put(a)
    return jax.device_put(a, sharding)


def gather_xyt(arr) -> np.ndarray:
    """Device (possibly sharded, possibly multi-host) array -> host
    global numpy — the gather_global analog (:690-758)."""
    from cice5_tpu.parallel.distributed import to_host
    return to_host(arr)
