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


# ----------------------------------------------------------------------
# CICE 4.1 binary restart converter (ice_restart_driver.F90:517-875
# restartfile_v4): reads the v4 Fortran sequential unformatted dump into a
# State so v4 runs can continue under this framework.
# ----------------------------------------------------------------------

def _fseq_records(path: str):
    """Iterate Fortran sequential unformatted records (big-endian length
    markers, the reference's 'ruf8' + -convert big_endian convention)."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off + 4 <= len(data):
        n = int(np.frombuffer(data, ">i4", 1, off)[0])
        payload = data[off + 4:off + 4 + n]
        tail = int(np.frombuffer(data, ">i4", 1, off + 4 + n)[0])
        if tail != n:
            raise ValueError(f"corrupt record at offset {off}: {n} != {tail}")
        yield payload
        off += 8 + n


def read_restart_v4(path: str, cfg, tr, *, oceanmixed: bool | None = None,
                    dtype=None):
    """Read a CICE 4.1 restart dump into a State (restartfile_v4,
    ice_restart_driver.F90:517: header record (istep0, time, time_forc);
    per category aicen/vicen/vsnon/Tsfc + nilyr sice + nilyr qice + nslyr
    qsno; uvel/vvel; scale_factor + 4 SW components; strocnT; the 12
    stress components in tripole pair order (p1,p3)(p2,p4)(m1,m3)(m2,m4)
    (12_1,12_3)(12_2,12_4); iceumask; optional sst/frzmlt when
    oceanmixed_ice).

    v4 keeps Tsfc/sice/qice in the main file (v5 moved tracers to their
    own files) and carries no pond/age/level tracers — all other slots
    init to zeros_state defaults (the v4->v5 upgrade semantics).
    Returns (state, meta) with meta holding istep0/time/time_forc and the
    4 restart shortwave components (swvdr/swvdf/swidr/swidf, which this
    framework takes from forcing rather than state).
    """
    from cice5_tpu.state import zeros_state
    ny, nx = cfg.grid.ny, cfg.grid.nx
    nilyr, nslyr, ncat = cfg.nilyr, cfg.nslyr, cfg.ncat
    dt_ = dtype or cfg.xp_dtype
    recs = _fseq_records(path)

    head = next(recs)
    istep0 = int(np.frombuffer(head, ">i4", 1)[0])
    time, time_forc = np.frombuffer(head, ">f8", 2, 4)

    def grab(payload):
        a = np.frombuffer(payload, ">f8")
        if a.size != ny * nx:
            raise ValueError(f"record size {a.size} != {ny}x{nx}")
        return a.reshape(ny, nx)   # Fortran (nx,ny) i-fastest == C (ny,nx)

    def rd():
        return grab(next(recs))

    st = zeros_state(cfg, tr)
    up = {}
    aicen = np.zeros((ncat, ny, nx))
    vicen = np.zeros((ncat, ny, nx))
    vsnon = np.zeros((ncat, ny, nx))
    trcrn = np.array(st.trcrn, np.float64)
    for n in range(ncat):
        aicen[n] = rd()
        vicen[n] = rd()
        vsnon[n] = rd()
        trcrn[n, tr.nt_Tsfc] = rd()
        for k in range(nilyr):
            trcrn[n, tr.nt_sice + k] = rd()
        for k in range(nilyr):
            trcrn[n, tr.nt_qice + k] = rd()
        for k in range(nslyr):
            trcrn[n, tr.nt_qsno + k] = rd()
    up["aicen"], up["vicen"], up["vsnon"], up["trcrn"] = (aicen, vicen,
                                                          vsnon, trcrn)
    up["uvel"] = rd()
    up["vvel"] = rd()
    up["scale_factor"] = rd()
    sw = {k: rd() for k in ("swvdr", "swvdf", "swidr", "swidf")}
    up["strocnxT"] = rd()
    up["strocnyT"] = rd()
    # stress pairs (ice_restart_driver.F90:706-747): file order
    # p1,p3,p2,p4, m1,m3,m2,m4, s1,s3,s2,s4 -> corner slots 0..3=1..4
    for name in ("stressp", "stressm", "stress12"):
        s = np.zeros((4, ny, nx))
        s[0], s[2], s[1], s[3] = rd(), rd(), rd(), rd()
        up[name] = s
    up["iceumask"] = (rd() > 0.5).astype(np.float64)
    if oceanmixed is None:
        oceanmixed = cfg.forcing.oceanmixed_ice
    if oceanmixed:
        up["sst"] = rd()
        up["frzmlt"] = rd()
    st = dataclasses.replace(
        st, **{k: jnp.asarray(v, dt_) for k, v in up.items()})
    meta = dict(istep=istep0, time=float(time), time_forc=float(time_forc),
                version=4, **{k: v for k, v in sw.items()})
    return st, meta


def write_restart_v4(state: State, path: str, *, istep: int, time: float,
                     time_forc: float = 0.0, nilyr: int, nslyr: int, tr,
                     oceanmixed: bool = False,
                     sw: dict | None = None) -> str:
    """Write a CICE 4.1-format dump (the v4 `dumpfile` twin of
    read_restart_v4) — exercised by the converter round-trip test and
    usable to hand state back to a legacy v4 run."""
    from cice5_tpu.parallel.distributed import to_host
    sw = sw or {}

    def rec(f, arr):
        a = np.ascontiguousarray(np.asarray(arr, np.float64))
        payload = a.astype(">f8").tobytes()
        f.write(np.array([len(payload)], ">i4").tobytes())
        f.write(payload)
        f.write(np.array([len(payload)], ">i4").tobytes())

    s = {k: to_host(getattr(state, k)) for k in
         ("aicen", "vicen", "vsnon", "trcrn", "uvel", "vvel",
          "scale_factor", "strocnxT", "strocnyT", "stressp", "stressm",
          "stress12", "iceumask", "sst", "frzmlt")}
    ny, nx = s["uvel"].shape
    z = np.zeros((ny, nx))
    with open(path, "wb") as f:
        head = (np.array([istep], ">i4").tobytes()
                + np.array([time, time_forc], ">f8").tobytes())
        f.write(np.array([len(head)], ">i4").tobytes())
        f.write(head)
        f.write(np.array([len(head)], ">i4").tobytes())
        for n in range(s["aicen"].shape[0]):
            rec(f, s["aicen"][n])
            rec(f, s["vicen"][n])
            rec(f, s["vsnon"][n])
            rec(f, s["trcrn"][n, tr.nt_Tsfc])
            for k in range(nilyr):
                rec(f, s["trcrn"][n, tr.nt_sice + k])
            for k in range(nilyr):
                rec(f, s["trcrn"][n, tr.nt_qice + k])
            for k in range(nslyr):
                rec(f, s["trcrn"][n, tr.nt_qsno + k])
        rec(f, s["uvel"])
        rec(f, s["vvel"])
        rec(f, s["scale_factor"])
        for k in ("swvdr", "swvdf", "swidr", "swidf"):
            rec(f, sw.get(k, z))
        rec(f, s["strocnxT"])
        rec(f, s["strocnyT"])
        for name in ("stressp", "stressm", "stress12"):
            for c in (0, 2, 1, 3):
                rec(f, s[name][c])
        rec(f, s["iceumask"])
        if oceanmixed:
            rec(f, s["sst"])
            rec(f, s["frzmlt"])
    return path


FINISHED_NAME = "ice.finished"


def check_finished_file(directory: str) -> bool:
    """True if a completed-run sentinel exists (check_finished_file,
    drivers/cice/CICE_InitMod.F90:322: job scripts resubmit blindly, so a
    finished run leaves 'ice.finished' in the restart dir and later
    submissions abort instead of re-running)."""
    return os.path.exists(os.path.join(directory, FINISHED_NAME))


def writeout_finished_file(directory: str) -> str:
    """Drop the completed-run sentinel (writeout_finished_file,
    drivers/cice/CICE_FinalMod.F90:69)."""
    from cice5_tpu.parallel.distributed import is_primary
    p = os.path.join(directory, FINISHED_NAME)
    if is_primary():
        os.makedirs(directory, exist_ok=True)
        with open(p, "w") as f:
            f.write("done\n")
    return p
