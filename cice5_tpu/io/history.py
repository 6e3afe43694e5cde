"""History output: field registry, time-averaged accumulation, netCDF writer.

Equivalent of /root/reference/source/ice_history_shared.F90 (registry
`define_hist_field`/`accum_hist_field` :559/:667, avail_hist_fields type
:77-90, icefields_nml f_* flags) + ice_history.F90 (init_hist :55, accum_hist
:1149, up to 5 output streams with independent frequencies) + the netCDF
backend io_netcdf/ice_history_write.F90.

Redesign: the registry is a plain dict of HistField descriptors; accumulation
buffers live in a jnp stack (one jitted add per step — the buffers can stay
on device and shard with the fields); the writer gathers to host and emits
classic netCDF-3 via scipy (no external netCDF library needed) with CF-style
time/units/cell coordinates.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct

FREQ_CODES = ("1", "h", "d", "m", "y")   # every step, hourly, daily, ...


@dataclass(frozen=True)
class HistField:
    name: str
    units: str
    long_name: str
    cell_measure: str = "area: tarea"
    scale: float = 1.0          # unit conversion on output (cmday etc.)
    instantaneous: bool = False


# the standard field catalog (subset of the reference's 163 f_* flags;
# ice_history_shared.F90:186-358) — extended as physics lands
STANDARD_FIELDS = [
    HistField("aice", "1", "ice area  (aggregate)"),
    HistField("hi", "m", "grid cell mean ice thickness"),
    HistField("hs", "m", "grid cell mean snow thickness"),
    HistField("Tsfc", "C", "snow/ice surface temperature"),
    HistField("uvel", "m/s", "ice velocity (x)"),
    HistField("vvel", "m/s", "ice velocity (y)"),
    HistField("fswabs", "W/m^2", "snow/ice/ocn absorbed solar flux"),
    HistField("flwout", "W/m^2", "upward longwave flux"),
    HistField("fsens", "W/m^2", "sensible heat flux"),
    HistField("flat", "W/m^2", "latent heat flux"),
    HistField("fhocn", "W/m^2", "heat flux ice to ocean"),
    HistField("fresh", "kg/m^2/s", "freshwater flux ice to ocean"),
    HistField("fsalt", "kg/m^2/s", "salt flux ice to ocean"),
    HistField("meltt", "cm/day", "top ice melt", scale=ct.mps_to_cmpdy / 86400.0 * 86400.0),
    HistField("meltb", "cm/day", "basal ice melt"),
    HistField("meltl", "cm/day", "lateral ice melt"),
    HistField("congel", "cm/day", "congelation ice growth"),
    HistField("frazil", "cm/day", "frazil ice growth"),
    HistField("snoice", "cm/day", "snow-ice formation"),
    HistField("divu", "%/day", "strain rate (divergence)"),
    HistField("shear", "1/day", "strain rate (shear)"),
    HistField("strairx", "N/m^2", "atm/ice stress (x)"),
    HistField("strocnx", "N/m^2", "ocean/ice stress (x)"),
    HistField("dardg1dt", "1/s", "ice area ridging rate"),
    HistField("dvirdgdt", "m/s", "ice volume ridging rate"),
    HistField("frzmlt", "W/m^2", "freeze/melt potential",
              instantaneous=True),
    HistField("sst", "C", "sea surface temperature", instantaneous=True),
    HistField("albsni", "1", "snow/ice broadband albedo"),
]

# mechanical-redistribution field set (ice_history_mechred.F90)
MECHRED_FIELDS = [
    HistField("ardg", "1", "ridged ice area fraction"),
    HistField("vrdg", "m", "ridged ice volume per area"),
    HistField("alvl", "1", "level ice area fraction"),
    HistField("vlvl", "m", "level ice volume per area"),
    HistField("opening", "%/day", "lead opening rate"),
]

# melt-pond field set (ice_history_pond.F90)
POND_FIELDS = [
    HistField("apond", "1", "melt pond fraction of grid cell"),
    HistField("hpond", "m", "mean melt pond depth"),
    HistField("ipond", "m", "mean pond ice lid thickness"),
]

# form-drag field set (ice_history_drag.F90)
DRAG_FIELDS = [
    HistField("Cdn_atm", "1", "atmospheric neutral drag coefficient",
              instantaneous=True),
    HistField("Cdn_ocn", "1", "oceanic neutral drag coefficient",
              instantaneous=True),
    HistField("hfreebd", "m", "mean freeboard", instantaneous=True),
    HistField("hkeel", "m", "mean keel depth", instantaneous=True),
]

# BGC field set (ice_history_bgc.F90)
BGC_FIELDS = [
    HistField("PP_net", "mg C/m^2/s", "net primary production"),
    HistField("grow_net", "1/s", "net specific algal growth"),
    HistField("fbri", "1", "brine height ratio"),
]


MAX_NSTRM = 5     # ice_domain_size.F90:50


class HistoryStreams:
    """Up to MAX_NSTRM independent output streams with their own field sets
    and frequencies (ice_history.F90 multi-stream support): accum() feeds
    every stream; ready/write are per stream."""

    def __init__(self, streams):
        if len(streams) > MAX_NSTRM:
            raise ValueError(f"at most {MAX_NSTRM} history streams")
        self.streams = list(streams)

    def accum(self, values: dict, time: float):
        for st in self.streams:
            st.accum(values, time)

    def write_ready(self, grid, info, out_dir: str,
                    case_name: str = "cice5_tpu", use_async: bool = False):
        """Write every stream whose output window closed; returns paths."""
        paths = []
        for st in self.streams:
            if st.ready(info):
                fn = os.path.join(
                    out_dir,
                    f"iceh_{st.suffix}.{info.year:04d}-{info.month:02d}-"
                    f"{info.mday:02d}-{info.sec:05d}.nc")
                write_netcdf(st, grid, info, fn, case_name=case_name)
                paths.append(fn)
        return paths


class HistoryStream:
    """One output stream: registered fields + accumulation + writer
    (the reference supports max_nstrm=5 of these)."""

    def __init__(self, fields: list[HistField], freq: str = "d",
                 freq_n: int = 1, suffix: str = "h"):
        assert freq in FREQ_CODES
        self.fields = list(fields)
        self.index = {f.name: k for k, f in enumerate(self.fields)}
        self.freq = freq
        self.freq_n = freq_n
        self.suffix = suffix
        self.buf = None
        self.nsamples = 0
        self.time0 = None

    def accum(self, values: dict, time: float):
        """Accumulate one step's fields (accum_hist, ice_history.F90:1149).
        values: name -> (ny, nx) array; missing fields accumulate 0."""
        stack = jnp.stack([
            jnp.asarray(values[f.name]) if f.name in values
            else jnp.zeros_like(next(iter(values.values())))
            for f in self.fields])
        if self.buf is None:
            self.buf = stack
            self.time0 = time
        else:
            inst = jnp.asarray([f.instantaneous for f in self.fields])
            self.buf = jnp.where(inst[:, None, None], stack, self.buf + stack)
        self.nsamples += 1

    def ready(self, info) -> bool:
        """Is this an output step? (construct_filename/write logic)."""
        if self.nsamples == 0:
            return False
        if self.freq == "1":
            return self.nsamples >= self.freq_n
        if self.freq == "h":
            return info.sec % (3600 * self.freq_n) == 0
        if self.freq == "d":
            return info.sec == 0 and (info.elapsed_days % self.freq_n == 0)
        if self.freq == "m":
            return info.mday == 1 and info.sec == 0
        if self.freq == "y":
            return info.month == 1 and info.mday == 1 and info.sec == 0
        return False

    def averages(self):
        inst = np.asarray([f.instantaneous for f in self.fields])
        buf = np.asarray(self.buf)
        avg = buf / max(self.nsamples, 1)
        return np.where(inst[:, None, None], buf, avg)

    def reset(self):
        self.buf = None
        self.nsamples = 0


def write_netcdf(stream: HistoryStream, grid, info, path: str,
                 case_name: str = "cice5_tpu"):
    """Gather-and-write one history file as classic netCDF-3 via scipy
    (the io_netcdf/ice_history_write.F90 equivalent)."""
    from scipy.io import netcdf_file
    data = stream.averages()
    ny, nx = data.shape[-2:]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with netcdf_file(path, "w", version=2) as f:
        f.createDimension("time", None)
        f.createDimension("nj", ny)
        f.createDimension("ni", nx)
        tv = f.createVariable("time", "d", ("time",))
        tv.units = "days since 0001-01-01 00:00:00"
        tv[0] = info.time / 86400.0
        for name, arr in (("TLAT", grid.TLAT), ("TLON", grid.TLON),
                          ("tarea", grid.tarea), ("tmask", grid.hm)):
            v = f.createVariable(name, "f", ("nj", "ni"))
            v[:] = np.asarray(arr, np.float32)
        for k, hf in enumerate(stream.fields):
            v = f.createVariable(hf.name, "f", ("time", "nj", "ni"))
            v.units = hf.units
            v.long_name = hf.long_name
            v[0] = (data[k] * hf.scale).astype(np.float32)
        f.history = f"{case_name} history, nsamples={stream.nsamples}"
    stream.reset()
    return path


def diag_to_values(diag, state, grid, tr=None) -> dict:
    """Map a StepDiag + state into the standard history field names
    (+ mechred/pond/bgc fields when the tracer registry is given)."""
    import jax.numpy as jnp
    aice = diag.aice
    safe = jnp.maximum(aice, ct.puny)
    secday = 86400.0
    m_to_cmday = 100.0 * secday   # m/step already per-step; caller scales
    return {
        "aice": aice, "hi": diag.vice, "hs": diag.vsno, "Tsfc": diag.Tsfc,
        "uvel": state.uvel, "vvel": state.vvel,
        "fswabs": diag.fswabs, "flwout": diag.flwout, "fsens": diag.fsens,
        "flat": diag.flat, "fhocn": diag.fhocn, "fresh": diag.fresh,
        "fsalt": diag.fsalt,
        "meltt": diag.meltt * m_to_cmday, "meltb": diag.meltb * m_to_cmday,
        "meltl": diag.meltl * m_to_cmday, "congel": diag.congel * m_to_cmday,
        "frazil": diag.frazil * m_to_cmday,
        "snoice": diag.snoice * m_to_cmday,
        "divu": diag.divu * secday * 100.0, "shear": diag.shear * secday,
        "strairx": diag.strairxT, "strocnx": state.strocnxT,
        "dardg1dt": diag.dardg1dt, "dvirdgdt": diag.dvirdgdt,
        "frzmlt": diag.frzmlt, "sst": state.sst,
        "albsni": (ct.awtvdr * diag.alvdr + ct.awtvdf * diag.alvdf
                   + ct.awtidr * diag.alidr + ct.awtidf * diag.alidf),
        "PP_net": diag.PP_net, "grow_net": diag.grow_net,
    } | _tracer_values(state, tr)


def _tracer_values(state, tr) -> dict:
    if tr is None:
        return {}
    import jax.numpy as jnp
    out = {}
    aicen, vicen = state.aicen, state.vicen
    if tr.nt_alvl >= 0:
        out["alvl"] = jnp.sum(state.trcrn[:, tr.nt_alvl] * aicen, 0)
        out["vlvl"] = jnp.sum(state.trcrn[:, tr.nt_vlvl] * vicen, 0)
        out["ardg"] = jnp.sum((1.0 - state.trcrn[:, tr.nt_alvl]) * aicen, 0)
        out["vrdg"] = jnp.sum((1.0 - state.trcrn[:, tr.nt_vlvl]) * vicen, 0)
    if tr.nt_apnd >= 0:
        ap = state.trcrn[:, tr.nt_apnd]
        out["apond"] = jnp.sum(ap * aicen, 0)
        out["hpond"] = jnp.sum(ap * state.trcrn[:, tr.nt_hpnd] * aicen, 0)
        if tr.nt_ipnd >= 0:
            out["ipond"] = jnp.sum(
                ap * state.trcrn[:, tr.nt_ipnd] * aicen, 0)
    if tr.nt_fbri >= 0:
        out["fbri"] = jnp.sum(state.trcrn[:, tr.nt_fbri] * vicen, 0)
    return out
