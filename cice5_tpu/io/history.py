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
    # "2D" (ny,nx) | "3Dc" (ncat,ny,nx) | "4Di" (nilyr,ncat,ny,nx) |
    # "4Ds" (nslyr,ncat,ny,nx) — the a2D/a3Dc/a4Di/a4Ds accumulation
    # classes of ice_history_shared.F90:138-139,741,805
    dims: str = "2D"


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
    HistField("evap", "kg/m^2/s", "evaporative water flux"),
    HistField("fswthru", "W/m^2", "SW through ice to ocean"),
    HistField("strairy", "N/m^2", "atm/ice stress (y)"),
    HistField("strocny", "N/m^2", "ocean/ice stress (y)"),
    HistField("alvdr", "1", "visible direct albedo"),
    HistField("alvdf", "1", "visible diffuse albedo"),
    HistField("alidr", "1", "near-IR direct albedo"),
    HistField("alidf", "1", "near-IR diffuse albedo"),
    HistField("fpond", "m/step", "meltwater flux into ponds"),
    HistField("Tair", "C", "air temperature", instantaneous=True),
    HistField("uatm", "m/s", "atm velocity (x)", instantaneous=True),
    HistField("vatm", "m/s", "atm velocity (y)", instantaneous=True),
    HistField("fswdn", "W/m^2", "downward solar flux", instantaneous=True),
    HistField("flwdn", "W/m^2", "downward longwave flux",
              instantaneous=True),
    HistField("snowfall", "kg/m^2/s", "snowfall rate", instantaneous=True),
    HistField("rainfall", "kg/m^2/s", "rainfall rate", instantaneous=True),
    HistField("sss", "ppt", "sea surface salinity", instantaneous=True),
    HistField("uocn", "m/s", "ocean current (x)", instantaneous=True),
    HistField("vocn", "m/s", "ocean current (y)", instantaneous=True),
    HistField("melts", "cm/day", "top snow melt"),
    HistField("fsurf_ai", "W/m^2", "net surface heat flux"),
    HistField("fcondtop_ai", "W/m^2", "top surface conductive heat flux"),
    HistField("Tref", "C", "2m reference air temperature"),
    HistField("Qref", "g/kg", "2m reference specific humidity"),
    HistField("Uref", "m/s", "10m reference wind speed"),
    HistField("strength", "N/m", "compressive ice strength",
              instantaneous=True),
    HistField("sig1", "1", "normalized principal stress component 1",
              instantaneous=True),
    HistField("sig2", "1", "normalized principal stress component 2",
              instantaneous=True),
    HistField("trsig", "N/m", "internal stress tensor trace",
              instantaneous=True),
    HistField("ice_present", "1", "fraction of time-avg interval with ice"),
]

# per-category fields (a3Dc class; f_aicen/f_vicen/... flags,
# ice_history_shared.F90:248-260 + pond/mechred category fields)
CAT_FIELDS = [
    HistField("aicen", "1", "ice area, categories", dims="3Dc"),
    HistField("vicen", "m", "ice volume, categories", dims="3Dc"),
    HistField("vsnon", "m", "snow volume, categories", dims="3Dc"),
    HistField("Tsfcn", "C", "surface temperature, categories", dims="3Dc"),
    HistField("fsurfn_ai", "W/m^2", "net surface heat flux, categories",
              dims="3Dc"),
    HistField("flatn_ai", "W/m^2", "latent heat flux, categories",
              dims="3Dc"),
    HistField("fcondtopn_ai", "W/m^2",
              "top conductive heat flux, categories", dims="3Dc"),
    HistField("apondn", "1", "melt pond fraction, categories", dims="3Dc"),
    HistField("hpondn", "m", "melt pond depth, categories", dims="3Dc"),
    HistField("ipondn", "m", "pond lid thickness, categories", dims="3Dc"),
    HistField("ardgn", "1", "ridged ice area fraction, categories",
              dims="3Dc"),
    HistField("vrdgn", "m", "ridged ice volume, categories", dims="3Dc"),
]

# vertical profile fields (a4Di/a4Ds classes; f_Tinz/f_Sinz/f_Tsnz,
# ice_history_shared.F90:350-358, accum_hist_field_4D :805)
VERT_FIELDS = [
    HistField("Tinz", "C", "ice internal temperatures", dims="4Di"),
    HistField("Sinz", "ppt", "ice internal bulk salinity", dims="4Di"),
    HistField("qinz", "J/m^3", "ice layer enthalpy", dims="4Di"),
    HistField("Tsnz", "C", "snow internal temperatures", dims="4Ds"),
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


def available_fields(cfg=None, tr=None, include_3d=True) -> list:
    """The full field catalog available for a given configuration (the
    f_* availability filtering of init_hist, ice_history.F90:55-460)."""
    fields = list(STANDARD_FIELDS)
    has_pond = tr is not None and tr.nt_apnd >= 0
    has_lvl = tr is not None and tr.nt_alvl >= 0
    has_lid = tr is not None and tr.nt_ipnd >= 0
    if has_lvl:
        fields += MECHRED_FIELDS
    if has_pond:
        fields += POND_FIELDS
    if tr is not None and tr.nt_fbri >= 0:
        fields += BGC_FIELDS
    if include_3d and tr is not None:
        for f in CAT_FIELDS:
            if f.name in ("apondn", "hpondn") and not has_pond:
                continue
            if f.name == "ipondn" and not has_lid:
                continue
            if f.name in ("ardgn", "vrdgn") and not has_lvl:
                continue
            fields.append(f)
        fields += [f for f in VERT_FIELDS
                   if cfg is None or f.dims != "4Ds" or cfg.nslyr >= 1]
    return fields


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
    (the reference supports max_nstrm=5 of these).

    Fields of different accumulation classes (2D / 3Dc / 4Di / 4Ds,
    ice_history_shared.F90 a2D/a3Dc/a4Di/a4Ds buffers) are grouped into
    separate accumulation stacks."""

    def __init__(self, fields: list[HistField], freq: str = "d",
                 freq_n: int = 1, suffix: str = "h"):
        assert freq in FREQ_CODES
        self.fields = list(fields)
        self.index = {f.name: k for k, f in enumerate(self.fields)}
        self.groups = {}                      # dims -> [HistField...]
        for f in self.fields:
            self.groups.setdefault(f.dims, []).append(f)
        self.freq = freq
        self.freq_n = freq_n
        self.suffix = suffix
        self.buf = {}                         # dims -> stacked buffer
        self.nsamples = 0
        self.time0 = None

    def accum(self, values: dict, time: float):
        """Accumulate one step's fields (accum_hist, ice_history.F90:1149).
        values: name -> array of the field's dims class; missing 2D fields
        accumulate 0; missing 3D/4D fields are an error (register only
        fields the model produces)."""
        for dims, fl in self.groups.items():
            present = [f.name for f in fl if f.name in values]
            missing = [f.name for f in fl if f.name not in values]
            if missing:
                if dims != "2D" or not present:
                    raise KeyError(f"history {dims} fields not in values: "
                                   f"{missing}")
                tmpl = jnp.zeros_like(jnp.asarray(values[present[0]]))
            else:
                tmpl = None
            stack = jnp.stack([
                jnp.asarray(values[f.name]) if f.name in values else tmpl
                for f in fl])
            if dims not in self.buf or self.buf[dims] is None:
                self.buf[dims] = stack
            else:
                inst = np.asarray([f.instantaneous for f in fl])
                ishape = (len(fl),) + (1,) * (stack.ndim - 1)
                self.buf[dims] = jnp.where(
                    jnp.asarray(inst).reshape(ishape), stack,
                    self.buf[dims] + stack)
        if self.nsamples == 0:
            self.time0 = time
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

    def averages(self, dims="2D"):
        fl = self.groups.get(dims, [])
        if not fl:
            return None
        from cice5_tpu.parallel.distributed import to_host
        inst = np.asarray([f.instantaneous for f in fl])
        buf = to_host(self.buf[dims])
        avg = buf / max(self.nsamples, 1)
        ishape = (len(fl),) + (1,) * (buf.ndim - 1)
        return np.where(inst.reshape(ishape), buf, avg)

    def reset(self):
        self.buf = {}
        self.nsamples = 0


def write_netcdf(stream: HistoryStream, grid, info, path: str,
                 case_name: str = "cice5_tpu"):
    """Gather-and-write one history file as classic netCDF-3 via scipy
    (the io_netcdf/ice_history_write.F90 equivalent), incl. per-category
    (nc) and vertical (nkice/nksnow) variables."""
    from scipy.io import netcdf_file
    from cice5_tpu.parallel.distributed import is_primary
    ny, nx = np.asarray(grid.hm).shape
    # every process participates in the gather; only the primary writes
    data = {dims: stream.averages(dims) for dims in stream.groups}
    if not is_primary():
        stream.reset()
        return path
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with netcdf_file(path, "w", version=2) as f:
        f.createDimension("time", None)
        f.createDimension("nj", ny)
        f.createDimension("ni", nx)
        if "3Dc" in data or "4Di" in data or "4Ds" in data:
            ncat = next(d.shape[-3] for k, d in data.items()
                        if k in ("3Dc", "4Di", "4Ds"))
            f.createDimension("nc", ncat)
        if "4Di" in data:
            f.createDimension("nkice", data["4Di"].shape[1])
        if "4Ds" in data:
            f.createDimension("nksnow", data["4Ds"].shape[1])
        tv = f.createVariable("time", "d", ("time",))
        tv.units = "days since 0001-01-01 00:00:00"
        tv[0] = info.time / 86400.0
        for name, arr in (("TLAT", grid.TLAT), ("TLON", grid.TLON),
                          ("tarea", grid.tarea), ("tmask", grid.hm)):
            v = f.createVariable(name, "f", ("nj", "ni"))
            v[:] = np.asarray(arr, np.float32)
        dimmap = {"2D": ("time", "nj", "ni"),
                  "3Dc": ("time", "nc", "nj", "ni"),
                  "4Di": ("time", "nkice", "nc", "nj", "ni"),
                  "4Ds": ("time", "nksnow", "nc", "nj", "ni")}
        for dims, fl in stream.groups.items():
            arr = data[dims]
            for k, hf in enumerate(fl):
                v = f.createVariable(hf.name, "f", dimmap[dims])
                v.units = hf.units
                v.long_name = hf.long_name
                # 4D buffers are (n, nilyr, ncat, ny, nx) — swap to the
                # CF-ish (nk, nc) order used by the reference files
                out = arr[k]
                v[0] = (out * hf.scale).astype(np.float32)
        f.history = f"{case_name} history, nsamples={stream.nsamples}"
    stream.reset()
    return path


def diag_to_values(diag, state, grid, tr=None, forcing=None,
                   nilyr=None, nslyr=None) -> dict:
    """Map a StepDiag + state into the standard history field names
    (+ mechred/pond/bgc/category/vertical fields when the tracer registry
    is given, + forcing fields when forcing is given)."""
    import jax.numpy as jnp
    aice = diag.aice
    safe = jnp.maximum(aice, ct.puny)
    secday = 86400.0
    m_to_cmday = 100.0 * secday   # m/step already per-step; caller scales
    extra = {}
    if forcing is not None:
        extra.update({
            "Tair": forcing.Tair - ct.Tffresh, "uatm": forcing.uatm,
            "vatm": forcing.vatm,
            "fswdn": forcing.swvdr + forcing.swvdf + forcing.swidr
            + forcing.swidf,
            "flwdn": forcing.flw, "snowfall": forcing.fsnow,
            "rainfall": forcing.frain, "sss": forcing.sss,
            "uocn": forcing.uocn, "vocn": forcing.vocn})
    return extra | {
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
        "alvdr": diag.alvdr, "alvdf": diag.alvdf,
        "alidr": diag.alidr, "alidf": diag.alidf,
        "evap": diag.evap, "fswthru": diag.fswthru,
        "strairy": diag.strairyT, "strocny": state.strocnyT,
        "fpond": diag.fpond,
        "PP_net": diag.PP_net, "grow_net": diag.grow_net,
        "melts": diag.melts * m_to_cmday,
        "fsurf_ai": diag.fsurf, "fcondtop_ai": diag.fcondtop,
        # Tref is the ai-weighted sum of Kelvin 2m temperatures
        # (sum aicen*Trefn); subtracting Tffresh*aice yields the
        # ai-weighted CELSIUS temperature without an aice<1 bias
        "Tref": diag.Tref - ct.Tffresh * aice,
        "Qref": diag.Qref * 1000.0,
        "Uref": diag.Uref,
        "strength": diag.strength,
        "ice_present": (aice > ct.puny).astype(aice.dtype),
    } | _principal_stress(state, diag) | _tracer_values(state, tr) \
      | _category_values(diag, state, tr, nilyr, nslyr)


def _principal_stress(state, diag) -> dict:
    """Normalized principal stresses + stress trace from the corner-1
    stress state (principal_stress, ice_dyn_shared.F90:611-659; f_sig1/
    f_sig2/f_trsig accumulation, ice_history.F90 dynamic-fields block)."""
    import jax.numpy as jnp
    sp, sm, s12 = state.stressp[0], state.stressm[0], state.stress12[0]
    prs = diag.prs_sig
    root = jnp.sqrt(sm * sm + 4.0 * s12 * s12)
    safe = jnp.where(prs > ct.puny, prs, 1.0)
    ok = prs > ct.puny
    return {
        "sig1": jnp.where(ok, 0.5 * (sp + root) / safe, 0.0),
        "sig2": jnp.where(ok, 0.5 * (sp - root) / safe, 0.0),
        "trsig": 0.25 * jnp.sum(state.stressp, axis=0),
    }


def _category_values(diag, state, tr, nilyr, nslyr) -> dict:
    """Per-category (3Dc) and vertical-profile (4Di/4Ds) history values
    (the a3Dc/a4Di/a4Ds accumulation classes,
    ice_history_shared.F90:741,805)."""
    if tr is None or nilyr is None:
        return {}
    import jax.numpy as jnp
    from cice5_tpu.models.thermo import shared as thshared
    trcrn = state.trcrn
    out = {
        "aicen": state.aicen, "vicen": state.vicen, "vsnon": state.vsnon,
        "Tsfcn": trcrn[:, tr.nt_Tsfc],
        "fsurfn_ai": diag.fsurfn_ai, "flatn_ai": diag.flatn_ai,
        "fcondtopn_ai": diag.fcondtopn_ai,
    }
    # vertical profiles: (ncat, nk, ny, nx) -> (nk, ncat, ny, nx)
    zqin = trcrn[:, tr.nt_qice:tr.nt_qice + nilyr]
    zSin = trcrn[:, tr.nt_sice:tr.nt_sice + nilyr]
    Tmlt = -zSin * ct.depressT
    out["Tinz"] = jnp.moveaxis(
        thshared.calculate_Tin_from_qin(zqin, Tmlt), 1, 0)
    out["Sinz"] = jnp.moveaxis(zSin, 1, 0)
    out["qinz"] = jnp.moveaxis(zqin, 1, 0)
    if nslyr is not None:
        zqsn = trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr]
        out["Tsnz"] = jnp.moveaxis(
            thshared.snow_temperature(zqsn), 1, 0)
    if tr.nt_apnd >= 0:
        out["apondn"] = trcrn[:, tr.nt_apnd] * state.aicen
        out["hpondn"] = trcrn[:, tr.nt_hpnd]
        if tr.nt_ipnd >= 0:
            out["ipondn"] = trcrn[:, tr.nt_ipnd]
    if tr.nt_alvl >= 0:
        out["ardgn"] = (1.0 - trcrn[:, tr.nt_alvl]) * state.aicen
        out["vrdgn"] = (1.0 - trcrn[:, tr.nt_vlvl]) * state.vicen
    return out


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
