"""File-driven atmospheric/oceanic forcing (reference source/ice_forcing.F90).

The reference's dataset drivers (ncar_data :1837, LY_data :2041,
monthly_data :2824, oned_data :2991, ocn_data_clim :3161) share one
structure: read records bracketing the current time, linearly interpolate,
then derive the model's forcing fields in ``prepare_forcing`` (:1462-1697 —
SW spectral split, longwave parameterization, precip unit conversion,
rain/snow partition, wind rotation to the grid).

Here the time machinery is host-side numpy (readers.interp_coeff_monthly /
interp_coeff), datasets are held as (nrec, ny, nx) arrays loaded from
netCDF (scipy) or big-endian binary, and ``prepare_forcing`` is dense
array arithmetic producing a Forcing pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.forcing import (Forcing, Tf_from_sss,
                               longwave_parkinson_washington, sw_partition)
from cice5_tpu.io.readers import interp_coeff_monthly, read_netcdf_field

# SW spectral fractions (ice_forcing.F90 frcvdr/frcvdf/frcidr/frcidf)
FRCVDR, FRCVDF, FRCIDR, FRCIDF = 0.28, 0.24, 0.31, 0.17


def longwave_rosati_miyakoda(cldf, Tsfc, aice, sst, Qa, Tair, hm):
    """Downward LW, Rosati & Miyakoda 1988 (ice_forcing.F90:1726-1770)."""
    fcc = 1.0 - 0.8 * cldf
    sstk = (Tsfc * aice + sst * (1.0 - aice)) + ct.Tffresh
    rtea = jnp.sqrt(1000.0 * Qa / (0.622 + 0.378 * Qa))
    ptem = Tair
    qlwm = ptem ** 3 * (ptem * (0.39 - 0.05 * rtea) * fcc
                        + 4.0 * (sstk - ptem))
    return ct.emissivity * ct.stefan_boltzmann * (sstk ** 4 - qlwm) * hm


def prepare_forcing(*, Tair, fsw, cldf, Qa, rhoa, uatm, vatm, ANGLET, hm,
                    flw=None, fsnow=None, frain=None,
                    Tsfc=None, sst=None, aice=None,
                    atm_data_type="ncar", precip_units="mm_per_month",
                    days_per_year=365, calc_strair=True, zlvl0=10.0):
    """Derive the full atmospheric forcing set from raw dataset fields
    (ice_forcing.F90:1462-1697 prepare_forcing). Returns a dict of fields
    to build a Forcing with."""
    cldf = jnp.clip(cldf, 0.0, 1.0)
    fsw = jnp.maximum(fsw, 0.0)
    Qa = jnp.maximum(Qa, 0.0)
    rhoa = jnp.maximum(rhoa, 0.0)
    if fsnow is None:
        fsnow = jnp.zeros_like(Tair)
    fsnow = jnp.maximum(fsnow, 0.0)

    # dataset-specific corrections (:1543-1601)
    if atm_data_type == "ncar":
        Qa = Qa * 0.94
        fsw = fsw * 0.92
        flw = longwave_parkinson_washington(Tair, cldf)
    elif atm_data_type == "LYq":
        assert Tsfc is not None and sst is not None and aice is not None
        flw = longwave_rosati_miyakoda(cldf, Tsfc, aice, sst, Qa, Tair, hm)
    elif atm_data_type == "oned":
        flw = longwave_parkinson_washington(Tair, cldf)
    elif flw is None:
        flw = longwave_parkinson_washington(Tair, cldf)

    # precip unit conversion to kg/m^2/s (:1608-1616)
    if precip_units == "mm_per_month":
        pf = 12.0 / (86400.0 * days_per_year)
    elif precip_units == "mm_per_day":
        pf = 1.0 / 86400.0
    else:   # mm_per_sec | mks
        pf = 1.0
    fsnow = fsnow * pf

    # rain/snow partition (:1636-1650) unless dataset provides both
    if frain is None:
        warm = Tair >= ct.Tffresh
        frain = jnp.where(warm, fsnow, 0.0)
        fsnow = jnp.where(warm, 0.0, fsnow)

    # SW spectral split (:1625-1629)
    swvdr = fsw * FRCVDR
    swvdf = fsw * FRCVDF
    swidr = fsw * FRCIDR
    swidf = fsw * FRCIDF

    out = dict(Tair=Tair, potT=Tair, Qa=Qa, rhoa=rhoa, flw=flw,
               fsnow=fsnow, frain=frain, swvdr=swvdr, swvdf=swvdf,
               swidr=swidr, swidf=swidf,
               zlvl=jnp.full_like(Tair, zlvl0))
    if calc_strair:
        # rotate geographic wind onto the grid (:1653-1677)
        ca, sa = jnp.cos(ANGLET), jnp.sin(ANGLET)
        out["uatm"] = uatm * ca + vatm * sa
        out["vatm"] = vatm * ca - uatm * sa
        out["wind"] = jnp.sqrt(uatm ** 2 + vatm ** 2)
    else:
        out["uatm"], out["vatm"] = uatm, vatm
        out["wind"] = jnp.sqrt(uatm ** 2 + vatm ** 2)
    return out


@dataclasses.dataclass
class MonthlyForcing:
    """Monthly-climatology dataset driver (ice_forcing.F90:2824-2990
    monthly_data + faero_data style mid-month bracketing).

    fields: name -> (12, ny, nx) arrays. Ocean fields (sst, sss, uocn...)
    may be included; anything missing falls back to ``defaults``.
    """
    fields: Mapping[str, np.ndarray]
    days_per_year: int = 365
    atm_data_type: str = "ncar"
    precip_units: str = "mm_per_month"
    defaults: Mapping[str, float] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_netcdf(cls, path: str, varnames: Mapping[str, str], **kw):
        """Load 12-record variables from one netCDF file; varnames maps
        forcing name -> file variable name."""
        fields = {name: np.stack([read_netcdf_field(path, v, r)
                                  for r in range(12)])
                  for name, v in varnames.items()}
        return cls(fields=fields, **kw)

    def raw_at(self, yday: float):
        """Time-interpolated raw fields at year-day yday (mid-month
        bracketing, ice_forcing.F90:1296-1341 interp_coeff_monthly)."""
        m1, m2, c1, c2 = interp_coeff_monthly(yday, self.days_per_year)
        return {k: c1 * v[m1] + c2 * v[m2] for k, v in self.fields.items()}

    def forcing_at(self, yday: float, grid, dtype=jnp.float32,
                   Tsfc=None, sst=None, aice=None) -> Forcing:
        raw = self.raw_at(yday)
        shape = grid.shape
        f = lambda v: jnp.full(shape, float(v), dtype)
        get = lambda k, d: (jnp.asarray(raw[k], dtype) if k in raw
                            else f(self.defaults.get(k, d)))

        atm = prepare_forcing(
            Tair=get("Tair", 253.0), fsw=get("fsw", 0.0),
            cldf=get("cldf", 0.8), Qa=get("Qa", 0.0002),
            rhoa=get("rhoa", 1.3), uatm=get("uatm", 0.0),
            vatm=get("vatm", 0.0), ANGLET=jnp.asarray(grid.ANGLET, dtype),
            hm=jnp.asarray(grid.hm, dtype),
            flw=(jnp.asarray(raw["flw"], dtype) if "flw" in raw else None),
            fsnow=(jnp.asarray(raw["fsnow"], dtype)
                   if "fsnow" in raw else None),
            Tsfc=Tsfc, sst=sst, aice=aice,
            atm_data_type=self.atm_data_type,
            precip_units=self.precip_units,
            days_per_year=self.days_per_year)

        sss = get("sss", 34.0)
        Tf = Tf_from_sss(sss)
        sst_o = get("sst", 0.0) if ("sst" in raw
                                    or "sst" in self.defaults) else Tf
        from cice5_tpu.models.radiation.dedd import compute_coszen
        sec = (yday - int(yday)) * 86400.0
        coszen = compute_coszen(grid.TLAT, grid.TLON, float(int(yday)),
                                sec).astype(dtype)
        return Forcing(
            uatm=atm["uatm"], vatm=atm["vatm"], wind=atm["wind"],
            zlvl=atm["zlvl"], potT=atm["potT"], Tair=atm["Tair"],
            Qa=atm["Qa"], rhoa=atm["rhoa"], flw=atm["flw"],
            fsnow=atm["fsnow"], frain=atm["frain"],
            swvdr=atm["swvdr"], swvdf=atm["swvdf"], swidr=atm["swidr"],
            swidf=atm["swidf"], sss=sss, sst=sst_o,
            uocn=get("uocn", 0.0), vocn=get("vocn", 0.0),
            ss_tltx=get("ss_tltx", 0.0), ss_tlty=get("ss_tlty", 0.0),
            frzmlt=get("frzmlt", 0.0), Tf=Tf,
            qdp=get("qdp", 0.0), hmix=get("hmix", 20.0),
            yday=jnp.asarray(yday, dtype), coszen=coszen)


@dataclasses.dataclass
class RecordForcing:
    """Fixed-interval record dataset driver (the ncar_data/LY_data pattern,
    ice_forcing.F90:1837-2520): fields sampled every ``sec_per_rec``
    seconds through the year (e.g. 6-hourly = 1460 records), linearly
    interpolated between the two bracketing records.

    recslot=1: records valid at the END of their interval (ice_forcing
    default for 6-hourly fluxes); recslot=2: at the middle.
    """
    fields: Mapping[str, np.ndarray]      # name -> (nrec, ny, nx)
    sec_per_rec: float = 21600.0
    recslot: int = 1
    atm_data_type: str = "ncar"
    precip_units: str = "mks"
    days_per_year: int = 365
    defaults: Mapping[str, float] = dataclasses.field(default_factory=dict)

    def raw_at(self, istep: int, dt: float):
        from cice5_tpu.io.readers import interp_coeff
        c1, c2 = interp_coeff(istep, dt, self.recslot, self.sec_per_rec)
        nrec = next(iter(self.fields.values())).shape[0]
        tt = istep * dt
        if self.recslot == 1:
            # t1 = floor(tt/sec)*sec is the END of record n1's interval
            n1 = int(tt // self.sec_per_rec) % nrec
            n2 = (n1 + 1) % nrec
        else:
            n1 = int((tt - self.sec_per_rec / 2) // self.sec_per_rec) % nrec
            n2 = (n1 + 1) % nrec
        return {k: c1 * v[n1] + c2 * v[n2] for k, v in self.fields.items()}

    def forcing_at(self, istep: int, dt: float, grid,
                   dtype=jnp.float32) -> Forcing:
        raw = self.raw_at(istep, dt)
        yday = (istep * dt / 86400.0) % self.days_per_year + 1.0
        mf = MonthlyForcing(fields={}, days_per_year=self.days_per_year,
                            atm_data_type=self.atm_data_type,
                            precip_units=self.precip_units,
                            defaults=self.defaults)
        mf.raw_at = lambda _y: raw        # reuse the assembly path
        return mf.forcing_at(yday, grid, dtype=dtype)
