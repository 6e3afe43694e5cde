"""Forcing: atmosphere + ocean inputs for one step.

The per-step interface to /root/reference/source/ice_forcing.F90's output
fields (uatm..., sst, sss, uocn...; prepare_forcing :1462). Dataset readers
with time interpolation live in cice5_tpu.io.readers; this module defines the
Forcing pytree and idealized analytic forcings used by tests and the
single-column config (the 'oned_data'/'default' analog,
ice_forcing.F90:2991).

Derived-field computation (SW partition, longwave parameterizations, air
density/potential temperature defaults) mirrors prepare_forcing.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.utils import pytree_dataclass


@pytree_dataclass
class Forcing:
    """Per-step forcing fields, all (ny, nx) (ice_flux.F90 'in from atmos /
    ocean' groups)."""
    # atmosphere
    uatm: jnp.ndarray      # wind velocity (m/s)
    vatm: jnp.ndarray
    wind: jnp.ndarray      # wind speed (m/s)
    zlvl: jnp.ndarray      # atm level height (m)
    potT: jnp.ndarray      # air potential temperature (K)
    Tair: jnp.ndarray      # air temperature (K)
    Qa: jnp.ndarray        # specific humidity (kg/kg)
    rhoa: jnp.ndarray      # air density (kg/m^3)
    flw: jnp.ndarray       # incoming longwave (W/m^2)
    fsnow: jnp.ndarray     # snowfall rate (kg/m^2/s)
    frain: jnp.ndarray     # rainfall rate (kg/m^2/s)
    swvdr: jnp.ndarray     # shortwave components (W/m^2)
    swvdf: jnp.ndarray
    swidr: jnp.ndarray
    swidf: jnp.ndarray
    # ocean
    sss: jnp.ndarray       # sea surface salinity (ppt)
    sst: jnp.ndarray       # SST used when not prognostic (deg C)
    uocn: jnp.ndarray      # ocean current at U points (m/s)
    vocn: jnp.ndarray
    ss_tltx: jnp.ndarray   # sea surface slope (m/m)
    ss_tlty: jnp.ndarray
    frzmlt: jnp.ndarray    # freezing/melting potential if externally given
    Tf: jnp.ndarray        # freezing temperature (deg C)
    qdp: jnp.ndarray       # deep ocean heat flux (W/m^2)
    hmix: jnp.ndarray      # mixed layer depth (m)
    yday: jnp.ndarray      # fractional day of year (scalar array)
    coszen: jnp.ndarray    # cosine solar zenith angle (ny, nx)
    # prescribed per-category surface fluxes for calc_Tsfc=False coupled
    # mode (set_sfcflux, ice_flux.F90:1015): (ncat, ny, nx); None otherwise
    fsurfn_f: jnp.ndarray | None = None
    fcondtopn_f: jnp.ndarray | None = None
    flatn_f: jnp.ndarray | None = None
    fsensn_f: jnp.ndarray | None = None
    # atmospheric aerosol deposition (n_aero, ny, nx) — faero_data
    # (ice_aerosol.F90:71); None = the faero_default constants
    faero_atm: jnp.ndarray | None = None
    # ocean biogeochemical concentrations (nbtrcr, ny, nx) —
    # get_forcing_bgc (ice_algae.F90:46); None = default_ocean_bio
    ocean_bio: jnp.ndarray | None = None


def Tf_from_sss(sss):
    """Freezing temperature: linear liquidus (ice_forcing/init: -depressT*sss)."""
    return -ct.depressT * sss


def sw_partition(fsw):
    """Split total downward SW into 4 components (prepare_forcing,
    ice_forcing.F90:1521-1528 partition frac_vdr etc.)."""
    return 0.28 * fsw, 0.24 * fsw, 0.31 * fsw, 0.17 * fsw


def longwave_parkinson_washington(Tair, cldf):
    """Downward LW (ice_forcing.F90:1700-1724): Parkinson & Washington 1979."""
    TK = Tair
    return (ct.stefan_boltzmann * TK ** 4
            * (1.0 - 0.261 * jnp.exp(-7.77e-4 * (273.0 - TK) ** 2))
            * (1.0 + 0.275 * cldf))


def idealized_polar_forcing(shape, yday: float, *, Tair_mean=-15.0,
                            Tair_amp=18.0, wind_speed=5.0, cldf=0.8,
                            sss_val=34.0, hmix_val=20.0,
                            dtype=jnp.float32, tlat=None,
                            tlon=None, orb=None) -> Forcing:
    """Analytic seasonal polar forcing (the 'oned'/col-config analog):
    seasonal air temperature, daylight-dependent SW, P&W longwave."""
    # fully traceable in yday so Model can jit the forcing construction
    # (host-side per-step array building dominated long-run wall time)
    f = lambda v: jnp.full(shape, v, dtype)
    from cice5_tpu.models.radiation.dedd import compute_coszen
    yd = jnp.asarray(yday, dtype)
    day = jnp.floor(yd)
    sec = (yd - day) * 86400.0
    if tlat is not None:
        coszen = compute_coszen(tlat, tlon, day, sec, orb).astype(dtype)
    else:
        coszen = f(0.3)
    # season: NH coldest at yday ~ 15; SH phase-flipped. With a latitude
    # map the polar (Tair_mean, Tair_amp) climate blends into a mild
    # +15 C equator so low latitudes stay ice-free (the role the ocean
    # SST climatology plays for the reference's standalone runs,
    # ice_forcing.F90:3161 ocn_data_clim) — without it the slab ocean
    # sits at Tf everywhere and frazil covers the tropics in hours.
    phase = 2.0 * jnp.pi * (yd - 196.0) / 365.0
    if tlat is not None:
        latw = jnp.abs(jnp.sin(tlat)).astype(dtype)      # 1 pole, 0 equator
        season = jnp.where(tlat >= 0, jnp.cos(phase),
                           -jnp.cos(phase)).astype(dtype)
        TairC = (Tair_mean + Tair_amp * season) * latw \
            + 15.0 * (1.0 - latw)
        sst_open = (1.0 - latw) ** 2 * 24.0              # above freezing
    else:
        latw = None
        season = jnp.cos(phase)
        TairC = Tair_mean + Tair_amp * season
        sst_open = 0.0
    Tair = TairC + ct.Tffresh
    # daylight SW: peaks with the local warm season, max ~ 280 W/m2
    fsw = jnp.maximum(0.0, 280.0 * season)
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), shape)
    swvdr, swvdf, swidr, swidf = sw_partition(bc(fsw))
    Qa = 0.0001 + 0.0003 * jnp.maximum(0.0, (TairC + 30.0) / 30.0)
    flw = longwave_parkinson_washington(bc(Tair), cldf)
    sss = f(sss_val)
    return Forcing(
        uatm=f(wind_speed), vatm=f(0.0), wind=f(wind_speed), zlvl=f(10.0),
        potT=bc(Tair), Tair=bc(Tair), Qa=bc(Qa), rhoa=f(1.3), flw=flw,
        fsnow=bc(jnp.where(TairC < 0, 3.0e-6, 0.0)), frain=f(0.0),
        swvdr=swvdr, swvdf=swvdf, swidr=swidr, swidf=swidf,
        sss=sss, sst=bc(Tf_from_sss(sss) + sst_open), uocn=f(0.0),
        vocn=f(0.0), ss_tltx=f(0.0), ss_tlty=f(0.0), frzmlt=f(0.0),
        Tf=Tf_from_sss(sss), qdp=f(0.0), hmix=f(hmix_val),
        yday=jnp.asarray(yday, dtype), coszen=coszen)
