"""Semtner zero-layer thermodynamics (reference source/ice_therm_0layer.F90).

ktherm=0: no internal heat capacity — the ice/snow slab conducts heat
linearly between the surface and the bottom through an effective
conductivity kh = kseaice / (hi + hs*kseaice/ksno), and the surface energy
balance fsurf(Tsf) = kh*(Tsf - Tbot) is solved by the same masked Newton
iteration pattern as the BL99 solver (zerolayer_temperature, :41-470).
Enthalpies stay fixed at the latent-only values (-rhoi*Lfresh /
-rhos*Lfresh), so thickness_changes handles all growth/melt energetics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from cice5_tpu import constants as ct
from cice5_tpu.models.thermo import shared

NITERMAX = 50
TSF_ERRMAX = 5.0e-4
KSEAICE = 2.0          # fixed 0-layer ice conductivity (ice_constants)


class ZeroLayerResult(NamedTuple):
    Tsf: jnp.ndarray
    fsensn: jnp.ndarray
    flatn: jnp.ndarray
    flwoutn: jnp.ndarray
    fsurfn: jnp.ndarray
    fcondtopn: jnp.ndarray
    fcondbot: jnp.ndarray
    converged: jnp.ndarray


class _Carry(NamedTuple):
    niter: jnp.ndarray
    Tsf: jnp.ndarray
    dTsf_prev: jnp.ndarray
    fsensn: jnp.ndarray
    flatn: jnp.ndarray
    flwoutn: jnp.ndarray
    fsurfn: jnp.ndarray
    fcondtopn: jnp.ndarray
    dfs_dT: jnp.ndarray   # (dfsens, dflat, dflwout) saved for final update
    dfl_dT: jnp.ndarray
    dfw_dT: jnp.ndarray
    converged: jnp.ndarray


def zerolayer_temperature(dt, *, mask, rhoa, flw, potT, Qa, shcoef, lhcoef,
                          fswsfc, hilyr, hslyr, nilyr, nslyr, Tsf, Tbot,
                          ksno=0.30) -> ZeroLayerResult:
    """Surface-balance solve (ice_therm_0layer.F90:41-470), dense masked."""
    kratio = KSEAICE / ksno
    heff = jnp.maximum(hilyr * nilyr + kratio * hslyr * nslyr, ct.puny)
    kh = KSEAICE / heff

    def fluxes(Tsf):
        fs = shared.surface_heat_flux(
            Tsf, fswsfc=fswsfc, rhoa=rhoa, flw=flw, potT=potT, Qa=Qa,
            shcoef=shcoef, lhcoef=lhcoef)
        ds = shared.dsurface_heat_flux_dTsf(Tsf, rhoa=rhoa, shcoef=shcoef,
                                            lhcoef=lhcoef)
        return fs, ds

    def body(c: _Carry) -> _Carry:
        active = mask & ~c.converged
        (flwoutn, fsensn, flatn, fsurfn), \
            (dfsurf, dflwout, dfsens, dflat) = fluxes(c.Tsf)

        fcondtop = kh * (c.Tsf - Tbot)
        Tsf0 = jnp.where(fsurfn < fcondtop,
                         jnp.minimum(c.Tsf, -ct.puny), c.Tsf)
        Tsf_start = Tsf0

        diag = dfsurf - kh
        rhs = dfsurf * Tsf0 - fsurfn - kh * Tbot
        Tsf_new = rhs / jnp.where(jnp.abs(diag) > ct.puny, diag, -1.0)

        dTsf = Tsf_new - Tsf_start
        conv = jnp.ones_like(mask)
        # condition 1: clamp above-melting solutions to 0 (converged)
        hot = Tsf_new > ct.puny
        Tsf_new = jnp.where(hot, 0.0, Tsf_new)
        dTsf = jnp.where(hot, -Tsf_start, dTsf)
        # condition 2: oscillation damping
        osc = ((c.niter > 0) & ~hot & (Tsf_start <= -ct.puny)
               & (jnp.abs(dTsf) > ct.puny)
               & (jnp.abs(c.dTsf_prev) > ct.puny)
               & (-dTsf / (c.dTsf_prev + ct.puny ** 2) > 0.5))
        dTsf = jnp.where(osc, 0.5 * dTsf, dTsf)
        Tsf_new = jnp.where(osc, Tsf_new + 0.5 * (Tsf_start - Tsf_new),
                            Tsf_new)
        conv = conv & ~osc
        # condition 3: increment small enough
        conv = conv & (jnp.abs(dTsf) <= TSF_ERRMAX)
        # condition 4: melting surface must have fsurf >= fcondtop
        fsurf_upd = fsurfn + dTsf * dfsurf
        fcondtop_upd = kh * (Tsf_new - Tbot)
        bad_melt = (Tsf_new > -ct.puny) & (fsurf_upd < fcondtop_upd)
        conv = conv & ~bad_melt

        upd = lambda new, old: jnp.where(active, new, old)
        return _Carry(
            niter=c.niter + 1,
            Tsf=upd(Tsf_new, c.Tsf),
            dTsf_prev=upd(dTsf, c.dTsf_prev),
            fsensn=upd(fsensn, c.fsensn), flatn=upd(flatn, c.flatn),
            flwoutn=upd(flwoutn, c.flwoutn), fsurfn=upd(fsurf_upd, c.fsurfn),
            fcondtopn=upd(fcondtop_upd, c.fcondtopn),
            dfs_dT=upd(dfsens, c.dfs_dT), dfl_dT=upd(dflat, c.dfl_dT),
            dfw_dT=upd(dflwout, c.dfw_dT),
            converged=c.converged | (active & conv) | ~mask)

    z = jnp.zeros_like(Tsf)
    init = _Carry(niter=jnp.zeros((), jnp.int32), Tsf=Tsf, dTsf_prev=z,
                  fsensn=z, flatn=z, flwoutn=z, fsurfn=z, fcondtopn=z,
                  dfs_dT=z, dfl_dT=z, dfw_dT=z, converged=~mask)
    c = lax.while_loop(
        lambda c: (c.niter < NITERMAX) & ~jnp.all(c.converged), body, init)

    # final flux updates with the last dTsf (:455-465)
    flwoutn = c.flwoutn + c.dTsf_prev * c.dfw_dT
    fsensn = c.fsensn + c.dTsf_prev * c.dfs_dT
    flatn = c.flatn + c.dTsf_prev * c.dfl_dT
    return ZeroLayerResult(
        Tsf=c.Tsf, fsensn=fsensn, flatn=flatn, flwoutn=flwoutn,
        fsurfn=c.fsurfn, fcondtopn=c.fcondtopn,
        fcondbot=c.fcondtopn,      # steady conduction through the slab
        converged=c.converged | ~mask)
