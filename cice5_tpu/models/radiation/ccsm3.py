"""CCSM3 shortwave radiation: albedos and absorbed solar.

Batched re-expression of /root/reference/source/ice_shortwave.F90:
``compute_albedos`` (:652), ``constant_albedos`` (:867) and
``absorbed_solar`` (:1020) — Beer's-law absorption of penetrating visible
radiation with thickness/temperature-dependent albedos. Per-category, dense
over batch shape *B; ice-free cells yield ocean albedo and zero absorption.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import math

from cice5_tpu import constants as ct

I0VIS = 0.70      # fraction of visible SW penetrating the surface
DT_MELT = 1.0
DALB_MLT = -0.075
DALB_MLTV = -0.1
DALB_MLTI = -0.15


class Albedos(NamedTuple):
    alvdrn: jnp.ndarray   # combined ice+snow albedos (coupler)
    alidrn: jnp.ndarray
    alvdfn: jnp.ndarray
    alidfn: jnp.ndarray
    alvdrni: jnp.ndarray  # bare-ice
    alidrni: jnp.ndarray
    alvdfni: jnp.ndarray
    alidfni: jnp.ndarray
    alvdrns: jnp.ndarray  # snow
    alidrns: jnp.ndarray
    alvdfns: jnp.ndarray
    alidfns: jnp.ndarray
    albin: jnp.ndarray    # broadband diagnostics
    albsn: jnp.ndarray


class AbsorbedSolar(NamedTuple):
    fswsfc: jnp.ndarray
    fswint: jnp.ndarray
    fswthru: jnp.ndarray
    Iswabs: jnp.ndarray      # (nilyr, *B)
    fswpenl: jnp.ndarray     # (nilyr+1, *B) penetrating SW at interfaces


def compute_albedos(aicen, vicen, vsnon, Tsfcn, *, albicev, albicei,
                    albsnowv, albsnowi, ahmax) -> Albedos:
    """CCSM3 thickness/temperature-dependent albedos
    (ice_shortwave.F90:652-866)."""
    mask = aicen > ct.puny
    ai = jnp.maximum(aicen, ct.puny)
    hi = jnp.where(mask, vicen / ai, 0.0)
    hs = jnp.where(mask, vsnon / ai, 0.0)

    fhtan = math.atan(ahmax * 4.0)
    fh = jnp.minimum(jnp.arctan(hi * 4.0) / fhtan, 1.0)
    albo = ct.albocn * (1.0 - fh)
    alvdfni = albicev * fh + albo
    alidfni = albicei * fh + albo

    dTs = ct.Timelt - Tsfcn
    fT = jnp.minimum(dTs / DT_MELT - 1.0, 0.0)
    alvdfni = jnp.maximum(alvdfni - DALB_MLT * fT, ct.albocn)
    alidfni = jnp.maximum(alidfni - DALB_MLT * fT, ct.albocn)

    has_snow = hs > ct.puny
    alvdfns = jnp.where(has_snow, albsnowv - DALB_MLTV * fT, ct.albocn)
    alidfns = jnp.where(has_snow, albsnowi - DALB_MLTI * fT, ct.albocn)

    # direct = diffuse in CCSM3
    alvdrni, alidrni = alvdfni, alidfni
    alvdrns, alidrns = alvdfns, alidfns

    asnow = jnp.where(has_snow, hs / (hs + ct.snowpatch), 0.0)
    mix = lambda i, s: jnp.where(mask, i * (1.0 - asnow) + s * asnow,
                                 ct.albocn)
    alvdfn = mix(alvdfni, alvdfns)
    alidfn = mix(alidfni, alidfns)
    alvdrn = mix(alvdrni, alvdrns)
    alidrn = mix(alidrni, alidrns)

    albin = jnp.where(mask, ct.awtvdr * alvdrni + ct.awtidr * alidrni
                      + ct.awtvdf * alvdfni + ct.awtidf * alidfni, 0.0)
    albsn = jnp.where(mask, ct.awtvdr * alvdrns + ct.awtidr * alidrns
                      + ct.awtvdf * alvdfns + ct.awtidf * alidfns, 0.0)

    w = lambda a: jnp.where(mask, a, ct.albocn)
    return Albedos(alvdrn, alidrn, alvdfn, alidfn,
                   w(alvdrni), w(alidrni), w(alvdfni), w(alidfni),
                   w(alvdrns), w(alidrns), w(alvdfns), w(alidfns),
                   albin, albsn)


def constant_albedos(aicen, vsnon, Tsfcn) -> Albedos:
    """Four-constant albedo scheme (ice_shortwave.F90:867-1016)."""
    warmice, coldice = 0.68, 0.70
    warmsnow, coldsnow = 0.77, 0.81
    mask = aicen > ct.puny
    hs = jnp.where(mask, vsnon / jnp.maximum(aicen, ct.puny), 0.0)
    has_snow = hs > ct.puny
    warm = Tsfcn >= -2.0 * ct.puny
    alb_i = jnp.where(warm, warmice, coldice)
    alb_s = jnp.where(warm, warmsnow, coldsnow)
    albx = jnp.where(has_snow, alb_s, alb_i)
    a = jnp.where(mask, albx, ct.albocn)
    ai = jnp.where(mask, alb_i, ct.albocn)
    as_ = jnp.where(mask, alb_s, ct.albocn)
    albin = jnp.where(mask, alb_i, 0.0)
    albsn = jnp.where(mask, alb_s, 0.0)
    return Albedos(a, a, a, a, ai, ai, ai, ai, as_, as_, as_, as_,
                   albin, albsn)


def absorbed_solar(aicen, vicen, vsnon, swvdr, swvdf, swidr, swidf,
                   alb: Albedos, *, nilyr, heat_capacity=True) -> AbsorbedSolar:
    """Partition net SW into surface/interior/transmitted
    (ice_shortwave.F90:1020-1240). All IR absorbed at surface; visible
    attenuates by Beer's law with kappav through the ice interior."""
    mask = aicen > ct.puny
    ai = jnp.maximum(aicen, ct.puny)
    hs = jnp.where(mask, vsnon / ai, 0.0)
    hi = jnp.where(mask, vicen / ai, 0.0)
    asnow = jnp.where(hs > ct.puny, hs / (hs + ct.snowpatch), 0.0)

    swabsv = (swvdr * ((1 - alb.alvdrni) * (1 - asnow)
                       + (1 - alb.alvdrns) * asnow)
              + swvdf * ((1 - alb.alvdfni) * (1 - asnow)
                         + (1 - alb.alvdfns) * asnow))
    swabsi = (swidr * ((1 - alb.alidrni) * (1 - asnow)
                       + (1 - alb.alidrns) * asnow)
              + swidf * ((1 - alb.alidfni) * (1 - asnow)
                         + (1 - alb.alidfns) * asnow))
    swabs = swabsv + swabsi

    fswpen = (swvdr * (1 - alb.alvdrni) * (1 - asnow) * I0VIS
              + swvdf * (1 - alb.alvdfni) * (1 - asnow) * I0VIS)
    fswsfc = swabs - fswpen

    hilyr = hi / nilyr
    ks = jnp.arange(1, nilyr + 1, dtype=swvdr.dtype)
    # transmittance at the bottom of each layer: exp(-kappav * hilyr * k)
    tran = jnp.exp(-ct.kappav * hilyr[None] * ks.reshape((nilyr,) + (1,) * hi.ndim))
    trantop = jnp.concatenate([jnp.ones_like(tran[:1]), tran[:-1]], axis=0)
    Iswabs = fswpen[None] * (trantop - tran)
    fswpenl = jnp.concatenate([fswpen[None], fswpen[None] * tran], axis=0)

    fswthru = fswpen * tran[nilyr - 1]
    fswint = fswpen - fswthru

    if not heat_capacity:
        fswsfc = fswsfc + fswint
        fswint = jnp.zeros_like(fswint)
        Iswabs = jnp.zeros_like(Iswabs)

    m = mask
    return AbsorbedSolar(
        fswsfc=jnp.where(m, fswsfc, 0.0),
        fswint=jnp.where(m, fswint, 0.0),
        fswthru=jnp.where(m, fswthru, 0.0),
        Iswabs=jnp.where(m[None], Iswabs, 0.0),
        fswpenl=jnp.where(m[None], fswpenl, 0.0))


def shortwave_ccsm3(aicen, vicen, vsnon, Tsfcn, swvdr, swvdf, swidr, swidf,
                    *, nilyr, albedo_type="ccsm3", albicev=0.78, albicei=0.36,
                    albsnowv=0.98, albsnowi=0.70, ahmax=0.3,
                    heat_capacity=True):
    """Full CCSM3 radiation for one category (ice_shortwave.F90:425-650
    shortwave_ccsm3): albedos then absorption. Returns (Albedos,
    AbsorbedSolar) with Sswabs (snow) identically zero in this scheme."""
    if albedo_type == "constant":
        alb = constant_albedos(aicen, vsnon, Tsfcn)
    else:
        alb = compute_albedos(aicen, vicen, vsnon, Tsfcn, albicev=albicev,
                              albicei=albicei, albsnowv=albsnowv,
                              albsnowi=albsnowi, ahmax=ahmax)
    absr = absorbed_solar(aicen, vicen, vsnon, swvdr, swvdf, swidr, swidf,
                          alb, nilyr=nilyr, heat_capacity=heat_capacity)
    return alb, absr
