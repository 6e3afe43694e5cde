"""One model time step: the full thermodynamics + dynamics orchestration.

TPU-native re-expression of /root/reference/source/ice_step_mod.F90 and the
standalone driver loop (drivers/cice/CICE_RunMod.F90:107-267 ice_step +
coupling_prep): radiation, ocean mixed layer, per-category vertical
thermodynamics, ITD evolution (linear remap, frazil, lateral melt, cleanup),
EVP dynamics + transport + ridging, and flux aggregation for
coupling/diagnostics — as ONE pure jittable function
``step(state, forcing, grid, ...) -> (state, diag)``.

Category parallelism: the reference's OMP block loop over per-category
subroutine calls becomes ``jax.vmap`` over the leading ncat axis of the
column physics. Spatial parallelism: every halo-touching operator takes the
Topology and works identically under single-device jit and shard_map.

Deliberate deviation from the reference's ordering (documented): radiation is
computed at the START of the step from the current state and forcing, instead
of at the end of the previous step rescaled by prep_radiation
(ice_step_mod.F90:33-154). For standalone forcing the two are equivalent up
to the one-step albedo lag the reference accepts for coupler symmetry;
scale_factor is carried in State so the coupled path can restore the
reference ordering later.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.config import ModelConfig
from cice5_tpu.forcing import Forcing
from cice5_tpu.grid import Grid
from cice5_tpu.models import atmo, ocean
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import evp
from cice5_tpu.models.dynamics.ridge import ridge_ice
from cice5_tpu.models.dynamics.strength import (strength_hibler,
                                                strength_rothrock)
from cice5_tpu.models.radiation.ccsm3 import shortwave_ccsm3
from cice5_tpu.models.thermo import itd, shared as thshared, vertical
from cice5_tpu.models.transport.upwind import transport_upwind
from cice5_tpu.ops.blockwrite import set_trc
from cice5_tpu.parallel import Topology
from cice5_tpu.state import State, TracerRegistry


class StepDiag(NamedTuple):
    """Cell-mean fluxes and diagnostics from one step (the merge_fluxes /
    runtime_diags surface, ice_flux.F90:681)."""
    aice: jnp.ndarray
    vice: jnp.ndarray
    vsno: jnp.ndarray
    fsens: jnp.ndarray
    flat: jnp.ndarray
    flwout: jnp.ndarray
    evap: jnp.ndarray
    fresh: jnp.ndarray
    fsalt: jnp.ndarray
    fhocn: jnp.ndarray
    fswthru: jnp.ndarray
    fswabs: jnp.ndarray
    strairxT: jnp.ndarray
    strairyT: jnp.ndarray
    meltt: jnp.ndarray
    melts: jnp.ndarray
    meltb: jnp.ndarray
    meltl: jnp.ndarray
    congel: jnp.ndarray
    snoice: jnp.ndarray
    frazil: jnp.ndarray
    frzmlt: jnp.ndarray
    dardg1dt: jnp.ndarray
    dardg2dt: jnp.ndarray
    dvirdgdt: jnp.ndarray
    divu: jnp.ndarray
    shear: jnp.ndarray
    alvdr: jnp.ndarray    # cell-mean albedos (incl. open water), 4 bands
    alvdf: jnp.ndarray
    alidr: jnp.ndarray
    alidf: jnp.ndarray
    Tsfc: jnp.ndarray     # cell-mean surface temperature
    therm_converged: jnp.ndarray
    ferr_max: jnp.ndarray
    fpond: jnp.ndarray          # net meltwater flux into ponds (m/step)
    transport_conserv_err: jnp.ndarray   # 0 unless conserv_check
    transport_mono_bad: jnp.ndarray      # 0 unless monotonicity_check
    fsurfn_ai: jnp.ndarray      # (ncat, ny, nx) ai-weighted sfc heat flux
    flatn_ai: jnp.ndarray       # (ncat, ny, nx) ai-weighted latent flux
    fsensn_ai: jnp.ndarray      # (ncat, ny, nx) ai-weighted sensible flux
    fmelttn_ai: jnp.ndarray     # (ncat, ny, nx) surface-melt heat flux
    # max(fsurfn - fcondtopn, 0)*ai (ice_history.F90:1560-1565)
    snowfracn: jnp.ndarray      # (ncat, ny, nx) radiation snow fraction
    fcondtopn_ai: jnp.ndarray   # (ncat, ny, nx) ai-weighted top conductive
    fsurf: jnp.ndarray          # cell-mean net surface heat flux
    fcondtop: jnp.ndarray       # cell-mean top conductive flux
    Tref: jnp.ndarray           # ai-weighted 2m air temperature (f_Tref)
    Qref: jnp.ndarray           # ai-weighted 2m specific humidity
    Uref: jnp.ndarray           # ai-weighted 10m wind speed
    strength: jnp.ndarray       # ice strength at dynamics time (N/m)
    prs_sig: jnp.ndarray        # replacement pressure (for sig1/sig2)
    state_bad: jnp.ndarray      # in-step l_stop analog: count of NaN/
    # out-of-bounds state values after this step (0 = healthy)
    strintx: jnp.ndarray        # internal ice stress divergence, x (N/m^2)
    strinty: jnp.ndarray
    strtltx: jnp.ndarray        # sea-surface tilt stress, x (N/m^2)
    strtlty: jnp.ndarray
    strcorx: jnp.ndarray        # Coriolis stress fm*vvel (N/m^2)
    strcory: jnp.ndarray        # Coriolis stress -fm*uvel
    e11: jnp.ndarray            # strain-rate tensor, EAP diagnostics
    e12: jnp.ndarray            # (zero under EVP; ice_dyn_eap.F90:1278)
    e22: jnp.ndarray
    yieldstress11: jnp.ndarray  # anisotropic yield-stress tensor
    yieldstress12: jnp.ndarray  # (ice_dyn_eap.F90:1330-1339)
    yieldstress22: jnp.ndarray
    albice: jnp.ndarray         # broadband bare-ice albedo (cell mean)
    albsno: jnp.ndarray         # broadband snow albedo
    albpnd: jnp.ndarray         # broadband pond albedo (dEdd only)
    dsnow: jnp.ndarray          # snow depth change from thermo (m/step)
    fswint: jnp.ndarray         # SW absorbed in ice interior (W/m^2)
    daidtt: jnp.ndarray         # area tendency from thermo (1/s)
    dvidtt: jnp.ndarray         # volume tendency from thermo (m/s)
    daidtd: jnp.ndarray         # area tendency from dynamics (1/s)
    dvidtd: jnp.ndarray         # volume tendency from dynamics (m/s)
    dagedtt: jnp.ndarray        # age tendency from thermo (s/s)
    dagedtd: jnp.ndarray        # age tendency from dynamics (s/s)
    faero_ocn: jnp.ndarray   # (n_aero, ny, nx); empty when tr_aero off
    flux_bio: jnp.ndarray    # (nbtrcr, ny, nx) BGC flux to ocean; empty
    PP_net: jnp.ndarray      # net primary production (mg C/m^2/s)
    grow_net: jnp.ndarray    # net specific algal growth (1/s)
    opening: jnp.ndarray     # lead opening rate (1/s; f_opening)
    # form-drag diagnostics stacked in DRAG_KEYS order (ice_history_drag
    # .F90 f_drag/f_Cdn_atm/f_Cdn_ocn); (len(DRAG_KEYS), ny, nx) when
    # cfg.forcing.formdrag else (0, ny, nx)
    drag: jnp.ndarray
    # per-category mechred diagnostics stacked in RDGN_KEYS order
    # (ice_history_mechred.F90); (9, ncat, ny, nx) when
    # cfg.dyn.diag_mechred else (0, ncat, ny, nx)
    rdgn: jnp.ndarray


# unpack orders for the stacked diagnostic groups
DRAG_KEYS = ("Cdn_atm", "Cdn_ocn", "Cdn_atm_skin", "Cdn_atm_floe",
             "Cdn_atm_pond", "Cdn_atm_rdg", "Cdn_ocn_skin", "Cdn_ocn_floe",
             "Cdn_ocn_keel", "hfreebd", "hdraft", "hridge", "distrdg",
             "hkeel", "dkeel", "lfloe", "dfloe")
RDGN_KEYS = ("dardg1ndt", "dardg2ndt", "dvirdgndt", "araftn", "vraftn",
             "aparticn", "krdgn", "aredistn", "vredistn")


LANE = 128   # TPU lane width: packed column batches are (rows, LANE)


class ColumnPacking(NamedTuple):
    """Static ocean-column packing for the pre-dynamics column physics.

    The TPU analog of the reference's compressed cell index lists
    (``icells``/``indxi``/``indxj``, e.g. ice_therm_vertical.F90:186-200,
    ice_itd.F90): instead of gathering per-subroutine, the whole column
    section runs once on a dense (rows, LANE) batch holding only ocean
    cells, skipping land (~37% of gx1). Indices are built host-side from
    the static land mask (pack_columns); padding columns point at a land
    cell (no-ice physics, converges immediately) and are dropped on
    scatter (sidx = ny*nx out-of-bounds + mode='drop')."""
    gidx: jnp.ndarray    # (P,) flat gather indices into ny*nx
    sidx: jnp.ndarray    # (P,) flat scatter indices; pads = ny*nx (dropped)


def pack_columns(tmask, min_land_frac: float = 0.02) -> ColumnPacking | None:
    """Build a ColumnPacking from a host-side land mask (None if the grid
    has too little land for compaction to pay, or no ocean at all)."""
    import numpy as np
    t = np.asarray(tmask).astype(bool)
    ny, nx = t.shape
    ocn = np.flatnonzero(t.ravel())
    land = np.flatnonzero(~t.ravel())
    if ocn.size == 0 or land.size < min_land_frac * t.size:
        return None
    tile = 16 * LANE      # row-pad so dEdd's row-block tiling stays 16
    P = -(-ocn.size // tile) * tile
    pad = P - ocn.size
    gidx = np.concatenate([ocn, np.full(pad, land[0])]).astype(np.int32)
    sidx = np.concatenate([ocn, np.full(pad, ny * nx)]).astype(np.int32)
    return ColumnPacking(gidx=jnp.asarray(gidx), sidx=jnp.asarray(sidx))


def _gather_cols(x, gidx):
    """(..., ny, nx) -> (..., P//LANE, LANE) packed ocean columns.

    Reshapes use explicit sizes, never -1: jax 0.9's -1 inference
    raises ZeroDivisionError on zero-size arrays (e.g. the (0, ny, nx)
    stacks a disabled tracer family contributes)."""
    lead = x.shape[:-2]
    g = jnp.take(x.reshape(*lead, x.shape[-2] * x.shape[-1]), gidx,
                 axis=-1)
    return g.reshape(*lead, gidx.shape[0] // LANE, LANE)


def _scatter_cols(vals, sidx, base):
    """Packed (..., P//LANE, LANE) -> dense, land cells keep `base`."""
    lead = vals.shape[:-2]
    flat = base.reshape(*base.shape[:-2], base.shape[-2] * base.shape[-1])
    out = flat.at[..., sidx].set(
        vals.reshape(*lead, vals.shape[-2] * vals.shape[-1]), mode="drop")
    return out.reshape(base.shape)


class RadOut(NamedTuple):
    """Per-category radiation outputs (run_dEdd / shortwave_ccsm3)."""
    alb: object              # ccsm3.Albedos
    absr: object             # ccsm3.AbsorbedSolar
    Sswabsn: jnp.ndarray     # (ncat, nslyr, *B) SW absorbed in snow
    albpndn: jnp.ndarray     # (ncat, *B)
    snowfracn: jnp.ndarray   # (ncat, *B)


def _step_radiation(aicen, vicen, vsnon, trcrn, forcing, cfg, tr) -> RadOut:
    """One radiation pass over all categories (step_radiation,
    ice_step_mod.F90:1364: run_dEdd | shortwave_ccsm3). Called at the
    start of the step in the standalone ordering, or at the END of the
    step (on the post-dynamics state) under cfg.coupled_radiation."""
    ncat = aicen.shape[0]
    B = aicen.shape[1:]
    dtype = aicen.dtype
    nilyr, nslyr = cfg.nilyr, cfg.nslyr
    Tsfcn = trcrn[:, tr.nt_Tsfc]
    sw = cfg.shortwave
    if sw.shortwave == "dEdd":
        from cice5_tpu.models.radiation.dedd import shortwave_dEdd
        swid_tot = forcing.swidr + forcing.swidf
        fnidr = jnp.where(swid_tot > ct.puny,
                          forcing.swidr / jnp.maximum(swid_tot, ct.puny), 0.0)
        if cfg.tracers.tr_pond:
            apnd_r = trcrn[:, tr.nt_apnd]
            hpnd_r = trcrn[:, tr.nt_hpnd]
            if cfg.tracers.tr_pond_lvl:
                apnd_r = apnd_r * trcrn[:, tr.nt_alvl]
            elif cfg.tracers.tr_pond_topo:
                # pond effective for radiation only while the refrozen lid
                # is thinner than hp1 (ice_shortwave.F90:1516-1537)
                eff = ((apnd_r * aicen > ct.puny)
                       & (trcrn[:, tr.nt_ipnd] < cfg.tracers.hp1))
                apnd_r = jnp.where(eff, apnd_r, 0.0)
        else:
            apnd_r = jnp.zeros_like(aicen)
            hpnd_r = jnp.zeros_like(aicen)

        pond_scheme = ("topo" if cfg.tracers.tr_pond_topo
                       else "lvl" if cfg.tracers.tr_pond_lvl else "cesm")

        dedd_kw = dict(
            nilyr=nilyr, nslyr=nslyr, coszen=forcing.coszen,
            fnidr=fnidr, swvdr=forcing.swvdr, swvdf=forcing.swvdf,
            swidr=forcing.swidr, swidf=forcing.swidf,
            R_ice=sw.R_ice, R_pnd=sw.R_pnd, R_snw=sw.R_snw,
            dT_mlt=sw.dT_mlt, rsnw_mlt=sw.rsnw_mlt, kalg=sw.kalg,
            hs0=cfg.tracers.hs0, hs1=cfg.tracers.hs1,
            pndaspect=cfg.tracers.pndaspect, pond_scheme=pond_scheme)
        use_pallas_sw = (sw.sw_kernel == "pallas"
                         or (sw.sw_kernel == "auto"
                             and jax.default_backend() == "tpu"))
        with jax.named_scope("sw_radiation_dEdd"):
            if use_pallas_sw:
                from cice5_tpu.ops.pallas.dedd_fused import (
                    shortwave_dEdd_tiled)
                de = shortwave_dEdd_tiled(
                    aicen=aicen, vicen=vicen, vsnon=vsnon, Tsfcn=Tsfcn,
                    apnd=apnd_r, hpnd=hpnd_r, **dedd_kw)
            else:
                de = jax.vmap(lambda a, v, s, t, p, h: shortwave_dEdd(
                    aicen=a, vicen=v, vsnon=s, Tsfcn=t, apnd=p, hpnd=h,
                    **dedd_kw))(aicen, vicen, vsnon, Tsfcn, apnd_r,
                                hpnd_r)
        from cice5_tpu.models.radiation.ccsm3 import Albedos, AbsorbedSolar
        zc = jnp.zeros_like(aicen)
        alb = Albedos(alvdrn=de.alvdrn, alidrn=de.alidrn, alvdfn=de.alvdfn,
                      alidfn=de.alidfn, alvdrni=de.alvdrn,
                      alidrni=de.alidrn, alvdfni=de.alvdfn,
                      alidfni=de.alidfn, alvdrns=zc, alidrns=zc,
                      alvdfns=zc, alidfns=zc, albin=de.albicen,
                      albsn=de.albsnon)
        absr = AbsorbedSolar(fswsfc=de.fswsfcn, fswint=de.fswintn,
                             fswthru=de.fswthrun, Iswabs=de.Iswabsn,
                             fswpenl=de.fswpenln)
        Sswabsn = de.Sswabsn
        albpndn = de.albpndn
        snowfracn = de.snowfracn
    else:
        def rad_one(aic, vic, vsn, tsf):
            return shortwave_ccsm3(
                aic, vic, vsn, tsf, forcing.swvdr, forcing.swvdf,
                forcing.swidr, forcing.swidf, nilyr=nilyr,
                albedo_type=sw.albedo_type, albicev=sw.albicev,
                albicei=sw.albicei, albsnowv=sw.albsnowv,
                albsnowi=sw.albsnowi, ahmax=sw.ahmax,
                heat_capacity=cfg.thermo.ktherm != 0)

        with jax.named_scope("sw_radiation_ccsm3"):
            alb, absr = jax.vmap(rad_one)(aicen, vicen, vsnon, Tsfcn)
        Sswabsn = jnp.zeros((ncat, nslyr, *B), dtype)
        albpndn = jnp.zeros_like(aicen)   # no pond albedo in CCSM3
        # CCSM3 snow patchiness fraction (compute_albedos asnow)
        hs_r = jnp.where(aicen > ct.puny,
                         vsnon / jnp.maximum(aicen, ct.puny), 0.0)
        snowfracn = jnp.where(aicen > ct.puny,
                              hs_r / (hs_r + ct.snowpatch), 0.0)


    return RadOut(alb=alb, absr=absr, Sswabsn=Sswabsn, albpndn=albpndn,
                  snowfracn=snowfracn)



def prefill_radiation(state, forcing, cfg, tr):
    """Seed the coupled-ordering radiation memory from the initial state
    (init_shortwave, ice_shortwave.F90:164, called from cice_init —
    without it the first coupled step would run thermo with zero SW)."""
    rad = _step_radiation(state.aicen, state.vicen, state.vsnon,
                          state.trcrn, forcing, cfg, tr)
    rad_prev = jnp.concatenate(
        [rad.absr.fswsfc[:, None], rad.absr.fswint[:, None],
         rad.absr.fswthru[:, None], rad.Sswabsn, rad.absr.Iswabs], axis=1)
    rad_alb = jnp.stack(
        [jnp.sum(state.aicen * rad.alb.alvdrn, 0),
         jnp.sum(state.aicen * rad.alb.alvdfn, 0),
         jnp.sum(state.aicen * rad.alb.alidrn, 0),
         jnp.sum(state.aicen * rad.alb.alidfn, 0)])
    scale_factor = (forcing.swvdr * (1.0 - rad_alb[0])
                    + forcing.swvdf * (1.0 - rad_alb[1])
                    + forcing.swidr * (1.0 - rad_alb[2])
                    + forcing.swidf * (1.0 - rad_alb[3]))
    return state.replace(rad_prev=rad_prev, rad_alb=rad_alb,
                         scale_factor=scale_factor)


class ColState(NamedTuple):
    """The slice of State the column physics reads (possibly packed)."""
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    trcrn: jnp.ndarray
    first_ice: jnp.ndarray
    strocnxT: jnp.ndarray
    strocnyT: jnp.ndarray
    scale_factor: jnp.ndarray
    rad_prev: jnp.ndarray    # (ncat, nrad, *B) last step's SW absorption
    rad_alb: jnp.ndarray     # (4, *B) last step's ice-only cell albedos


def _column_physics(state: ColState, forcing: Forcing, *, sst, frzmlt,
                    uice_T, vice_T, tmask, ULAT, salinz, cfg: ModelConfig,
                    tr: TracerRegistry, hin_max):
    """Pre-dynamics column physics: radiation, ABL + vertical thermo,
    optional tracers, BGC, and step_therm2 ITD evolution
    (ice_step_mod.F90 step_therm1/step_therm2). Batch-shape polymorphic:
    every input array trails the same batch dims B — either the dense
    (ny, nx) grid or a ColumnPacking's packed (rows, LANE) ocean batch.

    Returns (stout, dg, sc): state-like arrays (scattered over their
    dense originals), diagnostic fields (scattered over zeros), and
    batch-invariant scalars."""
    dt = cfg.time.dt
    ncat, nilyr, nslyr = cfg.ncat, cfg.nilyr, cfg.nslyr
    dtype = state.aicen.dtype

    aicen, vicen, vsnon, trcrn = (state.aicen, state.vicen, state.vsnon,
                                  state.trcrn)
    B = aicen.shape[1:]
    Tsfcn = trcrn[:, tr.nt_Tsfc]
    zqin = trcrn[:, tr.nt_qice:tr.nt_qice + nilyr]
    zSin = trcrn[:, tr.nt_sice:tr.nt_sice + nilyr]
    zqsn = trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr]

    agg0 = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
    aice = agg0.aice

    # form drag (ice_atmo.F90:644 neutral_drag_coeffs; formdrag namelist)
    if cfg.forcing.formdrag:
        from cice5_tpu.models.formdrag import neutral_drag_coeffs
        fdkw = {}
        if tr.nt_apnd >= 0:
            fdkw.update(apnd=trcrn[:, tr.nt_apnd],
                        hpnd=trcrn[:, tr.nt_hpnd])
            if tr.nt_ipnd >= 0:
                fdkw.update(ipnd=trcrn[:, tr.nt_ipnd])
        if tr.nt_alvl >= 0:
            fdkw.update(alvl=trcrn[:, tr.nt_alvl],
                        vlvl=trcrn[:, tr.nt_vlvl])
        fd = neutral_drag_coeffs(aice=aice, vice=agg0.vice, vsno=agg0.vsno,
                                 aicen=aicen, vicen=vicen, **fdkw)
        Cdn_atm = fd.Cdn_atm
        Cw_ocn = fd.Cdn_ocn
        # full drag-diagnostic stack for history (DRAG_KEYS order)
        drag_stack = jnp.stack([getattr(fd, k) for k in DRAG_KEYS])
    else:
        Cdn_atm = None
        Cw_ocn = ct.dragio
        drag_stack = None

    Tf = forcing.Tf

    # ---------------- radiation per category via vmap -------------------
    if cfg.coupled_radiation:
        # prep_radiation ordering (ice_step_mod.F90:33-154): thermo runs
        # on LAST step's per-category SW absorption, rescaled by the
        # ratio of this step's net absorbed SW (previous ice albedos
        # applied to the new incoming SW) to last step's (scale_factor,
        # carried in State). The radiation proper runs at the END of the
        # step (step_radiation after dynamics) — see step() below.
        al = state.rad_alb                       # (4, *B) prev ice albedos
        netsw = (forcing.swvdr * (1.0 - al[0])
                 + forcing.swvdf * (1.0 - al[1])
                 + forcing.swidr * (1.0 - al[2])
                 + forcing.swidf * (1.0 - al[3]))
        sfac = jnp.where((aice > 0.0) & (state.scale_factor > ct.puny),
                         netsw / jnp.maximum(state.scale_factor, ct.puny),
                         1.0)
        rp = state.rad_prev * sfac[None, None]   # (ncat, nrad, *B)
        from cice5_tpu.models.radiation.ccsm3 import (Albedos,
                                                      AbsorbedSolar)
        absr = AbsorbedSolar(
            fswsfc=rp[:, 0], fswint=rp[:, 1], fswthru=rp[:, 2],
            Iswabs=rp[:, 3 + nslyr:3 + nslyr + nilyr],
            fswpenl=jnp.zeros((ncat, nilyr + 1) + B, dtype))
        Sswabsn = rp[:, 3:3 + nslyr]
        zc = jnp.zeros_like(aicen)
        # per-category albedos/snow fraction are produced by the
        # end-of-step radiation in step(); zeros here are placeholders
        # overwritten in dg before the diag is built
        alb = Albedos(alvdrn=zc, alidrn=zc, alvdfn=zc, alidfn=zc,
                      alvdrni=zc, alidrni=zc, alvdfni=zc, alidfni=zc,
                      alvdrns=zc, alidrns=zc, alvdfns=zc, alidfns=zc,
                      albin=zc, albsn=zc)
        albpndn = zc
        snowfracn = zc
    else:
        alb, absr, Sswabsn, albpndn, snowfracn = _step_radiation(
            aicen, vicen, vsnon, trcrn, forcing, cfg, tr)

    # ---------------- bottom flux & lateral melt potential --------------
    qicen_tot = jnp.sum(zqin, axis=1) * vicen / nilyr      # (ncat, ny, nx)
    qsnon_tot = jnp.sum(zqsn, axis=1) * vsnon / nslyr
    Tbot, fbot, rside = vertical.frzmlt_bottom_lateral(
        dt, aice, frzmlt, vicen, vsnon, qicen_tot, qsnon_tot, sst, Tf,
        state.strocnxT, state.strocnyT, ustar_min=cfg.thermo.ustar_min,
        Cdn_ocn=(Cw_ocn if cfg.thermo.fbot_xfer_type == "Cdn_ocn"
                 else None))

    # ---------------- per-category ABL + vertical thermo (vmap) ---------
    def therm_one(aic, vic, vsn, tsf, zqi, zqs, zsi, fswsfc, fswint, Iswabs,
                  Sswabs, hpnd_in, apnd_in, fsf=None, fct=None, flt=None,
                  fsn=None):
        if cfg.forcing.atmbndy == "constant":
            abl = atmo.atmo_boundary_const(
                sfctype="ice", Tsf=tsf, potT=forcing.potT, uatm=forcing.uatm,
                vatm=forcing.vatm, wind=forcing.wind, Qa=forcing.Qa,
                rhoa=forcing.rhoa)
        else:
            abl = atmo.atmo_boundary_layer(
                sfctype="ice", Tsf=tsf, potT=forcing.potT, uatm=forcing.uatm,
                vatm=forcing.vatm, wind=forcing.wind, zlvl=forcing.zlvl,
                Qa=forcing.Qa, rhoa=forcing.rhoa,
                natmiter=cfg.forcing.natmiter, Cdn_atm=Cdn_atm,
                highfreq=cfg.forcing.highfreq, uice=uice_T, vice=vice_T)
        res = vertical.thermo_vertical(
            dt, cfg, aicen=aic, vicen=vic, vsnon=vsn, Tsfcn=tsf,
            zqin=zqi, zqsn=zqs, zSin=zsi,
            flw=forcing.flw, potT=forcing.potT, Qa=forcing.Qa,
            rhoa=forcing.rhoa, fsnow=forcing.fsnow,
            shcoef=abl.shcoef, lhcoef=abl.lhcoef,
            fswsfc=fswsfc, fswint=fswint, Sswabs=Sswabs, Iswabs=Iswabs,
            fbot=fbot, Tbot=Tbot, sss=forcing.sss, hpond=hpnd_in,
            apond=apnd_in, fsurfn_f=fsf, fcondtopn_f=fct, flatn_f=flt,
            fsensn_f=fsn)
        return res, abl.strx, abl.stry, (abl.Tref, abl.Qref, abl.Uref)

    if cfg.tracers.tr_pond and cfg.thermo.ktherm == 2:
        hpnd_all = trcrn[:, tr.nt_hpnd]
        apnd_all = trcrn[:, tr.nt_apnd]
        if cfg.tracers.tr_pond_lvl:
            apnd_all = apnd_all * trcrn[:, tr.nt_alvl]
    else:
        hpnd_all = jnp.zeros_like(aicen)
        apnd_all = jnp.zeros_like(aicen)

    if cfg.thermo.calc_Tsfc:
        def therm_wrap(aic, vic, vsn, tsf, zqi, zqs, zsi, fswsfc, fswint,
                       Iswabs, Sswabs, hpnd_in, apnd_in):
            return therm_one(aic, vic, vsn, tsf, zqi, zqs, zsi, fswsfc,
                             fswint, Iswabs, Sswabs, hpnd_in, apnd_in)

        with jax.named_scope("vertical_thermo"):
            tres, strairxn, strairyn, refn = jax.vmap(therm_wrap)(
                aicen, vicen, vsnon, Tsfcn, zqin, zqsn, zSin,
                absr.fswsfc, absr.fswint, absr.Iswabs, Sswabsn, hpnd_all,
                apnd_all)
    else:
        # coupled mode: per-category surface fluxes from the coupler
        # (set_sfcflux, ice_flux.F90:1015)
        tres, strairxn, strairyn, refn = jax.vmap(therm_one)(
            aicen, vicen, vsnon, Tsfcn, zqin, zqsn, zSin,
            absr.fswsfc, absr.fswint, absr.Iswabs, Sswabsn, hpnd_all,
            apnd_all, forcing.fsurfn_f, forcing.fcondtopn_f,
            forcing.flatn_f, forcing.fsensn_f)

    # merge per-category fluxes with pre-thermo areas (merge_fluxes,
    # ice_flux.F90:681; thermo does not change aicen except melt-out)
    w = aicen
    mrg = lambda x: jnp.sum(w * x, axis=0)
    fsens = mrg(tres.fsensn)
    flat = mrg(tres.flatn)
    flwout = mrg(tres.flwoutn)
    evap = mrg(tres.evapn)
    fresh = mrg(tres.freshn)
    fsalt = mrg(tres.fsaltn)
    fhocn = mrg(tres.fhocnn)
    fswthru = mrg(absr.fswthru)
    fswabs = mrg(absr.fswsfc + absr.fswint + absr.fswthru)
    strairxT = mrg(strairxn)      # stress weighted by ice area
    strairyT = mrg(strairyn)
    meltt = mrg(tres.meltt)
    melts = mrg(tres.melts)
    meltb = mrg(tres.meltb)
    congel = mrg(tres.congel)
    snoice = mrg(tres.snoice)
    fsurf_d = mrg(tres.fsurfn)
    fcondtop_d = mrg(tres.fcondtopn)
    # 2-m/10-m reference diagnostics (f_Tref/f_Qref/f_Uref accumulation,
    # ice_step_mod.F90 Tref = Tref + Trefn*aicen)
    Tref_d = mrg(refn[0])
    Qref_d = mrg(refn[1])
    Uref_d = mrg(refn[2])
    # per-surface broadband albedos + interior SW + snow depth change
    # (f_albice/f_albsno/f_albpnd/f_fswint_ai/f_dsnow history fields)
    albice_d = mrg(alb.albin)
    albsno_d = mrg(alb.albsn)
    albpnd_d = mrg(albpndn)
    fswint_d = mrg(absr.fswint)
    dsnow_d = mrg(tres.dsnow)

    aicen = tres.aicen
    vicen = tres.vicen
    vsnon = tres.vsnon
    # single contiguous tracer-block write when the registry is laid out
    # [Tsfc | qice | sice | qsno] (it is, by construction): four separate
    # block writes each copy the full ~56 MB trcrn array at gx1 size —
    # one block set is one copy (set_trc = explicit DUS; .at[:, a:b].set
    # lowers to a layout-pinning scatter, ops/blockwrite.py)
    if (tr.nt_qice == tr.nt_Tsfc + 1
            and tr.nt_sice == tr.nt_qice + nilyr
            and tr.nt_qsno == tr.nt_sice + nilyr):
        zS_new = tres.zSin if cfg.thermo.ktherm == 2 else zSin
        blk = jnp.concatenate([tres.Tsf[:, None], tres.zqin, zS_new,
                               tres.zqsn], axis=1)
        trcrn = set_trc(trcrn, tr.nt_Tsfc, blk)
    else:
        trcrn = set_trc(trcrn, tr.nt_Tsfc, tres.Tsf)
        trcrn = set_trc(trcrn, tr.nt_qice, tres.zqin)
        trcrn = set_trc(trcrn, tr.nt_qsno, tres.zqsn)
        if cfg.thermo.ktherm == 2:
            trcrn = set_trc(trcrn, tr.nt_sice, tres.zSin)

    # ---------------- optional tracers (step_therm1 tail) ----------------
    tcfg = cfg.tracers
    if tcfg.tr_iage:
        from cice5_tpu.models.tracers.simple import increment_age
        trcrn = set_trc(trcrn, tr.nt_iage,
                        increment_age(dt, trcrn[:, tr.nt_iage], aicen))
    if tcfg.tr_FY:
        from cice5_tpu.models.tracers.simple import update_FYarea
        nhmask = ULAT >= 0.0
        trcrn = set_trc(trcrn, tr.nt_FY,
                        update_FYarea(dt, forcing.yday, trcrn[:, tr.nt_FY],
                                      aicen, nhmask[None]))
    if tcfg.tr_aero:
        # aerosol column update (ice_step_mod.F90:576-600 -> update_aerosol)
        from cice5_tpu.models.tracers.aerosol import (faero_default,
                                                      update_aerosol)
        na = tcfg.n_aero
        a0 = tr.nt_aero
        # (ncat, na, 2, ny, nx) snow and ice stacks from the tracer array
        asno = jnp.stack(
            [trcrn[:, a0 + 4 * k:a0 + 4 * k + 2] for k in range(na)], axis=1)
        aice_st = jnp.stack(
            [trcrn[:, a0 + 4 * k + 2:a0 + 4 * k + 4] for k in range(na)],
            axis=1)
        # -> (na, 2, ncat, ny, nx) so species lead and ncat is a batch dim
        asno = jnp.moveaxis(asno, 0, 2)
        aice_st = jnp.moveaxis(aice_st, 0, 2)
        faero_atm = (forcing.faero_atm if forcing.faero_atm is not None
                     else faero_default(na, B, dtype))
        ares = update_aerosol(
            dt, meltt=tres.meltt, melts=tres.melts, meltb=tres.meltb,
            congel=tres.congel, snoice=tres.snoice,
            fsnow=forcing.fsnow[None],
            aerosno=asno, aeroice=aice_st,
            aice_old=state.aicen, vice_old=state.vicen,
            vsno_old=state.vsnon, aicen=aicen, vicen=vicen, vsnon=vsnon,
            faero_atm=faero_atm[:, None], nilyr=nilyr, nslyr=nslyr)
        for k in range(na):
            trcrn = set_trc(trcrn, a0 + 4 * k,
                            jnp.moveaxis(ares.aerosno[k], 1, 0))
            trcrn = set_trc(trcrn, a0 + 4 * k + 2,
                            jnp.moveaxis(ares.aeroice[k], 1, 0))
        faero_ocn = jnp.sum(ares.faero_ocn, axis=1)   # sum over categories

    fpond_step = jnp.zeros(B, dtype)   # pond water volume change (m)
    if tcfg.tr_pond:
        def _pond_volume(tc, an):
            v = tc[:, tr.nt_apnd] * tc[:, tr.nt_hpnd] * an
            if tcfg.tr_pond_lvl:
                v = v * tc[:, tr.nt_alvl]
            return jnp.sum(v, axis=0)
        fpond_step = -_pond_volume(trcrn, aicen)
        rfrac = tcfg.rfracmin + (tcfg.rfracmax - tcfg.rfracmin) * aice
        if tcfg.tr_pond_cesm:
            from cice5_tpu.models.tracers.ponds import compute_ponds_cesm
            ap, hp = compute_ponds_cesm(
                dt, aicen=aicen, vicen=vicen, vsnon=vsnon, Tsfcn=tres.Tsf,
                apnd=trcrn[:, tr.nt_apnd], hpnd=trcrn[:, tr.nt_hpnd],
                meltt=tres.meltt, melts=tres.melts, frain=forcing.frain,
                rfrac=rfrac[None], pndaspect=tcfg.pndaspect)
            trcrn = set_trc(trcrn, tr.nt_apnd, ap)
            trcrn = set_trc(trcrn, tr.nt_hpnd, hp)
        elif tcfg.tr_pond_lvl:
            from cice5_tpu.models.tracers.ponds import compute_ponds_lvl
            pr = compute_ponds_lvl(
                dt, aicen=aicen, vicen=vicen, vsnon=vsnon, Tsfcn=tres.Tsf,
                alvl=trcrn[:, tr.nt_alvl], apnd=trcrn[:, tr.nt_apnd],
                hpnd=trcrn[:, tr.nt_hpnd], ipnd=trcrn[:, tr.nt_ipnd],
                meltt=tres.meltt, melts=tres.melts, frain=forcing.frain,
                rfrac=rfrac[None], Tair=forcing.Tair, fsurfn=tres.fsurfn,
                dhs=tres.dsnow,
                qicen=jnp.moveaxis(tres.zqin, 1, 0),
                sicen=jnp.moveaxis(zSin, 1, 0),
                pndaspect=tcfg.pndaspect, frzpnd=tcfg.frzpnd,
                dpscale=tcfg.dpscale, ktherm=cfg.thermo.ktherm)
            if tr.nt_ipnd == tr.nt_hpnd + 1 == tr.nt_apnd + 2:
                trcrn = set_trc(trcrn, tr.nt_apnd,
                                jnp.stack([pr.apnd, pr.hpnd, pr.ipnd],
                                          axis=1))
            else:
                trcrn = set_trc(trcrn, tr.nt_apnd, pr.apnd)
                trcrn = set_trc(trcrn, tr.nt_hpnd, pr.hpnd)
                trcrn = set_trc(trcrn, tr.nt_ipnd, pr.ipnd)
        elif tcfg.tr_pond_topo:
            # cell meltwater first feeds the ponds (fpond source terms from
            # compute_ponds_cesm-style accumulation happen inside the topo
            # scheme via the meltt/volp plumbing, ice_step_mod.F90:713-731)
            from cice5_tpu.models.tracers.ponds import compute_ponds_topo
            fsurf_cell = mrg(tres.fsurfn)
            pt = compute_ponds_topo(
                dt, aice=agg0.aice, aicen=aicen, vice=agg0.vice,
                vicen=vicen, vsno=agg0.vsno, vsnon=vsnon,
                meltt=meltt, fsurf=fsurf_cell, Tsfcn=tres.Tsf,
                Tf=Tf, qicen=jnp.moveaxis(tres.zqin, 1, 0),
                sicen=jnp.moveaxis(
                    tres.zSin if cfg.thermo.ktherm == 2 else zSin, 1, 0),
                apnd=trcrn[:, tr.nt_apnd], hpnd=trcrn[:, tr.nt_hpnd],
                ipnd=trcrn[:, tr.nt_ipnd], ktherm=cfg.thermo.ktherm,
                heat_capacity=cfg.thermo.ktherm != 0)
            if tr.nt_ipnd == tr.nt_hpnd + 1 == tr.nt_apnd + 2:
                trcrn = set_trc(trcrn, tr.nt_apnd,
                                jnp.stack([pt.apnd, pt.hpnd, pt.ipnd],
                                          axis=1))
            else:
                trcrn = set_trc(trcrn, tr.nt_apnd, pt.apnd)
                trcrn = set_trc(trcrn, tr.nt_hpnd, pt.hpnd)
                trcrn = set_trc(trcrn, tr.nt_ipnd, pt.ipnd)
        # net water captured by ponds this step, the fpond accumulator
        # (ice_flux.F90 fpond; schemes mirror every pond source/sink there)
        fpond_step = fpond_step + _pond_volume(trcrn, aicen)

    # ---------------- biogeochemistry (CICE_RunMod.F90:179) --------------
    first_ice = state.first_ice
    if tcfg.tr_brine or tcfg.skl_bgc:
        from cice5_tpu.models.tracers import algae, brine
        aicen_i, vicen_i = state.aicen, state.vicen
        hin_old_c = jnp.where(aicen_i > ct.puny,
                              vicen_i / jnp.maximum(aicen_i, ct.puny), 0.0)
        first_ice = jnp.where(aicen_i > ct.puny, first_ice, 1.0)

        if tcfg.tr_brine:
            fbri = trcrn[:, tr.nt_fbri]
            fbri = jnp.where(aicen_i > ct.puny, fbri, 1.0)
            pf = brine.preflushing_changes(
                aicen=aicen, vicen=vicen, vsnon=vsnon,
                meltb=tres.meltb, meltt=tres.meltt, congel=tres.congel,
                snoice=tres.snoice, hice_old=hin_old_c, fbri=fbri,
                first_ice=first_ice)
            ms = brine.compute_microS_mushy(
                jnp.moveaxis(trcrn[:, tr.nt_sice:tr.nt_sice + nilyr], 1, -1),
                jnp.moveaxis(trcrn[:, tr.nt_qice:tr.nt_qice + nilyr], 1, -1),
                pf.hin_old, pf.hbr_old,
                jnp.broadcast_to(forcing.sss, aicen.shape),
                jnp.broadcast_to(sst, aicen.shape), nblyr=cfg.nilyr)
            hb = brine.update_hbrine(
                dt, meltb=tres.meltb, meltt=tres.meltt, melts=tres.melts,
                hin=pf.hin, hsn=pf.hsn, hin_old=pf.hin_old,
                hbr_old=jnp.minimum(pf.hbr_old, brine.MAXHBR * pf.hin_old),
                dhS_top=pf.dhbr_top, dhS_bottom=pf.dhbr_bot,
                kperm=ms.kperm, zphi_min=ms.zphi_min)
            trcrn = set_trc(trcrn, tr.nt_fbri,
                            jnp.where(aicen > ct.puny, hb.fbri, pf.fbri))

        if tcfg.skl_bgc:
            b0 = tr.nt_bgc[0]
            nb = tr.nbtrcr
            conc = jnp.moveaxis(trcrn[:, b0:b0 + nb], 1, 0)  # (nb, ncat,...)
            ob_flat = (forcing.ocean_bio if forcing.ocean_bio is not None
                       else algae.default_ocean_bio(tr, B, dtype))
            ob = ob_flat[:, None]
            sk = algae.skl_biogeochemistry(
                dt, tr, conc=conc, ocean_bio=ob, aicen=aicen,
                meltb=tres.meltb, congel=tres.congel,
                fswthru=absr.fswthru, first_ice=first_ice,
                flux_type=tcfg.bgc_flux_type)
            trcrn = set_trc(trcrn, b0, jnp.moveaxis(sk.conc, 0, 1))
            # merge to cell means (ice_zbgc.F90:770-840)
            flux_bio = jnp.sum(sk.flux_bio * aicen[None], axis=1)
            iN = list(tr.bgc_names).index("N")
            R_gC2molC = 12.01
            PP_net = jnp.sum(
                sk.conc[iN] * algae.PHI_SK * sk.grow_N
                * (1.0 - algae.FR_RESP) * algae.R_C2N * R_gC2molC * aicen,
                axis=0)
            grow_net = jnp.sum(sk.grow_N * algae.PHI_SK * aicen, axis=0)
        first_ice = jnp.where(aicen > ct.puny, 0.0, 1.0)

    # ---------------- step_therm2: ITD evolution -------------------------
    aicen_init_itd = state.aicen       # pre-thermo, for linear_itd
    vicen_init_itd = state.vicen
    itd_bad = jnp.zeros((), jnp.int32)
    if cfg.kitd == 1:
        if cfg.dyn.conserv_check:
            pre_sums = itd.itd_conservation_sums(tr, nilyr, nslyr, aicen,
                                                 vicen, vsnon, trcrn)
        aicen, vicen, vsnon, trcrn = itd.linear_itd(
            tr, hin_max, nslyr, aicen_init=aicen_init_itd,
            vicen_init=vicen_init_itd, aicen=aicen, vicen=vicen,
            vsnon=vsnon, trcrn=trcrn)
        if cfg.dyn.conserv_check:
            # the reference's l_stop abort on a linear_itd conservation
            # violation (ice_therm_itd.F90:783-860); folded into the
            # in-step failure counter below
            post_sums = itd.itd_conservation_sums(tr, nilyr, nslyr, aicen,
                                                  vicen, vsnon, trcrn)
            itd_bad = itd_bad + itd.itd_conservation_check(pre_sums,
                                                           post_sums)

    agg1 = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
    nir = itd.add_new_ice(dt, tr, hin_max, nilyr, aicen=aicen, vicen=vicen,
                          trcrn=trcrn, aice=agg1.aice, aice0=agg1.aice0,
                          frzmlt=frzmlt, Tf=Tf, salinz=salinz,
                          tr_FY=cfg.tracers.tr_FY, tr_lvl=cfg.tracers.tr_lvl,
                          tr_iage=cfg.tracers.tr_iage,
                          update_ocn_f=cfg.forcing.update_ocn_f,
                          ktherm=cfg.thermo.ktherm, sss=forcing.sss,
                          phi_init=cfg.thermo.phi_init,
                          dSin0_frazil=cfg.thermo.dSin0_frazil,
                          hfrazilmin=cfg.thermo.hfrazilmin,
                          tr_brine=tcfg.tr_brine,
                          ocean_bio=ob_flat if tcfg.skl_bgc else None,
                          initbio_frac=tcfg.initbio_frac)
    aicen, vicen, trcrn = nir.aicen, nir.vicen, nir.trcrn
    frazil = nir.frazil
    fresh = fresh + nir.dfresh
    fsalt = fsalt + nir.dfsalt
    if tcfg.skl_bgc:
        # frazil BGC uptake from the ocean (add_new_ice_bgc,
        # ice_zbgc.F90:988-999)
        flux_bio = flux_bio + nir.flux_bio

    lm = itd.lateral_melt(dt, tr, nilyr, nslyr, aicen=aicen, vicen=vicen,
                          vsnon=vsnon, trcrn=trcrn, rside=rside,
                          tr_pond_topo=tcfg.tr_pond_topo)
    aicen, vicen, vsnon = lm.aicen, lm.vicen, lm.vsnon
    fresh = fresh + lm.fresh
    fsalt = fsalt + lm.fsalt
    fhocn = fhocn + lm.fhocn
    meltl = lm.meltl

    with jax.named_scope("cleanup_itd"):
        cl = itd.cleanup_itd(dt, tr, hin_max, nilyr, nslyr, aicen=aicen,
                             vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                             tr_pond_topo=tcfg.tr_pond_topo)
    aicen, vicen, vsnon, trcrn = cl.aicen, cl.vicen, cl.vsnon, cl.trcrn
    fresh = fresh + cl.dfresh
    fsalt = fsalt + cl.dfsalt
    fhocn = fhocn + cl.dfhocn
    # zap/lateral-melt conservation bookkeeping for the optional tracers
    # (ice_itd.F90:1741-1750, ice_therm_itd.F90:1146-1212)
    if tcfg.tr_pond_topo:
        fpond_step = fpond_step - lm.dfpond - cl.dfpond
    if tcfg.tr_aero:
        faero_ocn = faero_ocn + lm.dfaero + cl.dfaero
    if tcfg.skl_bgc:
        flux_bio = flux_bio + lm.dflux_bio + cl.dflux_bio
    if tcfg.tr_brine or tcfg.skl_bgc:
        # zapped categories restart as "first ice" so brine/BGC re-seed
        # (ice_itd.F90:2013-2017)
        first_ice = jnp.where(cl.zapped, 1.0, first_ice)

    # land mask enforcement
    aicen = jnp.where(tmask[None], aicen, 0.0)
    vicen = jnp.where(tmask[None], vicen, 0.0)
    vsnon = jnp.where(tmask[None], vsnon, 0.0)

    stout = dict(aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                 first_ice=first_ice)
    dg = dict(fsens=fsens, flat=flat, flwout=flwout, evap=evap,
              fresh=fresh, fsalt=fsalt, fhocn=fhocn, fswthru=fswthru,
              fswabs=fswabs, strairxT=strairxT, strairyT=strairyT,
              meltt=meltt, melts=melts, meltb=meltb, congel=congel,
              snoice=snoice, frazil=frazil, meltl=meltl,
              fpond_step=fpond_step, fsurf=fsurf_d, fcondtop=fcondtop_d,
              Tref=Tref_d, Qref=Qref_d, Uref=Uref_d, albice=albice_d,
              albsno=albsno_d, albpnd=albpnd_d, fswint=fswint_d,
              dsnow=dsnow_d, aice_pre=agg0.aice, vice_pre=agg0.vice,
              alvdrn=alb.alvdrn, alvdfn=alb.alvdfn, alidrn=alb.alidrn,
              alidfn=alb.alidfn, snowfracn=snowfracn,
              fsurfn_ai=w * tres.fsurfn, flatn_ai=w * tres.flatn,
              fsensn_ai=w * tres.fsensn,
              fmelttn_ai=w * jnp.maximum(tres.fsurfn - tres.fcondtopn,
                                         0.0),
              fcondtopn_ai=w * tres.fcondtopn)
    if cfg.forcing.formdrag:
        dg["Cw_ocn"] = Cw_ocn
        dg["drag"] = drag_stack
    if tcfg.tr_aero:
        dg["faero_ocn"] = faero_ocn
    if tcfg.skl_bgc:
        dg["flux_bio"] = flux_bio
        dg["PP_net"] = PP_net
        dg["grow_net"] = grow_net
    sc = dict(itd_bad=itd_bad,
              therm_converged=jnp.all(tres.converged),
              ferr_max=jnp.max(tres.ferr))
    return stout, dg, sc


def step(state: State, forcing: Forcing, grid: Grid, cfg: ModelConfig,
         tr: TracerRegistry, topo: Topology, hin_max, salinz,
         packing: ColumnPacking | None = None) -> tuple[State, StepDiag]:
    """Advance the sea-ice state by one thermo step (cfg.time.dt)."""
    dt = cfg.time.dt
    ncat, nilyr, nslyr = cfg.ncat, cfg.nilyr, cfg.nslyr
    ny, nx = grid.shape
    dtype = state.aicen.dtype
    tmask = grid.tmask
    tcfg = cfg.tracers

    # pre-column 2-D prep (fields the column section consumes)
    sst = state.sst if cfg.forcing.oceanmixed_ice else forcing.sst
    sst = jnp.maximum(sst, forcing.Tf)
    frzmlt = state.frzmlt if cfg.forcing.oceanmixed_ice else forcing.frzmlt
    # high-frequency (RASM) coupling uses winds relative to the ice drift
    # at T points (ice_atmo.F90:220-227; Roberts et al 2014)
    if cfg.forcing.highfreq:
        uice_T = dyn.to_tgrid(state.uvel, grid, topo)
        vice_T = dyn.to_tgrid(state.vvel, grid, topo)
    else:
        uice_T = vice_T = None

    colin = dict(
        state=ColState(aicen=state.aicen, vicen=state.vicen,
                       vsnon=state.vsnon, trcrn=state.trcrn,
                       first_ice=state.first_ice,
                       strocnxT=state.strocnxT, strocnyT=state.strocnyT,
                       scale_factor=state.scale_factor,
                       rad_prev=state.rad_prev, rad_alb=state.rad_alb),
        forcing=forcing, sst=sst, frzmlt=frzmlt, uice_T=uice_T,
        vice_T=vice_T, tmask=tmask, ULAT=jnp.asarray(grid.ULAT),
        salinz=salinz)
    if packing is not None:
        # pack ocean columns: skip land cells through the whole column
        # section (the reference's compressed index lists, §ColumnPacking)
        colin = jax.tree_util.tree_map(
            lambda x: _gather_cols(x, packing.gidx)
            if (hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[-2:] == (ny, nx)) else x, colin)
    stout, dg, sc = _column_physics(
        colin["state"], colin["forcing"], sst=colin["sst"],
        frzmlt=colin["frzmlt"], uice_T=colin["uice_T"],
        vice_T=colin["vice_T"], tmask=colin["tmask"], ULAT=colin["ULAT"],
        salinz=colin["salinz"], cfg=cfg, tr=tr, hin_max=hin_max)
    if packing is not None:
        base = dict(aicen=state.aicen, vicen=state.vicen,
                    vsnon=state.vsnon, trcrn=state.trcrn,
                    first_ice=state.first_ice)
        stout = {k: _scatter_cols(v, packing.sidx, base[k])
                 for k, v in stout.items()}
        dg = {k: _scatter_cols(v, packing.sidx,
                               jnp.zeros((*v.shape[:-2], ny, nx), v.dtype))
              for k, v in dg.items()}

    aicen, vicen, vsnon = stout["aicen"], stout["vicen"], stout["vsnon"]
    trcrn = stout["trcrn"]
    first_ice = stout["first_ice"]
    (fsens, flat, flwout, evap, fresh, fsalt, fhocn, fswthru, fswabs,
     strairxT, strairyT, meltt, melts, meltb, congel, snoice, frazil,
     meltl, fpond_step) = (dg[k] for k in (
         "fsens", "flat", "flwout", "evap", "fresh", "fsalt", "fhocn",
         "fswthru", "fswabs", "strairxT", "strairyT", "meltt", "melts",
         "meltb", "congel", "snoice", "frazil", "meltl", "fpond_step"))
    fsurf_d, fcondtop_d = dg["fsurf"], dg["fcondtop"]
    Tref_d, Qref_d, Uref_d = dg["Tref"], dg["Qref"], dg["Uref"]
    albice_d, albsno_d, albpnd_d = (dg["albice"], dg["albsno"],
                                    dg["albpnd"])
    fswint_d, dsnow_d = dg["fswint"], dg["dsnow"]
    snowfracn = dg["snowfracn"]
    Cw_ocn = dg["Cw_ocn"] if cfg.forcing.formdrag else ct.dragio
    itd_bad = sc["itd_bad"]

    # ---------------- dynamics: EVP + transport + ridging ---------------
    uvel, vvel = state.uvel, state.vvel
    stressp, stressm, stress12 = state.stressp, state.stressm, state.stress12
    iceumask = state.iceumask
    a11n, a12n = state.a11n, state.a12n
    strocnxT, strocnyT = state.strocnxT, state.strocnyT
    divu = jnp.zeros((ny, nx), dtype)
    shear_d = jnp.zeros((ny, nx), dtype)
    opening_d = jnp.zeros((ny, nx), dtype)
    n_rdgn = 9 if cfg.dyn.diag_mechred else 0
    rdgn_d = jnp.zeros((n_rdgn, ncat, ny, nx), dtype)
    dardg1dt = jnp.zeros((ny, nx), dtype)
    dardg2dt = jnp.zeros((ny, nx), dtype)
    dvirdgdt = jnp.zeros((ny, nx), dtype)

    conserv_err = jnp.zeros((), dtype)
    mono_bad = jnp.zeros((), jnp.int32)
    strength_d = jnp.zeros((ny, nx), dtype)
    prs_sig_d = jnp.zeros((ny, nx), dtype)
    strintx_d = jnp.zeros((ny, nx), dtype)
    strinty_d = jnp.zeros((ny, nx), dtype)
    strtltx_d = jnp.zeros((ny, nx), dtype)
    strtlty_d = jnp.zeros((ny, nx), dtype)
    strcorx_d = jnp.zeros((ny, nx), dtype)
    strcory_d = jnp.zeros((ny, nx), dtype)
    e11_d = jnp.zeros((ny, nx), dtype)
    e12_d = jnp.zeros((ny, nx), dtype)
    e22_d = jnp.zeros((ny, nx), dtype)
    ys11_d = jnp.zeros((ny, nx), dtype)
    ys12_d = jnp.zeros((ny, nx), dtype)
    ys22_d = jnp.zeros((ny, nx), dtype)

    def _mean_age(an, tc):
        if not cfg.tracers.tr_iage:
            return jnp.zeros((ny, nx), dtype)
        a = jnp.sum(an, axis=0)
        return jnp.sum(an * tc[:, tr.nt_iage], axis=0) \
            / jnp.maximum(a, ct.puny)

    # thermodynamic state tendencies (f_daidtt/f_dvidtt/f_dagedtt;
    # ice_step_mod.F90 step_therm2 tail: daidtt = (aice - daidtt)/dt)
    aice_mid = jnp.sum(aicen, axis=0)
    vice_mid = jnp.sum(vicen, axis=0)
    age_mid = _mean_age(aicen, trcrn)
    daidtt = (aice_mid - dg["aice_pre"]) / dt
    dvidtt = (vice_mid - dg["vice_pre"]) / dt
    dagedtt = (age_mid - _mean_age(state.aicen, state.trcrn)) / dt
    if cfg.dyn.kdyn >= 1:
        if cfg.dyn.yield_curve != "ellipse":
            raise NotImplementedError(
                f"yield_curve={cfg.dyn.yield_curve!r}: only 'ellipse' exists "
                "(ice_dyn_shared.F90:41; 'teardrop' was never finished)")
        dt_dyn = dt / cfg.time.ndtd
        if cfg.dyn.revised_evp:
            from cice5_tpu.parallel import global_min
            xmin = global_min(jnp.where(tmask,
                                        jnp.minimum(grid.dxt, grid.dyt),
                                        jnp.inf), topo)
            p = dyn.EVPParams.revised(dt_dyn, cfg.dyn.ndte, xmin,
                                      cosw=cfg.dyn.cosw, sinw=cfg.dyn.sinw,
                                      e_ratio=cfg.dyn.e_ratio)
        else:
            p = dyn.EVPParams.classic(dt_dyn, cfg.dyn.ndte,
                                      cosw=cfg.dyn.cosw, sinw=cfg.dyn.sinw,
                                      e_ratio=cfg.dyn.e_ratio)
        for _ in range(cfg.time.ndtd):
            agg = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
            if cfg.dyn.kstrength == 1:
                strength = strength_rothrock(
                    aicen, vicen, agg.aice0, hin_max=hin_max,
                    krdg_partic=cfg.dyn.krdg_partic,
                    krdg_redist=cfg.dyn.krdg_redist, mu_rdg=cfg.dyn.mu_rdg,
                    Cf=cfg.dyn.Cf)
            else:
                strength = strength_hibler(agg.aice, agg.vice,
                                           Pstar=cfg.dyn.Pstar,
                                           Cstar=cfg.dyn.Cstar)
            strength_d = strength
            if cfg.dyn.kdyn == 2:
                from cice5_tpu.models.dynamics.eap import eap
                er = eap(dt_dyn, p, grid, topo, aice=agg.aice,
                         vice=agg.vice, vsno=agg.vsno, strength=strength,
                         strairxT=strairxT, strairyT=strairyT,
                         uocn=forcing.uocn, vocn=forcing.vocn,
                         uvel=uvel, vvel=vvel, stressp=stressp,
                         stressm=stressm, stress12=stress12,
                         iceumask=iceumask, a11n=a11n, a12n=a12n,
                         Cw=Cw_ocn)
                ev = er.evp
                a11n, a12n = er.a11n, er.a12n
                e11_d, e12_d, e22_d = er.e11, er.e12, er.e22
                ys11_d, ys12_d, ys22_d = er.ys11, er.ys12, er.ys22
            else:
                evp_fn = evp
                if (cfg.dyn.evp_algorithm == "pallas"
                        and not topo.sharded
                        and topo.ns not in ("tripole", "tripoleT")):
                    from cice5_tpu.ops.pallas.evp_fused import evp_fused
                    evp_fn = evp_fused
                elif (cfg.dyn.evp_algorithm in ("auto", "resident")
                        and not topo.sharded
                        and jax.default_backend() == "tpu"):
                    # whole-sweep VMEM residency (evp_resident.py)
                    from functools import partial
                    evp_fn = partial(evp, resident=True)
                elif (cfg.dyn.evp_algorithm == "chunked"
                        and topo.ns != "tripoleT"):
                    # comm/compute-overlapped subcycling: ndte/K margin
                    # exchanges instead of ndte (evp.py evp_chunked)
                    from functools import partial
                    from cice5_tpu.models.dynamics.evp import evp_chunked
                    evp_fn = partial(evp_chunked, K=cfg.dyn.evp_chunk)
                ev = evp_fn(dt_dyn, p, grid, topo, aice=agg.aice,
                         vice=agg.vice,
                         vsno=agg.vsno, strength=strength, strairxT=strairxT,
                         strairyT=strairyT, uocn=forcing.uocn,
                         vocn=forcing.vocn, uvel=uvel, vvel=vvel,
                         stressp=stressp, stressm=stressm,
                         stress12=stress12, iceumask=iceumask, Cw=Cw_ocn)
            uvel, vvel = ev.uvel, ev.vvel
            prs_sig_d = ev.prs_sig
            strintx_d, strinty_d = ev.strintx, ev.strinty
            strtltx_d, strtlty_d = ev.strtltx, ev.strtlty
            strcorx_d = ev.fm * ev.vvel       # ice_history.F90:1473-1476
            strcory_d = -ev.fm * ev.uvel
            stressp, stressm, stress12 = ev.stressp, ev.stressm, ev.stress12
            iceumask = ev.iceumask
            strocnxT, strocnyT = ev.strocnxT, ev.strocnyT
            divu, shear_d = ev.divu, ev.shear

            if cfg.dyn.advection == "upwind":
                aice0_t = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0) * grid.hm
                aicen, vicen, vsnon, trcrn, aice0_t = transport_upwind(
                    dt_dyn, grid, topo, tr, uvel=uvel, vvel=vvel,
                    aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                    aice0=aice0_t)
            elif cfg.dyn.advection == "remap":
                from cice5_tpu.models.transport.remap import transport_remap
                chk = (cfg.dyn.conserv_check, cfg.dyn.monotonicity_check)
                use_pallas_rm = (cfg.dyn.remap_kernel == "pallas"
                                 or (cfg.dyn.remap_kernel == "auto"
                                     and jax.default_backend() == "tpu"))
                out = transport_remap(
                    dt_dyn, grid, topo, tr, uvel=uvel, vvel=vvel,
                    aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                    conserv_check=chk[0], monotonicity_check=chk[1],
                    kernel="pallas" if use_pallas_rm else "xla")
                if any(chk):
                    aicen, vicen, vsnon, trcrn, tchk = out
                    conserv_err = jnp.maximum(conserv_err,
                                              tchk.conserv_err.astype(dtype))
                    mono_bad = mono_bad + tchk.mono_violations
                else:
                    aicen, vicen, vsnon, trcrn = out

            # ridging
            aice0_r = jnp.maximum(1.0 - jnp.sum(aicen, 0), 0.0) * grid.hm
            rr = ridge_ice(dt_dyn, tr, hin_max, nilyr, nslyr, aicen=aicen,
                           vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                           aice0=aice0_r, rdg_conv=ev.rdg_conv,
                           rdg_shear=ev.rdg_shear,
                           krdg_partic=cfg.dyn.krdg_partic,
                           krdg_redist=cfg.dyn.krdg_redist,
                           mu_rdg=cfg.dyn.mu_rdg, ndtd=cfg.time.ndtd,
                           tr_pond_topo=tcfg.tr_pond_topo,
                           cat_diags=cfg.dyn.diag_mechred)
            aicen, vicen, vsnon, trcrn = rr.aicen, rr.vicen, rr.vsnon, rr.trcrn
            fresh = fresh + rr.fresh
            fhocn = fhocn + rr.fhocn
            dardg1dt = dardg1dt + rr.dardg1dt
            dardg2dt = dardg2dt + rr.dardg2dt
            dvirdgdt = dvirdgdt + rr.dvirdgdt
            opening_d = opening_d + rr.opening
            if cfg.dyn.diag_mechred:
                rdgn_d = rdgn_d + rr.catdiag

            cl2 = itd.cleanup_itd(dt_dyn, tr, hin_max, nilyr, nslyr,
                                  aicen=aicen, vicen=vicen, vsnon=vsnon,
                                  trcrn=trcrn,
                                  tr_pond_topo=tcfg.tr_pond_topo)
            aicen, vicen, vsnon, trcrn = (cl2.aicen, cl2.vicen, cl2.vsnon,
                                          cl2.trcrn)
            fresh = fresh + cl2.dfresh
            fsalt = fsalt + cl2.dfsalt
            fhocn = fhocn + cl2.dfhocn
            # ridge/zap tracer-to-ocean bookkeeping (ice_mechred.F90:
            # 707-718 maero/mpond, ice_itd.F90:1741-1750)
            if tcfg.tr_pond_topo:
                fpond_step = fpond_step - rr.dfpond - cl2.dfpond
            if tcfg.tr_aero:
                dg["faero_ocn"] = (dg["faero_ocn"] + rr.faero_ocn
                                   + cl2.dfaero)
            if tcfg.skl_bgc:
                dg["flux_bio"] = (dg["flux_bio"] + rr.dflux_bio
                                  + cl2.dflux_bio)
            if tcfg.tr_brine or tcfg.skl_bgc:
                first_ice = jnp.where(cl2.zapped, 1.0, first_ice)

    if cfg.thermo.ktherm == 0:
        # zero-layer energy-placeholder consistency after all ITD ops
        # (ice_itd.F90:2428 zerolayer_check, called from cleanup_itd when
        # heat_capacity=F)
        itd_bad = itd_bad + itd.zerolayer_check(tr, nilyr, nslyr, aicen,
                                                vicen, vsnon, trcrn)

    # ---------------- coupling prep: slab ocean update -------------------
    aggf = itd.aggregate(tr, aicen, vicen, vsnon, trcrn)
    # dynamic state tendencies (f_daidtd/f_dvidtd/f_dagedtd;
    # ice_step_mod.F90 step_dynamics tail)
    daidtd = (aggf.aice - aice_mid) / dt
    dvidtd = (aggf.vice - vice_mid) / dt
    dagedtd = (_mean_age(aicen, trcrn) - age_mid) / dt

    # melt/freeze season onset dates (ice_flux.F90 mlt_onset/frz_onset:
    # first day-of-year with top melt / with congelation+frazil growth;
    # reset at the new year, i.e. on the first step of January 1)
    new_year = forcing.yday <= dt / 86400.0 + 1.0e-6
    mlt_onset = jnp.where(new_year, 0.0, state.mlt_onset)
    frz_onset = jnp.where(new_year, 0.0, state.frz_onset)
    mlt_onset = jnp.where((meltt > 0.0) & (mlt_onset <= 0.0),
                          forcing.yday, mlt_onset)
    frz_onset = jnp.where((frazil + congel > 0.0) & (frz_onset <= 0.0),
                          forcing.yday, frz_onset)
    # meltwater retained in ponds does not reach the ocean
    # (CICE_RunMod.F90:384-387 coupling_prep, l_mpond_fresh)
    if cfg.forcing.l_mpond_fresh and cfg.tracers.tr_pond:
        fresh = fresh - fpond_step * ct.rhofresh / dt
    if cfg.forcing.oceanmixed_ice:
        ml = ocean.ocean_mixed_layer(
            dt, sst=sst, Tf=forcing.Tf, hmix=forcing.hmix, qdp=forcing.qdp,
            aice=aggf.aice, fhocn=fhocn, fswthru=fswthru,
            uatm=forcing.uatm, vatm=forcing.vatm, wind=forcing.wind,
            zlvl=forcing.zlvl, potT=forcing.potT, Qa=forcing.Qa,
            rhoa=forcing.rhoa, flw=forcing.flw, swvdr=forcing.swvdr,
            swvdf=forcing.swvdf, swidr=forcing.swidr, swidf=forcing.swidf,
            tmask=tmask, atmbndy=cfg.forcing.atmbndy,
            natmiter=cfg.forcing.natmiter)
        sst_new = ml.sst
        frzmlt_out = ml.frzmlt
        if cfg.forcing.restore_sst:
            # nudge the slab SST toward the data SST on the trestore
            # timescale (ice_forcing.F90:3280-3285 ocn_data_clim)
            trest = (cfg.forcing.trestore * ct.secday
                     if cfg.forcing.trestore > 0 else dt)
            sst_new = sst_new + (forcing.sst - sst_new) * dt / trest
    else:
        sst_new = sst
        frzmlt_out = forcing.frzmlt

    # end-of-step radiation under the coupled ordering (step_radiation,
    # ice_step_mod.F90:1364 runs AFTER dynamics; its outputs feed the
    # coupler now and next step's prep_radiation rescale)
    rad_prev_new = state.rad_prev
    rad_alb_new = state.rad_alb
    if cfg.coupled_radiation:
        radf = _step_radiation(aicen, vicen, vsnon, trcrn, forcing, cfg,
                               tr)
        dg["alvdrn"], dg["alvdfn"] = radf.alb.alvdrn, radf.alb.alvdfn
        dg["alidrn"], dg["alidfn"] = radf.alb.alidrn, radf.alb.alidfn
        snowfracn = radf.snowfracn
        albice_d = jnp.sum(aicen * radf.alb.albin, 0)
        albsno_d = jnp.sum(aicen * radf.alb.albsn, 0)
        albpnd_d = jnp.sum(aicen * radf.albpndn, 0)
        # next step's rescale inputs: per-category absorption stack +
        # ai-weighted ice-only albedos (prep_radiation reads alvdr_ai,
        # ice_step_mod.F90:86-97)
        rad_prev_new = jnp.concatenate(
            [radf.absr.fswsfc[:, None], radf.absr.fswint[:, None],
             radf.absr.fswthru[:, None], radf.Sswabsn,
             radf.absr.Iswabs], axis=1)
        rad_alb_new = jnp.stack(
            [jnp.sum(aicen * radf.alb.alvdrn, 0),
             jnp.sum(aicen * radf.alb.alvdfn, 0),
             jnp.sum(aicen * radf.alb.alidrn, 0),
             jnp.sum(aicen * radf.alb.alidfn, 0)])

    # cell-mean albedos incl. open water (coupling_prep, CICE_RunMod.F90:269)
    alvdr = jnp.sum(aicen * dg["alvdrn"], axis=0) + aggf.aice0 * ct.albocn
    alvdf = jnp.sum(aicen * dg["alvdfn"], axis=0) + aggf.aice0 * ct.albocn
    alidr = jnp.sum(aicen * dg["alidrn"], axis=0) + aggf.aice0 * ct.albocn
    alidf = jnp.sum(aicen * dg["alidfn"], axis=0) + aggf.aice0 * ct.albocn
    # net absorbed SW for next step's scale_factor: full 4-band sum
    # (coupling_prep, drivers/cice/CICE_RunMod.F90:376-382)
    if cfg.coupled_radiation:
        # the reference's coupling_prep uses the ICE-ONLY ai-weighted
        # albedos here (alvdr_ai), pairing with prep_radiation's netsw
        scale_factor = (forcing.swvdr * (1.0 - rad_alb_new[0])
                        + forcing.swvdf * (1.0 - rad_alb_new[1])
                        + forcing.swidr * (1.0 - rad_alb_new[2])
                        + forcing.swidf * (1.0 - rad_alb_new[3]))
    else:
        scale_factor = (
            forcing.swvdr * (1.0 - alvdr) + forcing.swvdf * (1.0 - alvdf)
            + forcing.swidr * (1.0 - alidr)
            + forcing.swidf * (1.0 - alidf))

    # in-step failure detection: the jitted analog of the reference's
    # l_stop plumbing (ice_step_mod.F90:858-867 aborts with cell
    # coordinates from inside physics). A cheap global reduction rides in
    # the diag; the driver dumps the offending column host-side on trigger.
    from cice5_tpu.parallel import global_sum

    def _nbad(x, lo, hi, mask=None):
        bad = ~jnp.isfinite(x) | (x < lo) | (x > hi)
        if mask is not None:
            bad = bad & mask
        return global_sum(bad.astype(jnp.int32), topo)

    has_ice_n = aicen > ct.puny
    # Tsfc upper bound is dtype-aware: the f32 amount<->value tracer
    # roundtrips (shift/rebin) leave O(1e-5) roundoff above the melting
    # point, within the repo-wide 5e-3 K f32 surface-temperature
    # tolerance (CLAUDE.md numerical conventions; bl99/mushy docstrings)
    Tsfc_tol = 1e-6 if dtype == jnp.float64 else 5e-3
    state_bad = (_nbad(aicen, -1e-6, 1.0 + 1e-6)
                 + _nbad(vicen, -1e-6, 100.0)
                 + _nbad(vsnon, -1e-6, 50.0)
                 + _nbad(uvel, -5.0, 5.0) + _nbad(vvel, -5.0, 5.0)
                 + _nbad(trcrn[:, tr.nt_Tsfc], -100.0, Tsfc_tol,
                         mask=has_ice_n)
                 + global_sum(itd_bad, topo)).astype(jnp.int32)

    new_state = state.replace(
        aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
        uvel=uvel, vvel=vvel, a11n=a11n, a12n=a12n,
        first_ice=first_ice,
        stressp=stressp, stressm=stressm,
        stress12=stress12, iceumask=iceumask, strocnxT=strocnxT,
        strocnyT=strocnyT, frzmlt=frzmlt_out, scale_factor=scale_factor,
        rad_prev=rad_prev_new, rad_alb=rad_alb_new,
        sst=sst_new, mlt_onset=mlt_onset, frz_onset=frz_onset)

    diag = StepDiag(
        aice=aggf.aice, vice=aggf.vice, vsno=aggf.vsno,
        fsens=fsens, flat=flat, flwout=flwout, evap=evap, fresh=fresh,
        fsalt=fsalt, fhocn=fhocn, fswthru=fswthru, fswabs=fswabs,
        strairxT=strairxT, strairyT=strairyT,
        meltt=meltt, melts=melts, meltb=meltb, meltl=meltl, congel=congel,
        snoice=snoice, frazil=frazil, frzmlt=frzmlt_out,
        dardg1dt=dardg1dt, dardg2dt=dardg2dt, dvirdgdt=dvirdgdt,
        divu=divu, shear=shear_d,
        alvdr=alvdr, alvdf=alvdf, alidr=alidr, alidf=alidf,
        Tsfc=aggf.trcr[tr.nt_Tsfc],
        therm_converged=sc["therm_converged"],
        ferr_max=sc["ferr_max"],
        fpond=fpond_step,
        transport_conserv_err=conserv_err,
        transport_mono_bad=mono_bad,
        fsurfn_ai=dg["fsurfn_ai"],
        flatn_ai=dg["flatn_ai"],
        fsensn_ai=dg["fsensn_ai"],
        fmelttn_ai=dg["fmelttn_ai"],
        snowfracn=snowfracn,
        fcondtopn_ai=dg["fcondtopn_ai"],
        fsurf=fsurf_d, fcondtop=fcondtop_d,
        Tref=Tref_d, Qref=Qref_d, Uref=Uref_d,
        strength=strength_d, prs_sig=prs_sig_d,
        state_bad=state_bad,
        strintx=strintx_d, strinty=strinty_d,
        strtltx=strtltx_d, strtlty=strtlty_d,
        strcorx=strcorx_d, strcory=strcory_d,
        e11=e11_d, e12=e12_d, e22=e22_d,
        yieldstress11=ys11_d, yieldstress12=ys12_d, yieldstress22=ys22_d,
        albice=albice_d, albsno=albsno_d, albpnd=albpnd_d,
        dsnow=dsnow_d, fswint=fswint_d,
        daidtt=daidtt, dvidtt=dvidtt, daidtd=daidtd, dvidtd=dvidtd,
        dagedtt=dagedtt, dagedtd=dagedtd,
        faero_ocn=(dg["faero_ocn"] if tcfg.tr_aero
                   else jnp.zeros((0, ny, nx), dtype)),
        flux_bio=(dg["flux_bio"] if tcfg.skl_bgc
                  else jnp.zeros((0, ny, nx), dtype)),
        PP_net=(dg["PP_net"] if tcfg.skl_bgc
                else jnp.zeros((ny, nx), dtype)),
        grow_net=(dg["grow_net"] if tcfg.skl_bgc
                  else jnp.zeros((ny, nx), dtype)),
        opening=opening_d,
        drag=(dg["drag"] if cfg.forcing.formdrag
              else jnp.zeros((0, ny, nx), dtype)),
        rdgn=rdgn_d)
    return new_state, diag



