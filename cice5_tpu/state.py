"""Prognostic model state and runtime tracer registry.

TPU-native redesign of /root/reference/source/ice_state.F90:53-147: instead of
Fortran module globals with (nx_block,ny_block,...,max_blocks) block dims, the
full prognostic state is one immutable pytree of dense global-or-shard arrays
with layout ``(ncat, ny, nx)`` / ``(ncat, ntrcr, ny, nx)`` — category and
tracer axes leading so that the trailing (ny, nx) axes map onto TPU
(sublane, lane) tiles and shard cleanly over a 2-D device mesh.

The tracer registry mirrors ice_state.F90:97-135 (index pointers nt_*) and the
dependency encoding of ice_init.F90:1361-1392 / ice_transport_driver.F90:95-110:
``depend`` is 0 (area-weighted), 1 (ice-volume), 2 (snow-volume), or
``3 + parent_index`` (depends on another tracer, e.g. pond depth on pond area).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from cice5_tpu.config import ModelConfig
from cice5_tpu.utils import pytree_dataclass
from cice5_tpu import constants as ct

# depend codes
DEP_AICE = 0
DEP_VICE = 1
DEP_VSNO = 2
DEP_TRCR = 3  # depend >= 3 means 'depends on tracer (depend - 3)'


@dataclass(frozen=True)
class TracerRegistry:
    """Static tracer layout: names, index ranges, dependencies.

    Built once from config; hashable, so it can ride along as a jit-static
    argument. Index attributes are 0-based offsets into the trcrn axis.
    """
    ntrcr: int
    names: tuple[str, ...]          # one name per tracer slot
    depend: tuple[int, ...]         # per-slot dependency code
    nt_Tsfc: int
    nt_qice: int                    # first of nilyr enthalpy layers
    nt_sice: int                    # first of nilyr salinity layers
    nt_qsno: int                    # first of nslyr snow-enthalpy layers
    nt_iage: int = -1
    nt_FY: int = -1
    nt_alvl: int = -1
    nt_vlvl: int = -1
    nt_apnd: int = -1
    nt_hpnd: int = -1
    nt_ipnd: int = -1
    nt_aero: int = -1
    nt_fbri: int = -1
    # skeletal-layer BGC (ice_zbgc.F90:226-276): bgc_names in nlt order,
    # nt_bgc aligned trcrn slots, bgc_type 1.0=dissolved (flows with brine)
    # / 0.0=mobile-phase (algae etc.; ice_zbgc.F90:321-329)
    bgc_names: tuple[str, ...] = ()
    nt_bgc: tuple[int, ...] = ()
    bgc_type: tuple[float, ...] = ()

    @property
    def nbtrcr(self) -> int:
        return len(self.nt_bgc)

    @property
    def n_aero(self) -> int:
        """Number of aerosol species (4 trcrn slots each: 2 snow + 2 ice
        layers, reference nt_aero+4*(it-1) layout, ice_state.F90:118)."""
        return sum(1 for n in self.names if n.startswith("aerosno1_"))

    @property
    def has_dependents(self) -> tuple[bool, ...]:
        out = [False] * self.ntrcr
        for d in self.depend:
            if d >= DEP_TRCR:
                out[d - DEP_TRCR] = True
        return tuple(out)


def build_tracer_registry(cfg: ModelConfig) -> TracerRegistry:
    """Assign tracer slots in the reference's canonical order
    (ice_state.F90:97-123, ice_init.F90:1361-1392)."""
    names: list[str] = []
    depend: list[int] = []
    idx: dict[str, int] = {}

    def add(name: str, n: int, dep) -> int:
        start = len(names)
        idx[name] = start
        for k in range(n):
            names.append(name if n == 1 else f"{name}{k:03d}")
            depend.append(dep if isinstance(dep, int) else dep[k])
        return start

    nilyr, nslyr = cfg.nilyr, cfg.nslyr
    t = cfg.tracers
    add("Tsfc", 1, DEP_AICE)
    add("qice", nilyr, DEP_VICE)
    add("sice", nilyr, DEP_VICE)
    add("qsno", nslyr, DEP_VSNO)
    if t.tr_iage:
        add("iage", 1, DEP_VICE)
    if t.tr_FY:
        add("FY", 1, DEP_AICE)
    if t.tr_lvl:
        add("alvl", 1, DEP_AICE)
        add("vlvl", 1, DEP_VICE)
    if t.tr_pond_cesm:
        a = add("apnd", 1, DEP_AICE)
        add("hpnd", 1, DEP_TRCR + a)
    elif t.tr_pond_lvl:
        a = add("apnd", 1, DEP_TRCR + idx["alvl"])
        add("hpnd", 1, DEP_TRCR + a)
        add("ipnd", 1, DEP_TRCR + a)
    elif t.tr_pond_topo:
        a = add("apnd", 1, DEP_AICE)
        add("hpnd", 1, DEP_TRCR + a)
        add("ipnd", 1, DEP_TRCR + a)
    if t.tr_aero:
        for it in range(t.n_aero):
            add(f"aerosno1_{it}", 1, DEP_VSNO)
            add(f"aerosno2_{it}", 1, DEP_VSNO)
            add(f"aeroice1_{it}", 1, DEP_VICE)
            add(f"aeroice2_{it}", 1, DEP_VICE)
    if t.tr_brine:
        add("fbri", 1, DEP_VICE)

    # skeletal-layer BGC tracers, nlt assignment order of
    # ice_zbgc.F90:226-276 (algal N is unconditional under skl_bgc);
    # all depend on area (trcr_depend = 0, ice_zbgc.F90:311-319)
    bgc_names: list[str] = []
    bgc_type: list[float] = []
    if t.skl_bgc:
        def addb(name: str, on: bool, typ: float):
            if on:
                add(f"bgc_{name}", 1, DEP_AICE)
                bgc_names.append(name)
                bgc_type.append(typ)
        addb("N", True, 0.0)
        addb("NO", t.tr_bgc_Nit_sk, 1.0)
        addb("C", t.tr_bgc_C_sk, 0.0)
        addb("chl", t.tr_bgc_chl_sk, 0.0)
        addb("NH", t.tr_bgc_Am_sk, 1.0)
        addb("Sil", t.tr_bgc_Sil_sk, 1.0)
        addb("DMSPp", t.tr_bgc_DMSPp_sk, 0.0)
        addb("DMSPd", t.tr_bgc_DMSPd_sk, 1.0)
        addb("DMS", t.tr_bgc_DMS_sk, 1.0)

    first_aero = idx.get(f"aerosno1_0", -1)
    return TracerRegistry(
        ntrcr=len(names), names=tuple(names), depend=tuple(depend),
        nt_Tsfc=idx["Tsfc"], nt_qice=idx["qice"], nt_sice=idx["sice"],
        nt_qsno=idx["qsno"],
        nt_iage=idx.get("iage", -1), nt_FY=idx.get("FY", -1),
        nt_alvl=idx.get("alvl", -1), nt_vlvl=idx.get("vlvl", -1),
        nt_apnd=idx.get("apnd", -1), nt_hpnd=idx.get("hpnd", -1),
        nt_ipnd=idx.get("ipnd", -1), nt_aero=first_aero,
        nt_fbri=idx.get("fbri", -1),
        bgc_names=tuple(bgc_names),
        nt_bgc=tuple(idx[f"bgc_{n}"] for n in bgc_names),
        bgc_type=tuple(bgc_type),
    )


@pytree_dataclass
class State:
    """Full prognostic state (ice_state.F90:53-147 + dynamics stress state
    ice_flux.F90 stressp_1..4/stressm_1..4/stress12_1..4 — carried in state
    because exact restart requires them, ice_restart_driver.F90:101-121).

    Shapes: aicen/vicen/vsnon (ncat, ny, nx); trcrn (ncat, ntrcr, ny, nx);
    uvel/vvel (ny, nx) on U (NE-corner) points; stress* (4, ny, nx) holding
    the 4 per-cell corner values (NE, NW, SW, SE)."""
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    trcrn: jnp.ndarray
    uvel: jnp.ndarray
    vvel: jnp.ndarray
    stressp: jnp.ndarray
    stressm: jnp.ndarray
    stress12: jnp.ndarray
    scale_factor: jnp.ndarray   # shortwave scaling accumulator (ny, nx)
    iceumask: jnp.ndarray       # U-cell ice mask from previous dynamics step
                                # (float 0/1; in reference restart,
                                # ice_restart_driver.F90:121)
    strocnxT: jnp.ndarray       # ice-ocean stress on T grid from previous
    strocnyT: jnp.ndarray       # dynamics step (restart fields; used by
                                # frzmlt_bottom_lateral's ustar)
    frzmlt: jnp.ndarray         # freezing/melting potential from the slab
                                # ocean at the end of the previous step
                                # (the reference's lagged coupling field)
    # slab-ocean prognostic SST (used when forcing.oceanmixed_ice); carried
    # always so the pytree structure is config-independent at this level.
    sst: jnp.ndarray
    # EAP per-corner structure tensor (4, ny, nx); restart fields for kdyn=2
    # (ice_dyn_eap.F90:1872-1902 write_restart_eap). Init 0.5/0.0; inert for
    # other dynamics options.
    a11n: jnp.ndarray
    a12n: jnp.ndarray
    # per-category "first ice" flag (1.0 = newly formed since last BGC
    # update; seeds brine/BGC state; restart field,
    # ice_brine.F90:688-700 / ice_zbgc_shared.F90 first_ice)
    first_ice: jnp.ndarray
    # melt/freeze season onset dates (day of year when top melt / fall
    # freeze-up first occurs; 0 until then, reset each new year;
    # ice_flux.F90 mlt_onset/frz_onset, set in ice_therm_vertical.F90
    # thermo_vertical and ice_therm_itd.F90 add_new_ice; history
    # f_mlt_onset/f_frz_onset)
    mlt_onset: jnp.ndarray
    frz_onset: jnp.ndarray
    # coupled-ordering radiation memory (cfg.coupled_radiation; empty
    # otherwise): last step's per-category SW absorption stack
    # [fswsfc, fswint, fswthru | Sswabs*nslyr | Iswabs*nilyr]
    # (ncat, nrad, ny, nx) and the ai-weighted ice-only 4-band albedos
    # (4, ny, nx) — what prep_radiation rescales (ice_step_mod.F90:33-154;
    # the fswsfcn/alvdr_ai module state of ice_shortwave/ice_flux)
    rad_prev: jnp.ndarray
    rad_alb: jnp.ndarray

    @property
    def aice(self):
        return jnp.sum(self.aicen, axis=0)

    @property
    def vice(self):
        return jnp.sum(self.vicen, axis=0)

    @property
    def vsno(self):
        return jnp.sum(self.vsnon, axis=0)


def zeros_state(cfg: ModelConfig, tr: TracerRegistry) -> State:
    ny, nx = cfg.grid.ny, cfg.grid.nx
    dt_ = cfg.xp_dtype
    z2 = lambda: jnp.zeros((ny, nx), dt_)
    zc = lambda: jnp.zeros((cfg.ncat, ny, nx), dt_)
    return State(
        aicen=zc(), vicen=zc(), vsnon=zc(),
        trcrn=jnp.zeros((cfg.ncat, tr.ntrcr, ny, nx), dt_),
        uvel=z2(), vvel=z2(),
        stressp=jnp.zeros((4, ny, nx), dt_),
        stressm=jnp.zeros((4, ny, nx), dt_),
        stress12=jnp.zeros((4, ny, nx), dt_),
        scale_factor=z2(),
        iceumask=z2(),
        strocnxT=z2(),
        strocnyT=z2(),
        frzmlt=z2(),
        sst=z2(),
        a11n=jnp.full((4, ny, nx), 0.5, dt_),
        a12n=jnp.zeros((4, ny, nx), dt_),
        first_ice=jnp.ones((cfg.ncat, ny, nx), dt_),
        mlt_onset=z2(), frz_onset=z2(),
        rad_prev=jnp.zeros(
            (cfg.ncat,
             (3 + cfg.nslyr + cfg.nilyr) if cfg.coupled_radiation else 0,
             ny, nx), dt_),
        rad_alb=jnp.zeros((4 if cfg.coupled_radiation else 0, ny, nx),
                          dt_),
    )
