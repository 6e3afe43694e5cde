"""Typed, hashable model configuration.

This is the TPU-native equivalent of the reference's two-level config system:
compile-time CPP macros (/root/reference/source/ice_domain_size.F90:23-67) and
runtime Fortran namelists (/root/reference/source/ice_init.F90:135-199,
ice_domain.F90:109-118). Here both collapse into one frozen dataclass tree
passed as a jit-static argument, so shape-determining fields (nx, ny, ncat,
nilyr, nslyr, tracer on/off flags) become trace-time constants and option
strings select code paths at trace time (no runtime branching inside XLA).

Every default mirrors the reference namelist defaults (ice_init.F90:204-320)
or the gx3 template (/root/reference/input_templates/gx3/ice_in) where noted.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax.numpy as jnp


@dataclass(frozen=True)
class GridConfig:
    """Grid shape & type (ice_domain_size.F90:23-37, ice_grid.F90:309-324)."""
    nx: int = 100                # global grid columns (gx3: 100)
    ny: int = 116                # global grid rows (gx3: 116)
    grid_type: str = "rectangular"   # rectangular | displaced_pole | tripole | latlon | column
    ew_boundary: str = "cyclic"      # cyclic | open | closed
    ns_boundary: str = "open"        # open | closed | cyclic | tripole | tripoleT
    dx_const: float = 30000.0        # rectgrid cell size (m)  (ice_grid.F90:1145)
    dy_const: float = 30000.0
    lat0: float = 71.35              # rectgrid lower-left latitude (deg);
    # Barrow AK origin (ice_grid.F90:1208) keeps the whole rectangular
    # domain above set_state_var's 70N ice-edge threshold
    lon0: float = -156.5
    # POP grid file inputs (ice_grid.F90:543 popgrid / :659 popgrid_nc),
    # used when grid_type is displaced_pole/tripole
    grid_format: str = "nc"          # nc | bin  (grid_format namelist)
    grid_file: str | None = None
    kmt_file: str | None = None
    # pack ocean columns for the pre-dynamics column physics (the analog
    # of the reference's compressed cell index lists,
    # ice_therm_vertical.F90:186-200). MEASURED NEGATIVE everywhere: on
    # TPU the per-cell gather/scatter of the state costs far more than
    # the skipped land compute (gx1 parity 35.6 -> 77.9 ms/step; gathers
    # along the lane axis are the expensive op — dense masked compute
    # wins, SURVEY.md §2.10.6), and on CPU it is ~2% slower (dynamics,
    # which stays dense, dominates there). "auto" therefore = "off" on
    # every backend; "on" forces packing (kept as an exercised,
    # equivalence-tested path: tests/test_column_packing.py).
    compact_columns: str = "auto"    # auto | on | off


@dataclass(frozen=True)
class ThermoConfig:
    """Vertical thermodynamics options (ice_init.F90 thermo_nml)."""
    ktherm: int = 1                  # 0=zero-layer, 1=BL99, 2=mushy
    conduct: str = "bubbly"          # bubbly | MU71 (ice_therm_bl99.F90:940)
    calc_Tsfc: bool = True
    heat_capacity: bool = True
    ustar_min: float = 0.0005        # min friction velocity under ice
    fbot_xfer_type: str = "constant"
    saltmax: float = 3.2             # max bulk salinity, BL99 profile
    nsal: float = 0.407              # salinity profile shape params
    msal: float = 0.573
    # mushy gravity-drainage parameters (ice_init.F90:386-390 defaults;
    # the gx templates override dSdt_slow_mode to -5.0e-8)
    a_rapid_mode: float = 0.5e-3     # channel radius, rapid mode (m)
    Rac_rapid_mode: float = 10.0     # critical Rayleigh number
    aspect_rapid_mode: float = 1.0   # convection aspect ratio
    dSdt_slow_mode: float = -1.5e-7  # slow-mode drainage strength (m/s/K)
    phi_c_slow_mode: float = 0.05
    phi_i_mushy: float = 0.85        # solid fraction of frozen mush
    phi_init: float = 0.75           # initial liquid fraction of frazil
    dSin0_frazil: float = 3.0        # frazil bulk-salinity offset from sss
    ksno: float = 0.30
    hfrazilmin: float = 0.05         # min thickness of new frazil ice (m)
    # mushy solver controls (ice_therm_mushy.F90)
    dTemp_errmax: float = 5.0e-4    # Picard convergence (K); f32 floors
    # at max(10x this, 5e-3) — see mushy.picard_solver
    nit_max_picard: int = 100


@dataclass(frozen=True)
class DynConfig:
    """Dynamics / ridging options (ice_init.F90 dynamics_nml; ice_dyn_shared.F90:31-81)."""
    kdyn: int = 1                    # 0=off, 1=EVP, 2=EAP
    ndte: int = 120                  # EVP subcycles per dynamics step
    evp_algorithm: str = "auto"      # auto (= resident on one TPU device,
    # xla otherwise) | xla | resident (all ndte subcycles in ONE Pallas
    # call, working set held in VMEM) | pallas (fused VMEM subcycles)
    # | chunked (K subcycles per halo exchange — comm/compute overlap)
    evp_chunk: int = 10              # subcycles per margin exchange (chunked)
    revised_evp: bool = False        # Bouillon-13 revised EVP (ice_dyn_shared.F90:230)
    yield_curve: str = "ellipse"     # only 'ellipse' exists (ice_dyn_shared.F90:41)
    e_ratio: float = 2.0             # yield-curve axis ratio e (ecci = 1/e^2)
    Pstar: float = 2.75e4            # Hibler strength P* (N/m^2)
    Cstar: float = 20.0              # Hibler strength C*
    kstrength: int = 1               # 0=Hibler79, 1=Rothrock75
    krdg_partic: int = 1             # 0=linear, 1=exponential participation
    krdg_redist: int = 1             # 0=Hibler, 1=exponential redistribution
    mu_rdg: float = 4.0              # e-folding scale of ridged ice (kr_redist=1)
    Cf: float = 17.0                 # ratio of ridging work to PE change
    cosw: float = 1.0                # cos/sin of ocean turning angle
    sinw: float = 0.0
    # EAP
    a11_0: float = 0.5
    # transport
    advection: str = "remap"         # remap | upwind | none
    conserv_check: bool = False      # transport global conservation check
    monotonicity_check: bool = False # transport monotone-remap check
    # remap transport-integrals execution kernel: "auto" uses the fused
    # Pallas row-tile kernel (ops/pallas/remap_flux.py) on TPU backends,
    # the XLA path elsewhere; "xla"/"pallas" force one. Same math either
    # way (_integrals runs inside the kernel on VMEM tiles).
    remap_kernel: str = "auto"
    # per-category mechanical-redistribution history diagnostics
    # (f_dardg1ndt/f_araftn/f_aparticn/f_krdgn/f_aredistn...,
    # ice_history_mechred.F90). Off by default: they add 9 (ncat,ny,nx)
    # accumulators to the ridging while-loop carry (HBM traffic in a
    # hot-path budget item).
    diag_mechred: bool = False


@dataclass(frozen=True)
class ShortwaveConfig:
    """Radiation options (ice_init.F90 shortwave_nml; ice_shortwave.F90)."""
    shortwave: str = "ccsm3"         # ccsm3 | dEdd
    albedo_type: str = "ccsm3"       # ccsm3 | constant
    albicev: float = 0.78            # visible ice albedo, h > ahmax
    albicei: float = 0.36            # near-IR ice albedo
    albsnowv: float = 0.98           # visible cold-snow albedo
    albsnowi: float = 0.70           # near-IR cold-snow albedo
    ahmax: float = 0.3               # albedo-thickness transition (m)
    # delta-Eddington tuning (ice_shortwave.F90 dEdd knobs)
    R_ice: float = 0.0
    R_pnd: float = 0.0
    R_snw: float = 1.5
    dT_mlt: float = 1.5
    rsnw_mlt: float = 1500.0
    kalg: float = 0.6
    # constant albedos (albedo_type=constant)
    albedo_const: float = 0.78
    # orbital-parameter source (ice_orbital.F90:46 init_orbit default year;
    # csm_share/shr_orb_mod.F90 shr_orb_params): Berger-1978 series year,
    # or iyear_orb=None + explicit (eccen, obliq deg, mvelp deg) — the
    # SHR_ORB_UNDEF_INT branch. Evaluated host-side once at Model init.
    iyear_orb: int | None = 1950
    orb_eccen: float | None = None
    orb_obliq: float | None = None
    orb_mvelp: float | None = None
    # dEdd execution kernel: "auto" uses the fused Pallas column kernel
    # (ops/pallas/dedd_fused.py) on TPU backends and the XLA path
    # elsewhere; "xla"/"pallas" force one. Same physics code either way
    # (the kernel body calls shortwave_dEdd on VMEM tiles); outputs agree
    # to f32 fusion-order rounding (~1e-4 relative).
    sw_kernel: str = "auto"


@dataclass(frozen=True)
class TracerConfig:
    """Optional tracer switches (ice_init.F90 tracer_nml; ice_state.F90:126-135)."""
    tr_iage: bool = False
    tr_FY: bool = False
    tr_lvl: bool = False
    tr_pond_cesm: bool = False
    tr_pond_lvl: bool = False
    tr_pond_topo: bool = False
    tr_aero: bool = False
    tr_brine: bool = False
    n_aero: int = 0
    skl_bgc: bool = False
    # skeletal-layer BGC tracer switches (ice_zbgc.F90 zbgc_nml; algal N is
    # always carried when skl_bgc is on)
    tr_bgc_Nit_sk: bool = True
    tr_bgc_C_sk: bool = True
    tr_bgc_chl_sk: bool = True
    tr_bgc_Am_sk: bool = True
    tr_bgc_Sil_sk: bool = True
    tr_bgc_DMSPp_sk: bool = True
    tr_bgc_DMSPd_sk: bool = True
    tr_bgc_DMS_sk: bool = True
    bgc_flux_type: str = "Jin2006"   # Jin2006 | constant
    # fraction of ocean dissolved-tracer concentration taken up by new
    # frazil ice (ice_zbgc_shared.F90:83 initbio_frac, zbgc_nml)
    initbio_frac: float = 1.0
    # pond params (ice_init.F90 ponds_nml)
    hs0: float = 0.03
    hs1: float = 0.03
    hp1: float = 0.01
    dpscale: float = 0.001
    frzpnd: str = "cesm"             # cesm | hlid
    rfracmin: float = 0.15
    rfracmax: float = 1.0
    pndaspect: float = 0.8

    @property
    def tr_pond(self) -> bool:
        return self.tr_pond_cesm or self.tr_pond_lvl or self.tr_pond_topo


@dataclass(frozen=True)
class ForcingConfig:
    """Atmo/ocean boundary & forcing options (ice_init.F90 forcing_nml)."""
    atmbndy: str = "default"         # default (stability iteration) | constant
    formdrag: bool = False
    highfreq: bool = False
    natmiter: int = 5                # stability iterations
    oceanmixed_ice: bool = False     # prognostic slab-ocean SST
    calc_strair: bool = True
    atm_data_type: str = "default"
    ocn_data_type: str = "default"
    precip_units: str = "mks"
    update_ocn_f: bool = False
    l_mpond_fresh: bool = False
    restore_sst: bool = False
    restore_ice: bool = False        # nudge open-boundary cells (regional)
    trestore: int = 90


@dataclass(frozen=True)
class TimeConfig:
    """Timestepping (ice_init.F90 setup_nml; ice_calendar.F90)."""
    dt: float = 3600.0               # thermo timestep (s)
    ndtd: int = 1                    # dynamics subcycles per thermo step
    npt: int = 24                    # number of steps to run
    year_init: int = 1997
    istep0: int = 0
    days_per_year: int = 365
    use_leap_years: bool = False
    sec_init: int = 0


@dataclass(frozen=True)
class ModelConfig:
    """Root configuration (the full "namelist")."""
    grid: GridConfig = field(default_factory=GridConfig)
    thermo: ThermoConfig = field(default_factory=ThermoConfig)
    dyn: DynConfig = field(default_factory=DynConfig)
    shortwave: ShortwaveConfig = field(default_factory=ShortwaveConfig)
    tracers: TracerConfig = field(default_factory=TracerConfig)
    forcing: ForcingConfig = field(default_factory=ForcingConfig)
    time: TimeConfig = field(default_factory=TimeConfig)

    ncat: int = 5                    # ice thickness categories (NICECAT)
    nilyr: int = 7                   # ice layers (NICELYR)
    nslyr: int = 1                   # snow layers (NSNWLYR)
    kitd: int = 1                    # 0=delta-function, 1=linear remap ITD
    kcatbound: int = 1               # category-bound scheme (ice_itd.F90:41-64)

    dtype: str = "float32"           # state dtype ("float32" | "float64")
    accum_dtype: str = "float32"     # reduction/accumulation dtype

    # reference coupled-mode radiation ordering: thermo consumes LAST
    # step's per-category SW absorption rescaled by prep_radiation
    # (ice_step_mod.F90:33-154); radiation proper runs at the END of the
    # step on the post-dynamics state (step_radiation, :1364), feeding
    # the coupler and the next step. False = standalone ordering
    # (radiation at step start from current forcing; equivalent up to the
    # one-step albedo lag the reference accepts for coupler symmetry).
    coupled_radiation: bool = False

    @property
    def xp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def np_accum_dtype(self):
        return jnp.dtype(self.accum_dtype)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def column_config(**overrides) -> ModelConfig:
    """Single-column config (input_templates/col/ice_in analog): no dynamics."""
    cfg = ModelConfig(
        grid=GridConfig(nx=8, ny=8, grid_type="column",
                        ew_boundary="cyclic", ns_boundary="open"),
        dyn=DynConfig(kdyn=0, advection="none"),
        thermo=ThermoConfig(ktherm=1),
    )
    return cfg.replace(**overrides) if overrides else cfg


def rect_config(ny: int = 116, nx: int = 100, **overrides) -> ModelConfig:
    """Synthetic rectangular basin with default physics — the standard
    small/fast testing config (the reference's rectgrid, ice_grid.F90:1145)."""
    cfg = ModelConfig(
        grid=GridConfig(nx=nx, ny=ny, grid_type="rectangular",
                        ew_boundary="cyclic", ns_boundary="open"),
    )
    return cfg.replace(**overrides) if overrides else cfg


_REF_INPUTS = "/root/reference/input_templates"


def gx3_config(grid_dir: str | None = None, **overrides) -> ModelConfig:
    """gx3 standalone config mirroring /root/reference/input_templates/gx3/ice_in:
    real 100x116 3-degree POP displaced-pole grid (global_gx3.grid.nc +
    global_gx3.kmt.nc), mushy thermo, delta-Eddington shortwave,
    iage/lvl/pond_lvl tracers, Rothrock strength, slab mixed-layer ocean."""
    d = grid_dir or f"{_REF_INPUTS}/gx3"
    cfg = ModelConfig(
        grid=GridConfig(nx=100, ny=116, grid_type="displaced_pole",
                        ew_boundary="cyclic", ns_boundary="open",
                        grid_format="nc",
                        grid_file=f"{d}/global_gx3.grid.nc",
                        kmt_file=f"{d}/global_gx3.kmt.nc"),
        thermo=ThermoConfig(ktherm=2, dSdt_slow_mode=-5.0e-8),
        dyn=DynConfig(kdyn=1, ndte=120, advection="remap", kstrength=1,
                      krdg_partic=1, krdg_redist=1, mu_rdg=3.0, Cf=17.0),
        shortwave=ShortwaveConfig(shortwave="dEdd", R_ice=0.0, R_pnd=0.0,
                                  R_snw=1.5, dT_mlt=1.5, rsnw_mlt=1500.0),
        tracers=TracerConfig(tr_iage=True, tr_lvl=True, tr_pond_lvl=True,
                             hs0=0.0, hs1=0.03, hp1=0.01, dpscale=1e-3,
                             frzpnd="hlid", rfracmin=0.15, rfracmax=1.0,
                             pndaspect=0.8),
        forcing=ForcingConfig(oceanmixed_ice=True, natmiter=5),
        time=TimeConfig(dt=3600.0, year_init=1997),
        kcatbound=0,
    )
    return cfg.replace(**overrides) if overrides else cfg


def gx1_parity_config(**overrides) -> ModelConfig:
    """gx1 physics-parity config mirroring input_templates/gx1/ice_in:
    320x384, mushy thermo (ktherm=2), delta-Eddington shortwave,
    iage/FY/lvl/pond_lvl tracers, Rothrock strength, ndte=120, remap
    transport, slab mixed-layer ocean, kcatbound=0 — the configuration the
    CMHB IJHPCA-2014 baseline timings were measured at (BASELINE.md).

    The reference does not ship the gx1 grid file (only the KMT land mask),
    so the grid is synthesized by bench.py (synth_gx1_grid: 1-degree
    global mesh + the real global_gx1.kmt land mask, tripole ns seam) and
    passed to Model(cfg, grid=...).

    Vertical resolution matches the reference's compile-time default
    (bld/build.sh:52-53: NICELYR=4, NSNWLYR=1 — layer counts are CPP
    macros, not namelist entries; none of the shipped bld/config.nci.*
    override them). Pass nilyr=7 for the CICE-5 7-layer mushy column."""
    cfg = ModelConfig(
        nilyr=4,
        grid=GridConfig(nx=320, ny=384, grid_type="tripole",
                        ew_boundary="cyclic", ns_boundary="tripole"),
        thermo=ThermoConfig(ktherm=2, dSdt_slow_mode=-5.0e-8),
        dyn=DynConfig(kdyn=1, ndte=120, advection="remap", kstrength=1,
                      krdg_partic=1, krdg_redist=1, mu_rdg=4.0, Cf=17.0),
        shortwave=ShortwaveConfig(shortwave="dEdd", R_ice=0.0, R_pnd=0.0,
                                  R_snw=1.5, dT_mlt=1.5, rsnw_mlt=1500.0),
        tracers=TracerConfig(tr_iage=True, tr_FY=True, tr_lvl=True,
                             tr_pond_lvl=True, hs0=0.0, hs1=0.03, hp1=0.01,
                             dpscale=1e-3, frzpnd="hlid"),
        forcing=ForcingConfig(oceanmixed_ice=True, natmiter=5),
        time=TimeConfig(dt=3600.0),
        kcatbound=0,
    )
    return cfg.replace(**overrides) if overrides else cfg


def tp1_config(grid_dir: str | None = None, **overrides) -> ModelConfig:
    """tp1 tripole config (input_templates/tp1): the shipped 100x116 POP grid
    driven with a tripole north seam (ns_boundary_type tripole), otherwise
    gx3 physics."""
    d = grid_dir or f"{_REF_INPUTS}/tp1"
    cfg = gx3_config()
    return cfg.replace(
        grid=GridConfig(nx=100, ny=116, grid_type="tripole",
                        ew_boundary="cyclic", ns_boundary="tripole",
                        grid_format="nc",
                        grid_file=f"{d}/global_tp1.grid.nc",
                        kmt_file=f"{d}/global_tp1.kmt.nc"),
        **overrides)


def auscom_025_config(**overrides) -> ModelConfig:
    """ACCESS-OM 0.25-degree production config: 1440x1080 tripole, gx1
    physics parity (bld/config.nci.auscom.1440x1080; the coupled-model
    run-length configs of BASELINE.md). The reference runs this at 192-722
    MPI tasks; here the same step runs on one chip, or sharded by
    ShardedModel. Grid synthesized (bench.synth_spherical_grid) — the grid
    file lives in the coupled model's input bundle, not this repo."""
    cfg = gx1_parity_config()
    return cfg.replace(
        grid=GridConfig(nx=1440, ny=1080, grid_type="tripole",
                        ew_boundary="cyclic", ns_boundary="tripole"),
        **overrides)


def tx01_config(**overrides) -> ModelConfig:
    """tx0.1 0.1-degree production config: 3600x2700 tripole, gx1 physics
    parity (bld/config.nci.auscom.3600x2700; CMHB-2014 Table 4 scaling
    runs used 3600x2400 with dt such that 10 days = 240 steps). The state
    alone is ~9 GB in f32 at this size — meant for ShardedModel over a
    multi-chip mesh, not a single chip."""
    cfg = gx1_parity_config()
    return cfg.replace(
        grid=GridConfig(nx=3600, ny=2700, grid_type="tripole",
                        ew_boundary="cyclic", ns_boundary="tripole"),
        **overrides)
