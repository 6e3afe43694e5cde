"""Model container: initialization + run loop.

Equivalent of the reference standalone driver
(/root/reference/drivers/cice/CICE_InitMod.F90:52 cice_init,
CICE_RunMod.F90:37 CICE_Run) and default initial conditions
(ice_init.F90:1475 set_state_var): builds grid/registry/static tables,
initializes the state (ice at cold high latitudes with a parabolic ITD
centered on hbar=3 m), and steps the jitted step function.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cice5_tpu import constants as ct
from cice5_tpu.calendar import Calendar
from cice5_tpu.config import ModelConfig
from cice5_tpu.driver.step import step as step_fn
from cice5_tpu.forcing import Forcing, idealized_polar_forcing
from cice5_tpu.grid import Grid, make_grid
from cice5_tpu.models.thermo import itd, shared as thshared
from cice5_tpu.parallel import Topology
from cice5_tpu.state import State, build_tracer_registry, zeros_state

EDGE_INIT_NH = 70.0
EDGE_INIT_SH = -60.0
HSNO_INIT = 0.20


def initial_itd(cfg: ModelConfig, hin_max):
    """Parabolic initial category areas/thicknesses
    (ice_init.F90:1617-1635)."""
    hbar = 3.0
    hinit = np.zeros(cfg.ncat)
    ainit = np.zeros(cfg.ncat)
    for n in range(cfg.ncat):
        if n < cfg.ncat - 1:
            hinit[n] = 0.5 * (hin_max[n] + hin_max[n + 1])
        else:
            hinit[n] = hin_max[n] + 1.0
        ainit[n] = max(0.0, 2.0 * hbar * hinit[n] - hinit[n] ** 2)
    ainit /= ainit.sum() + ct.puny / cfg.ncat
    return ainit, hinit


def init_state(cfg: ModelConfig, grid: Grid, tr, hin_max, salinz,
               Tair=None, sst=None, ice_mask=None) -> State:
    """Default initial state (ice_init.F90:1475-1813 set_state_var)."""
    ny, nx = grid.shape
    dtype = cfg.xp_dtype
    st = zeros_state(cfg, tr)
    sss = 34.0
    Tf = -ct.depressT * sss

    ulat_deg = np.rad2deg(np.asarray(grid.ULAT))
    tmask = np.asarray(grid.tmask)
    if ice_mask is None:
        ice_mask = tmask & ((ulat_deg > EDGE_INIT_NH)
                            | (ulat_deg < EDGE_INIT_SH))
    msk = jnp.asarray(ice_mask)

    ainit, hinit = initial_itd(cfg, hin_max)
    ones = jnp.ones((cfg.ncat, ny, nx), dtype)
    aicen = jnp.where(msk[None],
                      jnp.asarray(ainit, dtype)[:, None, None] * ones, 0.0)
    vicen = jnp.where(msk[None],
                      jnp.asarray(ainit * hinit, dtype)[:, None, None] * ones,
                      0.0)
    vsnon = jnp.minimum(aicen * HSNO_INIT, 0.2 * vicen)

    TairC = (Tair - ct.Tffresh) if Tair is not None else -15.0
    Tsfc0 = jnp.minimum(ct.Tsmelt, TairC)
    trcrn = st.trcrn
    trcrn = trcrn.at[:, tr.nt_Tsfc].set(
        jnp.where(msk[None], Tsfc0, Tf))
    sal = jnp.asarray(salinz, dtype)
    Tmltz = -sal * ct.depressT
    # linear temperature profile between Tsfc and Tf, converted to enthalpy
    for k in range(cfg.nilyr):
        zfrac = (k + 0.5) / cfg.nilyr
        Ti = jnp.minimum(Tsfc0 + (Tf - Tsfc0) * zfrac, Tmltz[k] - 0.1)
        qk = thshared.ice_enthalpy(Ti, Tmltz[k])
        if cfg.thermo.ktherm == 0:   # zero-layer: latent heat only
            qk = jnp.full_like(qk, -ct.rhoi * ct.Lfresh)
        trcrn = trcrn.at[:, tr.nt_qice + k].set(jnp.where(msk[None], qk, 0.0))
        trcrn = trcrn.at[:, tr.nt_sice + k].set(
            jnp.where(msk[None], sal[k], 0.0))
    qs = thshared.snow_enthalpy(jnp.minimum(Tsfc0, -1.0))
    if cfg.thermo.ktherm == 0:
        qs = jnp.full_like(qs, -ct.rhos * ct.Lfresh)
    for k in range(cfg.nslyr):
        trcrn = trcrn.at[:, tr.nt_qsno + k].set(
            jnp.where(msk[None], qs, -ct.rhos * ct.Lfresh))
    if tr.nt_alvl >= 0:
        trcrn = trcrn.at[:, tr.nt_alvl].set(jnp.where(msk[None], 1.0, 0.0))
        trcrn = trcrn.at[:, tr.nt_vlvl].set(jnp.where(msk[None], 1.0, 0.0))
    if tr.nt_fbri >= 0:
        trcrn = trcrn.at[:, tr.nt_fbri].set(1.0)

    sst0 = jnp.full((ny, nx), Tf, dtype) if sst is None else sst
    return st.replace(aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                      sst=sst0 * jnp.asarray(np.asarray(tmask), dtype))


@dataclass
class Model:
    """Convenience driver for standalone runs.

    grid: optional pre-built Grid (e.g. synthesized or read elsewhere);
    defaults to make_grid(cfg)."""
    cfg: ModelConfig
    grid: Grid | None = None

    def __post_init__(self):
        cfg = self.cfg
        if self.grid is None:
            self.grid = make_grid(cfg)
        self.tr = build_tracer_registry(cfg)
        self.hin_max = itd.category_bounds(cfg.ncat, cfg.kitd, cfg.kcatbound)
        self.salinz = thshared.salinity_profile(cfg.nilyr, cfg.thermo.saltmax,
                                                cfg.thermo.nsal,
                                                cfg.thermo.msal)
        self.topo = Topology(ew=cfg.grid.ew_boundary, ns=cfg.grid.ns_boundary)
        self.calendar = Calendar(cfg.time.year_init, cfg.time.days_per_year,
                                 cfg.time.use_leap_years)
        # ocean-column packing for the column-physics section (the analog
        # of the reference's icells/indxi/indxj compressed lists,
        # ice_therm_vertical.F90:186-200). Single-device only (sharded
        # runs would need equal packed sizes per shard; ShardedModel
        # stays dense), and — measured — a LOSS everywhere (see
        # GridConfig.compact_columns), so "auto" == "off"; "on" forces
        # packing and is kept equivalence-tested by
        # tests/test_column_packing.py so the path stays exercised.
        self.packing = None
        if cfg.grid.compact_columns == "on":
            from cice5_tpu.driver.step import pack_columns
            self.packing = pack_columns(self.grid.tmask)
        self._jstep = jax.jit(partial(
            step_fn, cfg=cfg, tr=self.tr, topo=self.topo,
            hin_max=self.hin_max, salinz=self.salinz,
            packing=self.packing))
        # orbital parameters for the run's epoch (ice_orbital.F90 init_orbit;
        # Berger-1978 series evaluated once host-side, trace-time constants)
        from cice5_tpu.models.radiation.orbital import shr_orb_params
        sw = cfg.shortwave
        self.orb = shr_orb_params(sw.iyear_orb, eccen=sw.orb_eccen,
                                  obliq=sw.orb_obliq, mvelp=sw.orb_mvelp)
        self._jforcing = jax.jit(partial(
            idealized_polar_forcing, self.grid.shape,
            dtype=cfg.xp_dtype, tlat=self.grid.TLAT,
            tlon=self.grid.TLON, orb=self.orb))

    def init_state(self, **kw) -> State:
        # slab-ocean runs start SST from the forcing's open-water SST
        # (the reference reads sst from the ocean climatology at init,
        # ice_forcing.F90:3161); default Tf everywhere otherwise
        if "sst" not in kw and self.cfg.forcing.oceanmixed_ice \
                and self.forcing_provider is None:
            kw["sst"] = self.forcing_at(0).sst
        st = init_state(self.cfg, self.grid, self.tr, self.hin_max,
                        self.salinz, **kw)
        if self.cfg.coupled_radiation:
            # init_shortwave analog: seed the radiation memory so the
            # first coupled-ordering step has nonzero SW
            from cice5_tpu.driver.step import prefill_radiation
            st = prefill_radiation(st, self.forcing_at(0), self.cfg,
                                   self.tr)
        return st

    forcing_provider = None   # optional: callable(istep, info) -> Forcing

    def forcing_at(self, istep: int) -> Forcing:
        info = self.calendar.info(istep, self.cfg.time.dt)
        if self.forcing_provider is not None:
            return self.forcing_provider(istep, info)
        return self._jforcing(info.yday)

    def step(self, state: State, forcing: Forcing):
        return self._jstep(state, forcing, self.grid)

    def run(self, state: State, nsteps: int, **kw):
        """Time loop (CICE_RunMod.F90:37-90 CICE_Run): step + diagnostics +
        history accumulation/write + restart dumps."""
        return run_loop(self, state, nsteps, **kw)

    _rollouts: dict | None = None

    def rollout(self, state: State, forcing, nsteps: int,
                stacked: bool | None = None):
        """Advance nsteps under ONE device dispatch (``lax.scan`` over the
        step). The per-step launch path costs ~2 ms through a remote/
        tunneled runtime — a windowed scan amortizes it to nothing, the
        production shape for long forced segments (e.g. the coupling
        window between from_atm exchanges, drivers/auscom/
        CICE_RunMod.F90:194-202 num_ice_io inner loop).

        ``forcing`` is either one Forcing pytree (held fixed — the bench/
        coupling-window case) or a stacked pytree with a leading
        ``nsteps`` axis (one entry per step, scanned through); ``stacked``
        overrides the shape-based auto-detection. Returns
        (state, diag-of-last-step). Step count is static per compile;
        windows of the same length reuse the cache."""
        import jax
        if stacked is None:
            stacked = all(getattr(x, "shape", ())[:1] == (nsteps,)
                          for x in jax.tree.leaves(forcing))
        if self._rollouts is None:
            self._rollouts = {}
        key = (nsteps, stacked)
        fn = self._rollouts.get(key)
        if fn is None:
            from jax import lax
            jstep = partial(step_fn, cfg=self.cfg, tr=self.tr,
                            topo=self.topo, hin_max=self.hin_max,
                            salinz=self.salinz, packing=self.packing)

            def roll(state, forcing, grid):
                if stacked:
                    head = jax.tree.map(lambda x: x[:-1], forcing)
                    last = jax.tree.map(lambda x: x[-1], forcing)
                    s, _ = lax.scan(lambda s, f: (jstep(s, f, grid)[0], None),
                                    state, head)
                else:
                    s, _ = lax.scan(
                        lambda s, _: (jstep(s, forcing, grid)[0], None),
                        state, None, length=nsteps - 1)
                    last = forcing
                # final step outside the scan so the last diag is returned
                # without carrying/stacking diags for every window step
                return jstep(s, last, grid)
            fn = jax.jit(roll)
            self._rollouts[key] = fn
        return fn(state, forcing, self.grid)

    def profile(self, state: State, nsteps: int = 3,
                outdir: str = "/tmp/cice5_profile") -> str:
        """Capture an xprof/TensorBoard trace of nsteps (the
        tracing/profiling subsystem of SURVEY §5 — the ice_timers +
        Score-P analog). Compiles outside the trace window; analyze the
        resulting .xplane.pb with xprof hlo_stats (per-op self time,
        source attribution, roofline bound) or TensorBoard."""
        import jax
        f = self.forcing_at(0)
        s, _ = self.step(state, f)
        jax.block_until_ready(s.aicen)
        with jax.profiler.trace(outdir):
            for _ in range(nsteps):
                s, _ = self.step(s, f)
            jax.block_until_ready(s.aicen)
        return outdir


def run_loop(m, state, nsteps: int, start_step: int = 0,
             diag_every: int = 0, diag_fn=None, history=None,
             history_dir: str = "history", restart_every: int = 0,
             restart_dir: str = "restart", log=print,
             check_every: int = 0, dump_last: bool = False):
    """Shared driver time loop for Model and ShardedModel
    (CICE_RunMod.F90:37-90 CICE_Run): step + runtime diagnostics + history
    accumulation/write + restart dumps + state health checks. `m` needs
    .cfg/.grid/.tr/.topo/.calendar/.step/.forcing_at; sharded arrays
    gather transparently at the numpy boundaries (history/restart/diags).
    """
    import os
    from cice5_tpu.io import diagnostics as diag_mod
    from cice5_tpu.io import history as hist_mod
    from cice5_tpu.io import restart as restart_mod

    cfg = m.cfg
    rest = state if cfg.forcing.restore_ice else None
    restore_topo = m.topo
    if rest is not None and m.topo.sharded:
        # outside shard_map the state arrays are GLOBAL jax.Arrays, so the
        # boundary nudge (elementwise, static edge mask, no communication)
        # applies with the global-domain topology; XLA keeps the sharding
        import dataclasses as _dc
        restore_topo = _dc.replace(m.topo, axis_x=None, axis_y=None)
    diag = None
    for k in range(nsteps):
        istep = start_step + k
        forcing = m.forcing_at(istep)
        state, diag = m.step(state, forcing)
        if rest is not None:
            from cice5_tpu.models.restoring import restore_ice
            state = restore_ice(cfg.time.dt, cfg.forcing.trestore,
                                state, rest, restore_topo)
        info = m.calendar.info(istep + 1, cfg.time.dt)

        if check_every:
            # the in-step flag is computed inside the jitted step every
            # step (l_stop analog) — reading it costs one scalar sync
            if int(diag.state_bad) > 0 or (istep % check_every == 0):
                from cice5_tpu.io.diagnostics import check_state
                if not check_state(state, m.grid, m.tr, cfg.nilyr,
                                   cfg.nslyr, istep=istep, log=log):
                    raise RuntimeError(
                        f"check_state failed at istep {istep}: "
                        f"{int(diag.state_bad)} bad state values "
                        "(see log for the offending cell dump)")

        if diag_every and (istep % diag_every == 0):
            gd = diag_mod.compute_diags(state, m.grid, m.tr,
                                        cfg.nilyr, cfg.nslyr)
            log(diag_mod.format_diags(istep, gd))
            if diag_fn is not None:
                diag_fn(istep, state, diag)

        if history is not None:
            history.accum(hist_mod.diag_to_values(
                diag, state, m.grid, tr=m.tr, forcing=forcing,
                nilyr=cfg.nilyr, nslyr=cfg.nslyr), info.time)
            if hasattr(history, "write_ready"):   # HistoryStreams
                for fn in history.write_ready(m.grid, info, history_dir):
                    log(f"wrote history {fn}")
            elif history.ready(info):
                fn = os.path.join(
                    history_dir,
                    f"iceh.{info.year:04d}-{info.month:02d}-"
                    f"{info.mday:02d}-{info.sec:05d}.nc")
                hist_mod.write_netcdf(history, m.grid, info, fn)
                log(f"wrote history {fn}")

        write_last = dump_last and k == nsteps - 1
        if (restart_every and ((istep + 1) % restart_every == 0)) \
                or write_last:
            # dump_last: always checkpoint at job end regardless of the
            # periodic schedule (setup_nml dump_last,
            # input_templates/gx3/ice_in:21)
            fn = os.path.join(
                restart_dir,
                f"iced.{info.year:04d}-{info.month:02d}-"
                f"{info.mday:02d}-{info.sec:05d}.npz")
            restart_mod.dump(state, fn, istep=istep + 1, time=info.time)
            log(f"wrote restart {fn}")
    return state
