"""Benchmark: full-model step throughput on the gx1 grid size, one chip.

Prints ONE JSON line with the HEADLINE metric measured at gx1 PHYSICS
PARITY — the configuration of the reference baseline runs
(input_templates/gx1/ice_in + CMHB IJHPCA-2014): mushy thermo,
delta-Eddington shortwave, iage/FY/lvl/pond_lvl tracers, 120 EVP
subcycles, remap transport, slab ocean, tripole north seam, and the REAL
gx1 land mask (global_gx1.kmt; ~37% land). The easier BL99+CCSM3 zero-
tracer configuration of round 1 is also timed and reported as an extra
key for continuity.

Baseline (BASELINE.md, corrected label): the reference gx1 10-day run at
320 Hopper tasks sustains 1.372e6 cell-steps/s AGGREGATE for the whole
320-task job (320x384 cells x 240 steps / 21.5 s). vs_baseline is our
single-chip rate at the same global grid size and physics divided by that
whole-job rate — one TPU chip vs 320 Cray XE6 tasks.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the gx1 compiles are host-CPU-bound
# (~2-8 min under load); caching them makes repeated bench runs start in
# seconds and immunizes the timing run against host contention. Steady-
# state step timings (measured post-warmup) are unaffected.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/cice5_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

REARTH = 6.37e6
GX1_KMT = "/root/reference/input_templates/gx1/global_gx1.kmt"


def _gx1_kmt():
    if os.path.exists(GX1_KMT):
        return np.fromfile(GX1_KMT, dtype=">i4").reshape(384, 320)
    kmt = np.ones((384, 320), np.int32)   # fallback: polar land bands
    kmt[:8] = 0
    return kmt


def synth_gx1_grid(cfg):
    """Synthesize a global spherical mesh carrying a REAL land mask.

    The reference ships only the gx1 KMT file, not the grid metrics
    (ice_grid.F90 would read both). Metrics here are a uniform spherical
    mesh (zonal cell width shrinking poleward, clamped at the
    pole rows) — the throughput-relevant properties (shape, land fraction,
    metric variability, tripole seam) match; the exact pole displacement
    does not affect timing. For non-gx1 shapes (auscom_025/tx01 production
    configs) the gx1 KMT is nearest-neighbor resampled, preserving the
    land fraction.
    """
    from cice5_tpu.grid import popgrid_np
    ny, nx = cfg.grid.ny, cfg.grid.nx
    kmt = _gx1_kmt()
    if kmt.shape != (ny, nx):
        jj = (np.arange(ny) * kmt.shape[0] // ny)
        ii = (np.arange(nx) * kmt.shape[1] // nx)
        kmt = kmt[jj][:, ii]
    lat = np.linspace(-79.0, 89.0, ny)
    dlat = lat[1] - lat[0]
    ulat = np.broadcast_to(lat[:, None], (ny, nx)).copy()
    ulon = np.broadcast_to(
        np.linspace(0.0, 2 * np.pi, nx, endpoint=False)[None, :],
        (ny, nx)).copy()
    htn = np.maximum(2 * np.pi * REARTH * np.cos(np.deg2rad(ulat)) / nx,
                     3.0e3)
    hte = np.full((ny, nx), REARTH * np.deg2rad(dlat))
    angle = np.zeros((ny, nx))
    return popgrid_np(cfg, np.deg2rad(ulat), ulon, htn, hte, angle, kmt)


class BenchFailure(SystemExit):
    """Raised (exits nonzero) when a timing run fails its sanity guards —
    a wedged device, collapsed state, or dead-code-eliminated window must
    never be recorded as a result (round-3 postmortem: BENCH_r03.json
    recorded a physically impossible 0.11 ms/step that nothing caught)."""

    def __init__(self, msg):
        super().__init__(f"BENCH GUARD FAILED: {msg}")


def _check_health(m, state, diag, label):
    """Assert the timed state is the real thing: finite, ice-covered
    within sane global bounds, thermo converged, no in-step l_stop flags.
    """
    vicen = np.asarray(state.vicen)
    aicen = np.asarray(state.aicen)
    if not np.isfinite(vicen).all() or not np.isfinite(aicen).all():
        raise BenchFailure(f"{label}: non-finite state after timing")
    tarea = np.asarray(m.grid.tarea)
    tmask = np.asarray(m.grid.tmask)
    ocean_area = float((tarea * tmask).sum())
    ice_area = float((aicen.sum(0) * tarea * tmask).sum())
    frac = ice_area / ocean_area
    if not (0.005 < frac < 1.05):
        raise BenchFailure(
            f"{label}: global ice fraction {frac:.4f} of ocean area is "
            "outside sane bounds (0.5%..105%) — state collapsed or blew up")
    if float(vicen.sum()) <= 0.0:
        raise BenchFailure(f"{label}: zero total ice volume")
    if diag is not None:
        if int(np.asarray(diag.state_bad)) > 0:
            raise BenchFailure(
                f"{label}: in-step state_bad={int(np.asarray(diag.state_bad))}")
        if not bool(np.asarray(diag.therm_converged)):
            raise BenchFailure(f"{label}: thermo solver did not converge")


def _time_steps(m, state, n=10, window=None):
    """Time via a scanned rollout window (ONE dispatch per window — the
    production launch shape; per-step dispatch through the axon tunnel
    adds ~2 ms/step that no real deployment pays).

    Guards (see BenchFailure): state health is asserted before AND after
    the timed window, and the rollout timing is cross-checked against a
    3-step per-step timing — if they disagree by more than 3x the run
    aborts nonzero instead of recording garbage.
    """
    import jax
    forcing = m.forcing_at(0)
    w = window or n
    s, d = m.rollout(state, forcing, w)   # compile + warmup
    jax.block_until_ready(s.vicen)
    _check_health(m, s, d, "post-warmup")
    t0 = time.perf_counter()
    s, d = m.rollout(s, forcing, w)
    jax.block_until_ready(s.vicen)
    dt_roll = (time.perf_counter() - t0) / w
    _check_health(m, s, d, "post-timing")
    # cross-check: 3 individually dispatched steps (already compiled via
    # the scan body? no — separate jit; compile once, then time the min)
    s2, d2 = m.step(s, forcing)
    jax.block_until_ready(s2.vicen)
    per_step = []
    for _ in range(3):
        t0 = time.perf_counter()
        s2, d2 = m.step(s2, forcing)
        jax.block_until_ready(s2.vicen)
        per_step.append(time.perf_counter() - t0)
    dt_single = min(per_step)
    _check_health(m, s2, d2, "per-step cross-check")
    if not (dt_single / 3.0 < dt_roll < dt_single * 3.0 + 1e-3):
        raise BenchFailure(
            f"rollout timing {dt_roll*1e3:.3f} ms/step disagrees >3x with "
            f"per-step timing {dt_single*1e3:.3f} ms/step — one of them "
            "did not do the work")
    return dt_roll, dt_single


def bench_parity(**overrides):
    from cice5_tpu.config import gx1_parity_config
    from cice5_tpu.driver.model import Model
    cfg = gx1_parity_config(**overrides)
    grid = synth_gx1_grid(cfg)
    m = Model(cfg, grid=grid)
    state = m.init_state()               # reference 70N/60S edge init
    dt_roll, dt_single = _time_steps(m, state)
    return dt_roll, dt_single, cfg.grid.nx * cfg.grid.ny


def bench_easy():
    from __graft_entry__ import _make_model
    m = _make_model(nx=320, ny=384, ndte=120, dtype="float32",
                    advection="remap")
    state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    dt_roll, dt_single = _time_steps(m, state)
    return dt_roll, dt_single, 320 * 384


def bench_big():
    """Optional (--big): the 0.25-degree ACCESS-OM production size
    (1440x1080, bld/config.nci.auscom.1440x1080) at gx1 physics parity on
    one chip — demonstrates production-grid capability and that the
    cell rate scales with grid size (HBM-bound step)."""
    from cice5_tpu.config import auscom_025_config
    from cice5_tpu.driver.model import Model
    cfg = auscom_025_config()
    grid = synth_gx1_grid(cfg)
    m = Model(cfg, grid=grid)
    state = m.init_state()
    dt_roll, dt_single = _time_steps(m, state, n=5)
    return dt_roll, dt_single, cfg.grid.nx * cfg.grid.ny


def bench_tx01():
    """Optional (--tx01): NUMERICAL sanity (not a timing) at the
    0.1-degree production size 3600x2700
    (bld/config.nci.auscom.3600x2700: the reference runs it at 722-18000
    MPI tasks) under ShardedModel on a virtual 8-device CPU mesh: two
    full parity-physics steps, asserting finite state, in-step health
    (state_bad==0), and sane global budgets."""
    import jax
    from cice5_tpu.config import gx1_parity_config
    from cice5_tpu.driver.sharded import ShardedModel
    from cice5_tpu.io import diagnostics as diag_mod
    cfg = gx1_parity_config()
    cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, nx=3600, ny=2700))
    grid = synth_gx1_grid(cfg)
    sm = ShardedModel(cfg, devices=jax.devices()[:8], grid=grid)
    st = sm.init_state()
    for k in range(2):
        st, d = sm.step(st, sm.forcing_at(k))
    jax.block_until_ready(st.vicen)
    if int(np.asarray(d.state_bad)) > 0:
        raise BenchFailure(f"tx01: state_bad={int(np.asarray(d.state_bad))}")
    _check_health(sm, st, d, "tx01")
    gd = diag_mod.compute_diags(st, sm.grid, sm.tr, cfg.nilyr, cfg.nslyr)
    for kk, v in gd._asdict().items():
        if not np.isfinite(v):
            raise BenchFailure(f"tx01: non-finite global budget {kk}")
    return {"metric": "tx01_sanity", "tx01_ok": True,
            "cells": cfg.grid.nx * cfg.grid.ny,
            "mesh": list(sm.mesh.devices.shape),
            "extent_nh_km2": round(float(gd.extentn) / 1e6, 1),
            "note": ("two full gx1-parity-physics steps at the tx0.1 "
                     "production size on a virtual 8-device CPU mesh; "
                     "finite state + in-step health + global budgets")}


def bench_tenday():
    """Optional (--tenday): the reference's actual headline benchmark —
    a 10-model-day gx1 run (240 hourly steps, CMHB IJHPCA-2014 Tables
    2-3) wall-to-wall on one chip at physics parity. The Hopper numbers:
    211.9 s @16 tasks, 21.5 s @320 tasks, 10.5 s @1280 tasks."""
    import jax
    from cice5_tpu.config import gx1_parity_config
    from cice5_tpu.driver.model import Model
    cfg = gx1_parity_config()
    grid = synth_gx1_grid(cfg)
    m = Model(cfg, grid=grid)
    state = m.init_state()
    forcing = m.forcing_at(0)
    s, d = m.rollout(state, forcing, 240)   # compile outside the window
    jax.block_until_ready(s.vicen)
    _check_health(m, s, d, "tenday warmup")
    t0 = time.perf_counter()
    s, d = m.rollout(state, forcing, 240)
    jax.block_until_ready(s.vicen)
    wall = time.perf_counter() - t0
    _check_health(m, s, d, "tenday post-timing")
    if wall < 240 * 1e-3:   # < 1 ms/step is below the HBM-traffic floor
        raise BenchFailure(
            f"10-day wall {wall:.3f}s implies <1 ms/step — impossible")
    return wall


def main():
    import sys
    if "--tx01" in sys.argv:
        # needs an 8-device virtual CPU mesh: re-exec in a clean CPU env
        # if the axon TPU plugin grabbed the backend (conftest pattern)
        if os.environ.get("PALLAS_AXON_POOL_IPS"):
            import subprocess
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["PYTHONPATH"] = os.pathsep.join(
                p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                if p and "axon" not in p)
            env["JAX_PLATFORMS"] = "cpu"
            flags = env.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count=8"
                ).strip()
            raise SystemExit(subprocess.run(
                [sys.executable, __file__, "--tx01"], env=env).returncode)
        print(json.dumps(bench_tx01()))
        return
    if "--tenday" in sys.argv:
        wall = bench_tenday()
        print(json.dumps({
            "metric": "gx1_parity_10day_wall_seconds_per_chip",
            "value": round(wall, 2),
            "unit": "s",
            "vs_baseline": round(21.5 / wall, 3),
            "note": ("full 10-day gx1 benchmark (240 hourly steps, gx1 "
                     "physics parity) on ONE chip; baseline 21.5 s = the "
                     "whole 320-task Hopper job (CMHB Table 3; 16 tasks "
                     "took 211.9 s, 1280 tasks 10.5 s)"),
        }))
        return
    if "--big" in sys.argv:
        dt_big, dt_big_single, cells_big = bench_big()
        print(json.dumps({
            "metric": "auscom025_parity_cell_steps_per_sec_per_chip",
            "value": round(cells_big / dt_big, 1),
            "unit": "cell*steps/s",
            "step_ms": round(dt_big * 1e3, 2),
            "per_step_dispatch_ms": round(dt_big_single * 1e3, 2),
            "big_ok": True,   # _check_health passed: finite, ice-covered
            "note": ("0.25-deg ACCESS-OM production size 1440x1080, gx1 "
                     "physics parity, one chip; reference runs this "
                     "coupled at 192-722 MPI tasks"),
        }))
        return
    dt_parity, dt_parity_single, cells = bench_parity()
    dt_7lyr, _, _ = bench_parity(nilyr=7)
    dt_easy, _, _ = bench_easy()
    rate = cells / dt_parity
    rate_easy = cells / dt_easy
    baseline = 1.372e6   # whole 320-task Hopper job, cell-steps/s (CMHB T3)
    print(json.dumps({
        "metric": "gx1_parity_cell_steps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "cell*steps/s",
        "vs_baseline": round(rate / baseline, 3),
        "note": ("full gx1 physics (mushy+dEdd+iage/FY/lvl/pond_lvl, "
                 "ndte=120, remap, slab ocean, real gx1 land mask, tripole "
                 "seam) at the reference's compile default NICELYR=4 "
                 "(bld/build.sh:52); baseline = whole 320-task Hopper job "
                 "aggregate rate, 1 chip vs 320 tasks"),
        "step_ms": round(dt_parity * 1e3, 2),
        "per_step_dispatch_ms": round(dt_parity_single * 1e3, 2),
        "health_guards": "passed",   # finite+ice-covered+converged, and
        # rollout vs per-step timings agree within 3x (see BenchFailure)
        "nilyr7_step_ms": round(dt_7lyr * 1e3, 2),
        "easy_config_value": round(rate_easy, 1),
        "easy_config_step_ms": round(dt_easy * 1e3, 2),
        # multi-chip EVP communication: per-subcycle halo (ndte exchanges)
        # or chunked margin decay (evp_algorithm='chunked': ndte/K slab
        # exchanges; tests/test_evp_chunked.py counts them in the lowered
        # program)
        "sharded_evp_exchanges_per_dyn_step": {"per_subcycle": 120,
                                               "chunked_K10": 12},
    }))


if __name__ == "__main__":
    main()
