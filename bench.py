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
import json
import os
import time

import numpy as np

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


def _time_steps(m, state, n=10, window=None):
    """Time via a scanned rollout window (ONE dispatch per window — the
    production launch shape; per-step dispatch through the axon tunnel
    adds ~2 ms/step that no real deployment pays)."""
    import jax
    forcing = m.forcing_at(0)
    w = window or n
    s, _ = m.rollout(state, forcing, w)   # compile + warmup
    jax.block_until_ready(s.vicen)
    t0 = time.perf_counter()
    s, _ = m.rollout(s, forcing, w)
    jax.block_until_ready(s.vicen)
    return (time.perf_counter() - t0) / w


def bench_parity(**overrides):
    from cice5_tpu.config import gx1_parity_config
    from cice5_tpu.driver.model import Model
    cfg = gx1_parity_config(**overrides)
    grid = synth_gx1_grid(cfg)
    m = Model(cfg, grid=grid)
    state = m.init_state()               # reference 70N/60S edge init
    return _time_steps(m, state), cfg.grid.nx * cfg.grid.ny


def bench_easy():
    from __graft_entry__ import _make_model
    m = _make_model(nx=320, ny=384, ndte=120, dtype="float32",
                    advection="remap")
    state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    return _time_steps(m, state), 320 * 384


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
    return _time_steps(m, state, n=5), cfg.grid.nx * cfg.grid.ny


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
    s, _ = m.rollout(state, forcing, 240)   # compile outside the window
    jax.block_until_ready(s.vicen)
    t0 = time.perf_counter()
    s, _ = m.rollout(state, forcing, 240)
    jax.block_until_ready(s.vicen)
    return time.perf_counter() - t0


def main():
    import sys
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
        dt_big, cells_big = bench_big()
        print(json.dumps({
            "metric": "auscom025_parity_cell_steps_per_sec_per_chip",
            "value": round(cells_big / dt_big, 1),
            "unit": "cell*steps/s",
            "step_ms": round(dt_big * 1e3, 2),
            "note": ("0.25-deg ACCESS-OM production size 1440x1080, gx1 "
                     "physics parity, one chip; reference runs this "
                     "coupled at 192-722 MPI tasks"),
        }))
        return
    dt_parity, cells = bench_parity()
    dt_7lyr, _ = bench_parity(nilyr=7)
    dt_easy, _ = bench_easy()
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
