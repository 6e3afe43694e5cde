"""Benchmark: full-model step throughput on a gx1-sized grid, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CICE5 gx1 run at 320 Hopper tasks sustains
1.37e6 grid-cell-steps/s per task for the FULL model step
(BASELINE.md: 320x384 x 240 steps / 21.5 s / 320 tasks). vs_baseline is
our per-chip full-step cell rate at the SAME global grid size (320x384)
divided by that per-task rate.
"""
import json
import time

import numpy as np


def main():
    import jax
    from __graft_entry__ import _make_model

    # gx1-sized domain (BASELINE.md: 320x384); full physics incl. remap
    # transport, 120 EVP subcycles, mixed-layer ocean
    nx, ny = 320, 384
    m = _make_model(nx=nx, ny=ny, ndte=120, dtype="float32",
                    advection="remap")
    state = m.init_state(ice_mask=np.asarray(m.grid.tmask))

    forcing = m.forcing_at(0)
    step = lambda s: m._jstep(s, forcing, m.grid)[0]
    # warmup/compile
    s = step(state)
    jax.block_until_ready(s.vicen)

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        s = step(s)
    jax.block_until_ready(s.vicen)
    dt_step = (time.perf_counter() - t0) / n

    cells = nx * ny
    rate = cells / dt_step                     # full-model cell-steps/s/chip
    baseline = 1.37e6                          # per Hopper task (BASELINE.md)
    print(json.dumps({
        "metric": "full_step_cell_steps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "cell*steps/s",
        "vs_baseline": round(rate / baseline, 3),
    }))


if __name__ == "__main__":
    main()
