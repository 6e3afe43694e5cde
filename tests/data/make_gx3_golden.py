"""Generate the pinned gx3 golden-trajectory diagnostics.

SURVEY section 4(e) asks for a "golden-run" regression against reference
trajectories. The reference Fortran cannot run in this environment and
ships no forcing data (input_templates/gx3 has grids only), so the pin is
the repo's own first verified-correct run (VERDICT r3 missing item 5):
a 24-hour full-physics gx3 integration (mushy + dEdd + iage/lvl/pond_lvl
+ remap + ridging + slab ocean, real displaced-pole grid and KMT) under
the idealized polar forcing, in f64 so the trajectory is insensitive to
XLA fusion noise. The companion test asserts future code reproduces these
global budgets, and separately that they sit in the climatologically sane
range for a January Arctic (extent/thickness bounds).

Run on CPU from the repo root:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python tests/data/make_gx3_golden.py
"""
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from cice5_tpu.config import gx3_config  # noqa: E402
from cice5_tpu.driver.model import Model  # noqa: E402
from cice5_tpu.io import diagnostics as diag_mod  # noqa: E402

NSTEPS = 24   # one model day at dt=3600
NDTE = 20     # reduced subcycling for CPU runtime (physics otherwise full)


def golden_cfg():
    cfg = gx3_config()
    return cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=NDTE),
                       dtype="float64", accum_dtype="float64")


def main():
    m = Model(golden_cfg())
    st = m.init_state()
    st = m.run(st, nsteps=NSTEPS, diag_every=0)
    gd = diag_mod.compute_diags(st, m.grid, m.tr, m.cfg.nilyr, m.cfg.nslyr)
    out = {
        "nsteps": NSTEPS,
        "ndte": NDTE,
        "dtype": "float64",
        "jax_version": jax.__version__,
        "diags": {k: float(v) for k, v in gd._asdict().items()},
    }
    path = os.path.join(os.path.dirname(__file__), "gx3_golden_24h.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["diags"], indent=1, sort_keys=True))
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
