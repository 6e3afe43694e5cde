"""Namelist-driven launch: keep your reference `ice_in` unchanged.

Parses the shipped gx3 template (the exact file the Fortran model reads,
input_templates/gx3/ice_in) into a ModelConfig + run controls and runs a
few steps. nx/ny are passed explicitly — the reference fixed them at
compile time (NXGLOB/NYGLOB, ice_domain_size.F90), so they never appear
in the namelist.
"""
import numpy as np

from cice5_tpu.driver.model import Model
from cice5_tpu.namelist import config_from_ice_in

cfg, run = config_from_ice_in(
    "/root/reference/input_templates/gx3/ice_in", nx=100, ny=116,
    # the template's grid_file/kmt_file entries are relative job-dir
    # paths; point them at the shipped files
)
cfg = cfg.replace(grid=cfg.grid.__class__(
    nx=100, ny=116, grid_type=cfg.grid.grid_type,
    ew_boundary=cfg.grid.ew_boundary, ns_boundary=cfg.grid.ns_boundary,
    grid_format="nc",
    grid_file="/root/reference/input_templates/gx3/global_gx3.grid.nc",
    kmt_file="/root/reference/input_templates/gx3/global_gx3.kmt.nc"))

print("unmapped namelist entries:", run["unmapped"])
print("diag points:", list(zip(run.get("latpnt", []),
                               run.get("lonpnt", []))))

m = Model(cfg)
istep0 = 0
if run.get("runtype") == "continue":
    # continue from the pointer-file target: native .npz dumps restore
    # directly; reference-format CICE 5 `iced.*` dumps (binary core +
    # per-tracer supplements, or one netCDF) go through the v5 reader
    # (ice_restart_driver.F90:191-516 restartfile)
    from cice5_tpu.io import restart as restart_mod
    from cice5_tpu.io import restart_v5
    pdir = run.get("restart_dir", "restart")
    with open(f"{pdir}/{restart_mod.POINTER_NAME}") as f:
        target = f.read().strip()
    if target.endswith(".npz"):
        state, meta = restart_mod.restore(target)
    elif target.endswith(".nc"):
        state, meta = restart_v5.read_restart_v5_nc(target, cfg, m.tr)
    else:
        state, meta = restart_v5.read_restart_v5(target, cfg, m.tr)
    istep0 = int(meta.get("istep", 0))
    print(f"continued from {target} at istep {istep0}")
else:
    state = m.init_state()
state = m.run(state, nsteps=int(run.get("diagfreq", 6)),
              start_step=istep0,
              diag_every=int(run.get("diagfreq", 6)))
print("aice max:", float(np.asarray(state.aicen.sum(0)).max()))
