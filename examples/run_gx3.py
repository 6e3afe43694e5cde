"""Standalone gx3 run: the `drivers/cice` icemodel equivalent.

Reads the reference's own gx3 grid files, runs a day of mushy + dEdd +
pond physics with runtime diagnostics, writes monthly-stream history and
a restart, then proves exact continuation from that restart
(ice_restart_driver.F90 exact-restart contract).
"""
import os
import tempfile

import numpy as np

from cice5_tpu.config import gx3_config
from cice5_tpu.driver.model import Model
from cice5_tpu.io import restart as restart_mod
from cice5_tpu.io.history import HistoryStream, available_fields

outdir = tempfile.mkdtemp(prefix="cice5_gx3_")
m = Model(gx3_config())
state = m.init_state()          # reference default ICs (70N/60S ice edge)

hist = HistoryStream(available_fields(m.cfg, m.tr), freq="d", freq_n=1)
state = m.run(state, nsteps=24, diag_every=6, history=hist,
              history_dir=os.path.join(outdir, "history"),
              restart_every=24, restart_dir=os.path.join(outdir, "restart"))

a = np.asarray(state.aicen.sum(0))
print(f"day 1 done: aice max {a.max():.3f}, "
      f"ice area {float((a * np.asarray(m.grid.tarea)).sum()) / 1e12:.2f} "
      f"Mkm^2, outputs in {outdir}")

# exact continuation: restore the dump and take one more step
st2, meta = restart_mod.restore(
    pointer_dir=os.path.join(outdir, "restart"))
s_a, _ = m.step(state, m.forcing_at(24))
s_b, _ = m.step(st2, m.forcing_at(24))
assert np.array_equal(np.asarray(s_a.vicen), np.asarray(s_b.vicen))
print("restart continuation is bit-exact")
