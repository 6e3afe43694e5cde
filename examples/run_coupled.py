"""Coupled run: the AusCOM/ACCESS OASIS exchange pattern as callbacks.

A toy "atmosphere" and "ocean" supply fields on their coupling cadences
(num_cpl_ai / num_cpl_io, drivers/auscom/CICE_RunMod.F90:121-240); the
ice hands scaled per-ice-area fluxes back through put_ocn
(into_ocn + scale_fluxes, cpl_interface.F90:613 / ice_flux.F90:840).
Boundary checksums print the coupling-debug ledger
(cpl_interface.F90:753).
"""
import numpy as np

from cice5_tpu.config import rect_config
from cice5_tpu.driver.coupled import CoupledModel
from cice5_tpu.driver.model import Model

m = Model(rect_config(ny=48, nx=64))
shape = m.grid.shape
received = []


def get_atm(t):
    """Diurnal toy atmosphere."""
    hour = (t / 3600.0) % 24.0
    sw = max(0.0, 300.0 * np.sin(np.pi * hour / 12.0))
    return {
        "Tair": np.full(shape, 253.15 + 5 * np.sin(np.pi * hour / 12)),
        "Qa": np.full(shape, 5e-4),
        "uatm": np.full(shape, 5.0), "vatm": np.full(shape, -2.0),
        "fsw": np.full(shape, sw),            # split spectrally inside
        "flw": np.full(shape, 230.0),
        "frain": np.zeros(shape), "fsnow": np.full(shape, 1e-5),
    }


def get_ocn(t):
    return {"sst": np.full(shape, -1.6), "sss": np.full(shape, 32.0),
            "uocn": np.zeros(shape), "vocn": np.zeros(shape),
            "frzmlt": np.full(shape, 50.0)}


def put_ocn(t, fields):
    received.append((t, {k: float(np.asarray(v).mean())
                         for k, v in fields.items()}))


cm = CoupledModel(model=m, get_atm=get_atm, get_ocn=get_ocn,
                  put_ocn=put_ocn, num_cpl_ai=1, num_cpl_io=3)
state = m.init_state(ice_mask=np.asarray(m.grid.tmask))
state, diag = cm.run(state, nsteps=6, chksum_every=3)

print(f"{len(received)} ocean exchanges; last outbound means:")
for k, v in received[-1][1].items():
    print(f"  {k:10s} {v: .4e}")
