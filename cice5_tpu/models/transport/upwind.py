"""First-order upwind transport.

Re-expression of /root/reference/source/ice_transport_driver.F90
transport_upwind (:634), state_to_work (:1380), work_to_state, upwind_field
(:1615). All conserved quantities (open water, per-category area, volumes,
dependency-weighted tracer amounts) are stacked into ONE (narr, ny, nx)
array, advected with a single ghost exchange, and unpacked via the ITD
tracer machinery — the reference's "balance memory vs bound calls" trick
becomes exactly one halo per step.
"""
from __future__ import annotations

import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.constants import FieldLoc, FieldType
from cice5_tpu.parallel import Topology, extend
from cice5_tpu.models.thermo.itd import tracer_weights, compute_tracers


def upwind_field(dt, phi, ueeE, vnnE, grid, topo: Topology):
    """Upwind-advect stacked fields phi (n, ny, nx)
    (ice_transport_driver.F90:1615-1680 upwind_field).

    worka(i,j) is the flux across the EAST edge of T cell (i,j); computed on
    the x-range i in [-1, nx-1] so its divergence is a static slice.
    """
    phiE = extend(phi, topo)
    HTE_E = extend(grid.HTE, topo, loc=FieldLoc.EFACE)
    HTN_E = extend(grid.HTN, topo, loc=FieldLoc.NFACE)

    def upwind(y1, y2, a, h):
        return 0.5 * dt * h * ((a + jnp.abs(a)) * y1 + (a - jnp.abs(a)) * y2)

    # x fluxes at i = -1..nx-1 (width nx+1), interior rows
    worka = upwind(phiE[..., 1:-1, :-1], phiE[..., 1:-1, 1:],
                   ueeE[..., 1:-1, :-1], HTE_E[..., 1:-1, :-1])
    # y fluxes at j = -1..ny-1 (height ny+1), interior columns
    workb = upwind(phiE[..., :-1, 1:-1], phiE[..., 1:, 1:-1],
                   vnnE[..., :-1, 1:-1], HTN_E[..., :-1, 1:-1])

    div = (worka[..., :, 1:] - worka[..., :, :-1]
           + workb[..., 1:, :] - workb[..., :-1, :])
    return phi - div * grid.tarear


def transport_upwind(dt, grid, topo: Topology, tr, *, uvel, vvel,
                     aicen, vicen, vsnon, trcrn, aice0):
    """Upwind transport of the full ice state
    (ice_transport_driver.F90:634-789)."""
    ncat = aicen.shape[0]
    # edge velocities from U-point corners (:689-693)
    uvE = extend(jnp.stack([uvel, vvel]), topo, loc=FieldLoc.NECORNER,
                 kind=FieldType.VECTOR)
    uee = 0.5 * (uvE[0, 1:-1, 1:-1] + uvE[0, :-2, 1:-1])
    vnn = 0.5 * (uvE[1, 1:-1, 1:-1] + uvE[1, 1:-1, :-2])
    ueeE = extend(uee, topo)
    vnnE = extend(vnn, topo)

    w = tracer_weights(tr, aicen, vicen, vsnon, trcrn)
    atrcrn = w * trcrn                         # (ncat, ntrcr, ny, nx)
    ny, nx = aicen.shape[-2:]
    fields = jnp.concatenate([
        aice0[None], aicen, vicen, vsnon,
        atrcrn.reshape((ncat * tr.ntrcr, ny, nx))], axis=0)

    out = upwind_field(dt, fields, ueeE, vnnE, grid, topo)

    aice0n = jnp.maximum(out[0], 0.0)
    aicen_n = out[1:1 + ncat]
    vicen_n = out[1 + ncat:1 + 2 * ncat]
    vsnon_n = out[1 + 2 * ncat:1 + 3 * ncat]
    atrcrn_n = out[1 + 3 * ncat:].reshape((ncat, tr.ntrcr, ny, nx))
    trcrn_n = compute_tracers(tr, atrcrn_n, aicen_n, vicen_n, vsnon_n)
    # mask land
    land = ~grid.tmask
    aicen_n = jnp.where(land[None], 0.0, aicen_n)
    vicen_n = jnp.where(land[None], 0.0, vicen_n)
    vsnon_n = jnp.where(land[None], 0.0, vsnon_n)
    return aicen_n, vicen_n, vsnon_n, trcrn_n, aice0n
