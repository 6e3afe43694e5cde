"""Incremental remapping transport (Dukowicz-Baumgardner / Lipscomb-Hunke).

TPU-native re-expression of /root/reference/source/ice_transport_remap.F90
(horizontal_remap :309, construct_fields :1024, limited_gradient :1344,
departure_points :1493, locate_triangles :1680, triangle_coordinates :3078,
transport_integrals :3199, update_fields :3517) and the driver packing of
ice_transport_driver.F90 (state_to_tracers :789, tracers_to_state :908).

Design: the reference decomposes each edge's departure region into <= 5
triangles chosen from ~20 mutually-exclusive cases via deep branching, using
compressed per-group cell lists and integer (iflux, jflux) gather indices.
Here every branch becomes a dense boolean mask, every triangle group is
computed for ALL edges simultaneously, and the donor-cell gather becomes a
6-way one-hot select over statically-shifted neighbor arrays (TL/BL/TR/BR/
TC/BC) — no gathers, no data-dependent control flow, fully fused by XLA.
The per-category remap shares one triangle geometry (it depends only on the
velocity field) and vmaps the field integrals over categories.

Scaled coordinates: all geometry is computed in the local cell-edge frame
(lengths scaled by dxu/dyu, origin at the edge midpoint) exactly as the
reference; areas are rescaled by areafac = dxu*dyu of the appropriate
corner. Rectangular-coordinate simplifications used by the reference
(xav = yav = 0, xxav = yyav = 1/12; init_remap) are used here too.

The l_fixed_area path (prescribed edge areas from the velocity divergence,
used for some coupled grids; :229-312, :2253-2388) is implemented via the
fixed_area flag of remap_geometry/transport_remap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.constants import FieldLoc, FieldType
from cice5_tpu.parallel import Topology, extend, extend_wide, shifted
from cice5_tpu.state import TracerRegistry, DEP_AICE, DEP_VICE, DEP_VSNO, DEP_TRCR

NGROUPS = 6
XXAV = 1.0 / 12.0   # mean value of x^2 over a unit cell
YYAV = 1.0 / 12.0

# donor-cell codes
TL, BL, TR, BR, TC, BC = range(6)


def limited_gradient(phi, phimask, cnx, cny, topo: Topology):
    """Van Leer-limited gradient in scaled coordinates
    (ice_transport_remap.F90:1344-1490).

    phi, phimask: (..., ny, nx); cnx/cny: center offsets (0 for the mass
    field, center-of-mass coords for tracers). Returns (gx, gy).
    """
    pE = extend(phi, topo)
    mE = extend(phimask, topo)
    return _limited_gradient_core(phi, pE, mE, phimask, cnx, cny)


def _limited_gradient_core(phi, pE, mE, phimask, cnx, cny):
    """limited_gradient body on pre-extended inputs (one ghost ring).

    phi/phimask: the center (interior) field and mask; pE/mE: the same
    extended by one ring (by `extend`, or a VMEM window slice inside the
    Pallas remap kernel). ROW-LOCAL (3-point stencil) — see the
    `_integrals` docstring for why that must stay true.
    """

    def nbr(di, dj):
        j0, j1 = 1 + dj, pE.shape[-2] - 1 + dj
        i0, i1 = 1 + di, pE.shape[-1] - 1 + di
        p = pE[..., j0:j1, i0:i1]
        m = mE[..., j0:j1, i0:i1]
        return m * p + (1.0 - m) * phi

    phi_nw, phi_n, phi_ne = nbr(-1, 1), nbr(0, 1), nbr(1, 1)
    phi_w, phi_e = nbr(-1, 0), nbr(1, 0)
    phi_sw, phi_s, phi_se = nbr(-1, -1), nbr(0, -1), nbr(1, -1)

    gx = (phi_e - phi_w) * 0.5
    gy = (phi_n - phi_s) * 0.5

    allp = jnp.stack([phi_nw, phi_n, phi_ne, phi_w, phi, phi_e,
                      phi_sw, phi_s, phi_se])
    pmn = jnp.min(allp, axis=0) - phi
    pmx = jnp.max(allp, axis=0) - phi

    w1 = (0.5 - cnx) * gx + (0.5 - cny) * gy
    w2 = (0.5 - cnx) * gx - (0.5 + cny) * gy
    w3 = -(0.5 + cnx) * gx - (0.5 + cny) * gy
    w4 = (0.5 - cny) * gy - (0.5 + cnx) * gx
    qmn = jnp.minimum(jnp.minimum(w1, w2), jnp.minimum(w3, w4))
    qmx = jnp.maximum(jnp.maximum(w1, w2), jnp.maximum(w3, w4))

    lim1 = jnp.where(jnp.abs(qmn) > jnp.abs(pmn),
                     jnp.maximum(0.0, pmn / jnp.where(qmn != 0.0, qmn, 1.0)),
                     1.0)
    lim2 = jnp.where(jnp.abs(qmx) > jnp.abs(pmx),
                     jnp.maximum(0.0, pmx / jnp.where(qmx != 0.0, qmx, 1.0)),
                     1.0)
    lim = jnp.minimum(lim1, lim2)
    keep = phimask > ct.puny
    return jnp.where(keep, lim * gx, 0.0), jnp.where(keep, lim * gy, 0.0)


class Geometry(NamedTuple):
    """Triangle decomposition for one edge direction.

    All arrays (NGROUPS, ..., nyr, nxr); vertex arrays have a 3-vertex axis.
    donor: int codes TL..BC. triarea: signed scaled area * areafac.
    """
    xp: jnp.ndarray    # (NGROUPS, 3, nyr, nxr)
    yp: jnp.ndarray
    donor: jnp.ndarray   # (NGROUPS, nyr, nxr) int32
    triarea: jnp.ndarray


def _edge_geometry(edge: str, dx, dy, afl, afr, edgearea=None):
    """Locate departure triangles for all edges at once
    (ice_transport_remap.F90:1680-3050 locate_triangles).

    dx, dy: scaled departure displacements at (left, right) corners of each
    edge: tuples (dxl, dxr), (dyl, dyr) arrays (nyr, nxr).
    afl/afr: left/right corner area factors.
    edgearea: prescribed physical departure area per edge (m^2) — the
    l_fixed_area=T path (:2253-2388): the central-region midpoint is
    shifted so the total departure area matches exactly. None = free
    (geometric) areas. Returns Geometry.
    """
    (dxl, dxr), (dyl, dyr) = dx, dy
    afc = 0.5 * (afl + afr)
    shp = dxl.shape
    dtype = dxl.dtype

    xcl, ycl = -0.5, 0.0
    xcr, ycr = 0.5, 0.0
    if edge == "north":
        xdl = xcl + dxl
        ydl = ycl + dyl
        xdr = xcr + dxr
        ydr = ycr + dyr
    else:   # east: rotate trajectory by pi/2
        xdl = xcl - dyl
        ydl = ycl + dxl
        xdr = xcr - dyr
        ydr = ycr + dxr

    xdm = 0.5 * (xdr + xdl)
    ydm = 0.5 * (ydr + ydl)

    safe = lambda num, den: num / jnp.where(jnp.abs(den) > 1e-30, den,
                                            jnp.where(den >= 0, 1e-30, -1e-30))
    xil = jnp.full(shp, xcl, dtype)
    yil = safe(xcl * (ydm - ydl) + xdm * ydl - xdl * ydm, xdm - xdl)
    xir = jnp.full(shp, xcr, dtype)
    yir = safe(xcr * (ydr - ydm) - xdm * ydr + xdr * ydm, xdr - xdm)

    md = safe(ydr - ydl, xdr - xdl)
    xic = jnp.where(jnp.abs(md) > ct.puny, xdl - safe(ydl, md), 0.0)

    zero3 = jnp.zeros((3,) + shp, dtype)
    xp = [zero3] * NGROUPS
    yp = [zero3] * NGROUPS
    donor = [jnp.zeros(shp, jnp.int32)] * NGROUPS
    afact = [jnp.zeros(shp, dtype)] * NGROUPS

    def put(ng, mask, verts, dn, af):
        """Set triangle in group ng where mask (verts: list of 3 (x, y))."""
        vx = jnp.stack([v[0] if hasattr(v[0], "shape") else
                        jnp.full(shp, v[0], dtype) for v in verts])
        vy = jnp.stack([v[1] if hasattr(v[1], "shape") else
                        jnp.full(shp, v[1], dtype) for v in verts])
        xp[ng] = jnp.where(mask[None], vx, xp[ng])
        yp[ng] = jnp.where(mask[None], vy, yp[ng])
        donor[ng] = jnp.where(mask, dn, donor[ng])
        afact[ng] = jnp.where(mask, af, afact[ng])

    CL = (xcl, ycl)
    CR = (xcr, ycr)
    DL = (xdl, ydl)
    DR = (xdr, ydr)
    IL = (xil, yil)
    IR = (xir, yir)
    IC = (xic, jnp.zeros(shp, dtype))

    # ---- TL/BL cells (left corner) (:2060-2165) ----
    left_out = xdl < xcl
    m_TL = (yil > 0) & left_out & (ydl >= 0)
    put(1 - 1, m_TL, [CL, IL, DL], TL, -afl)
    m_BL = (yil < 0) & left_out & (ydl < 0)
    put(0, m_BL, [CL, DL, IL], BL, afl)
    m_TL1 = (yil < 0) & left_out & (ydl >= 0)
    put(0, m_TL1, [CL, DL, IC], TL, afl)
    put(2, m_TL1, [CL, IC, IL], BL, afl)
    m_TL2 = (yil > 0) & left_out & (ydl < 0)
    put(2, m_TL2, [CL, IL, IC], TL, -afl)
    put(0, m_TL2, [CL, IC, DL], BL, -afl)

    # ---- TR/BR cells (right corner) (:2168-2270) ----
    right_out = xdr >= xcr
    m_TR = (yir > 0) & right_out & (ydr >= 0)
    put(1, m_TR, [CR, DR, IR], TR, -afr)
    m_BR = (yir < 0) & right_out & (ydr < 0)
    put(1, m_BR, [CR, IR, DR], BR, afr)
    m_TR1 = (yir < 0) & right_out & (ydr >= 0)
    put(1, m_TR1, [CR, IC, DR], TR, afr)
    put(2, m_TR1, [CR, IR, IC], BR, afr)
    m_TR2 = (yir > 0) & right_out & (ydr < 0)
    put(2, m_TR2, [CR, IC, IR], TR, -afr)
    put(1, m_TR2, [CR, DR, IC], BR, -afr)

    # ---- redefine DPs clipped to the central cells (:2276-2285) ----
    xdl2 = jnp.where(left_out, xil, xdl)
    ydl2 = jnp.where(left_out, yil, ydl)
    xdr2 = jnp.where(right_out, xir, xdr)
    ydr2 = jnp.where(right_out, yir, ydr)
    xdm = 0.5 * (xdr2 + xdl2)
    ydm = 0.5 * (ydr2 + ydl2)
    DL2 = (xdl2, ydl2)
    DR2 = (xdr2, ydr2)
    DM = (xdm, ydm)
    ICL = IC
    ICR = IC

    if edgearea is not None:
        # ---- l_fixed_area midpoint shift (:2257-2388): displace DM so
        # the total departure area equals the prescribed edgearea, with
        # ICL/ICR recomputed from the shifted-chord slopes ----
        def garea(g):
            vx, vy = xp[g], yp[g]
            return 0.5 * ((vx[1] - vx[0]) * (vy[2] - vy[0])
                          - (vy[1] - vy[0]) * (vx[2] - vx[0])) * afact[g]
        a123 = garea(0) + garea(1) + garea(2)
        afc_s = jnp.where(jnp.abs(afc) > 1e-30, afc, 1e-30)
        ic_pt = lambda m, dpx_, dpy_: jnp.where(
            jnp.abs(m) > ct.puny, dpx_ - safe(dpy_, m), 0.0)

        # case A: both DPs on the same side of the edge (:2298-2327)
        area_cA = edgearea - a123
        w2A = jnp.maximum((xdr2 - xdl2) ** 2 + (ydr2 - ydl2) ** 2, 1e-30)
        w1A = (2.0 * area_cA / afc_s + (xdr2 - xcl) * ydl2
               + (xcr - xdl2) * ydr2) / w2A
        xdmA = xdm + (ydr2 - ydl2) * w1A
        ydmA = ydm - (xdr2 - xdl2) * w1A
        xiclA = ic_pt(safe(ydmA - ydl2, xdmA - xdl2), xdl2, ydl2)
        xicrA = ic_pt(safe(ydr2 - ydmA, xdr2 - xdmA), xdr2, ydr2)

        # case B: opposite sides, xic < 0 -> ICL pinned at IC (:2329-2356)
        area4B = 0.5 * (xcl - xic) * ydl2 * afl
        area_cB = edgearea - a123 - area4B
        w2B = jnp.maximum((xdr2 - xic) ** 2 + ydr2 ** 2, 1e-30)
        w1B = (2.0 * area_cB / afc_s + (xcr - xic) * ydr2) / w2B
        xdmB = 0.5 * (xdr2 + xic) + ydr2 * w1B
        ydmB = 0.5 * ydr2 - (xdr2 - xic) * w1B
        xicrB = ic_pt(safe(ydr2 - ydmB, xdr2 - xdmB), xdr2, ydr2)

        # case C: opposite sides, xic >= 0 -> ICR pinned (:2358-2386)
        area4C = 0.5 * (xic - xcr) * ydr2 * afr
        area_cC = edgearea - a123 - area4C
        w2C = jnp.maximum((xic - xdl2) ** 2 + ydl2 ** 2, 1e-30)
        w1C = (2.0 * area_cC / afc_s + (xic - xcl) * ydl2) / w2C
        xdmC = 0.5 * (xic + xdl2) - ydl2 * w1C
        ydmC = 0.5 * ydl2 - (xic - xdl2) * w1C
        xiclC = ic_pt(safe(ydmC - ydl2, xdmC - xdl2), xdl2, ydl2)

        sameAB = ydl2 * ydr2 >= 0
        caseB = ~sameAB & (xic < 0)
        xdm = jnp.where(sameAB, xdmA, jnp.where(caseB, xdmB, xdmC))
        ydm = jnp.where(sameAB, ydmA, jnp.where(caseB, ydmB, ydmC))
        xicl = jnp.where(sameAB, xiclA, jnp.where(caseB, xic, xiclC))
        xicr = jnp.where(sameAB, xicrA, jnp.where(caseB, xicrB, xic))
        zic = jnp.zeros_like(xdm)
        DM = (xdm, ydm)
        ICL = (xicl, zic)
        ICR = (xicr, zic)

    # ---- central TC/BC cells (:2395-3048) ----
    both_up = (ydl2 >= 0) & (ydr2 >= 0)
    both_dn = (ydl2 < 0) & (ydr2 < 0)
    mix_lr = (ydl2 >= 0) & (ydr2 < 0)     # left up, right down
    mix_rl = (ydl2 < 0) & (ydr2 >= 0)
    up_m = ydm >= 0
    xic_r = xic >= 0

    # both DPs above the edge
    m = both_up & up_m
    put(3, m, [CL, CR, DL2], TC, -afc)
    put(4, m, [CR, DR2, DL2], TC, -afc)
    put(5, m, [DL2, DR2, DM], TC, -afc)
    m = both_up & ~up_m          # rare
    put(3, m, [CL, ICL, DL2], TC, -afc)
    put(4, m, [CR, DR2, ICR], TC, -afc)
    put(5, m, [ICR, ICL, DM], BC, afc)
    # both DPs below
    m = both_dn & ~up_m
    put(3, m, [CL, DL2, CR], BC, afc)
    put(4, m, [CR, DL2, DR2], BC, afc)
    put(5, m, [DL2, DM, DR2], BC, afc)
    m = both_dn & up_m           # rare
    put(3, m, [CL, DL2, ICL], BC, afc)
    put(4, m, [CR, ICR, DR2], BC, afc)
    put(5, m, [ICL, ICR, DM], TC, -afc)
    # left up, right down
    m = mix_lr & xic_r & up_m
    put(3, m, [CL, ICR, DL2], TC, -afc)
    put(4, m, [CR, ICR, DR2], BC, afr)
    put(5, m, [DL2, ICR, DM], TC, -afc)
    m = mix_lr & xic_r & ~up_m
    put(3, m, [CL, ICL, DL2], TC, -afc)
    put(4, m, [CR, ICR, DR2], BC, afr)
    put(5, m, [ICR, ICL, DM], BC, afc)
    m = mix_lr & ~xic_r & ~up_m
    put(3, m, [CL, ICL, DL2], TC, -afl)
    put(4, m, [CR, ICL, DR2], BC, afc)
    put(5, m, [DR2, ICL, DM], BC, afc)
    m = mix_lr & ~xic_r & up_m
    put(3, m, [CL, ICL, DL2], TC, -afl)
    put(4, m, [CR, ICR, DR2], BC, afc)
    put(5, m, [ICL, ICR, DM], TC, -afc)
    # left down, right up
    m = mix_rl & ~xic_r & up_m
    put(3, m, [CL, DL2, ICL], BC, afl)
    put(4, m, [CR, DR2, ICL], TC, -afc)
    put(5, m, [ICL, DR2, DM], TC, -afc)
    m = mix_rl & ~xic_r & ~up_m
    put(3, m, [CL, DL2, ICL], BC, afl)
    put(4, m, [CR, DR2, ICR], TC, -afc)
    put(5, m, [ICR, ICL, DM], BC, afc)
    m = mix_rl & xic_r & ~up_m
    put(3, m, [CL, DL2, ICR], BC, afc)
    put(4, m, [CR, DR2, ICR], TC, -afr)
    put(5, m, [ICR, DL2, DM], BC, afc)
    m = mix_rl & xic_r & up_m
    put(3, m, [CL, DL2, ICL], BC, afc)
    put(4, m, [CR, DR2, ICR], TC, -afr)
    put(5, m, [ICL, ICR, DM], TC, -afc)

    xp = jnp.stack(xp)
    yp = jnp.stack(yp)
    donor = jnp.stack(donor)
    afact = jnp.stack(afact)

    # triangle areas (:3052-3075): A = 1/2 cross * areafact
    x1, x2, x3 = xp[:, 0], xp[:, 1], xp[:, 2]
    y1, y2, y3 = yp[:, 0], yp[:, 1], yp[:, 2]
    tri = 0.5 * ((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) * afact
    cutoff = 1.0e-16 * jnp.maximum(afc, 1e-30)
    tri = jnp.where(jnp.abs(tri) > cutoff[None], tri, 0.0)

    # --- transform vertices into the DONOR cell's centered frame
    # (:2985-3018): north shifts by the donor offset; east additionally
    # un-rotates the pi/2 trajectory rotation.
    if edge == "north":
        offs = {TL: (-1, 1), BL: (-1, 0), TR: (1, 1), BR: (1, 0),
                TC: (0, 1), BC: (0, 0)}
    else:
        offs = {TL: (1, 1), BL: (0, 1), TR: (1, -1), BR: (0, -1),
                TC: (1, 0), BC: (0, 0)}
    ish = jnp.zeros_like(donor, dtype)
    jsh = jnp.zeros_like(donor, dtype)
    for code, (di, dj) in offs.items():
        ish = jnp.where(donor == code, float(di), ish)
        jsh = jnp.where(donor == code, float(dj), jsh)
    if edge == "north":
        xp = xp - ish[:, None]
        yp = yp + 0.5 - jsh[:, None]
    else:
        xp_new = yp + (0.5 - ish)[:, None]
        yp_new = -xp - jsh[:, None]
        xp, yp = xp_new, yp_new
    return Geometry(xp=xp, yp=yp, donor=donor, triarea=tri)


def _triangle_midpoints(g: Geometry):
    """3-point degree-2 quadrature points: midpoints between each vertex and
    the centroid (triangle_coordinates :3078-3150, integral_order=2)."""
    x0 = jnp.mean(g.xp, axis=1, keepdims=True)
    y0 = jnp.mean(g.yp, axis=1, keepdims=True)
    return 0.5 * g.xp + 0.5 * x0, 0.5 * g.yp + 0.5 * y0


def _nbr_views_north(fE, ny, nx):
    """Six donor-cell views for north edges, region (ny+1, nx):
    edge (i, j), j = -1..ny-1 -> jj = j+1."""
    return {
        BC: fE[..., 0:ny + 1, 1:nx + 1],
        TC: fE[..., 1:ny + 2, 1:nx + 1],
        BL: fE[..., 0:ny + 1, 0:nx],
        TL: fE[..., 1:ny + 2, 0:nx],
        BR: fE[..., 0:ny + 1, 2:nx + 2],
        TR: fE[..., 1:ny + 2, 2:nx + 2],
    }


def _nbr_views_east(fE, ny, nx):
    """Six donor-cell views for east edges, region (ny, nx+1):
    edge (i, j), i = -1..nx-1 -> ii = i+1."""
    return {
        BC: fE[..., 1:ny + 1, 0:nx + 1],
        TC: fE[..., 1:ny + 1, 1:nx + 2],
        BL: fE[..., 2:ny + 2, 0:nx + 1],
        TL: fE[..., 2:ny + 2, 1:nx + 2],
        BR: fE[..., 0:ny, 0:nx + 1],
        TR: fE[..., 0:ny, 1:nx + 2],
    }


def _donor_select(donor, views):
    """One-hot select donor-cell field values per group.

    donor: (NGROUPS, nyr, nxr) codes; views: dict code -> (..., nyr, nxr).
    Returns (NGROUPS, ..., nyr, nxr)."""
    out = None
    for code, v in views.items():
        sel = (donor == code)
        # broadcast mask over field dims
        extra = v.ndim - sel.shape[0:0].__len__() - 2 - 1 + 1
        m = sel.reshape(sel.shape[0:1] + (1,) * (v.ndim - 2) + sel.shape[1:])
        term = jnp.where(m, v[None], 0.0)
        out = term if out is None else out + term
    return out


class RemapFluxes(NamedTuple):
    mflx: jnp.ndarray      # (nyr, nxr) mass flux across each edge
    mtflx: tuple           # ntrace arrays (nyr, nxr) — kept as a
    # tuple so the update step reads per-tracer fluxes without a stacked
    # (ntrace, nyr, nxr) materialization


def _integrals(donor, triarea, qx, qy, views_mc, views_mx, views_my,
               views_tc, views_tx, views_ty, tracer_type, parent):
    """Quadratic transport integrals over all triangles
    (transport_integrals :3199-3512, integral_order=2).

    MUST REMAIN ROW-LOCAL: the Pallas row-tile kernel
    (ops/pallas/remap_flux.py) feeds this math extended-field rows beyond
    nyE that are undefined (its ragged last block clamps the window tile;
    garbage rows are only masked at the output write). Any future
    reduction ACROSS the row axis here would read that garbage — and the
    interpret-mode tests zero-fill ragged blocks, so it would pass tests
    and break only on real TPU hardware.

    TPU re-structuring: the reference's per-triangle-group tracer sums would
    materialize (NGROUPS, ntrace) donor-selected stacks (tens of MB of HBM
    traffic per category). Because every tracer flux is linear in its
    (tc, tx, ty) donor values, the group/triangle sums are factored into
    SIX per-view weight maps: W_v = sum_g triarea_g * coeff_g * [donor_g=v],
    and each tracer's flux is a 6-view weighted read of the extended tracer
    arrays — no (NGROUPS, ntrace) intermediates at all. Dependent (type-2/3)
    tracers get weight sets built from their parent's per-group sums (only
    the few distinct parents are expanded per group).

    Takes the geometry as plain arrays (donor codes, signed areas, and the
    3-point quadrature midpoints qx/qy from _triangle_midpoints) so the
    SAME function runs both as the XLA path and inside the fused Pallas
    row-tile kernel (ops/pallas/remap_flux.py), where the views are VMEM
    slices.
    """
    g_donor, ta = donor, triarea
    mc_d = _donor_select(g_donor, views_mc)  # (NGROUPS, nyr, nxr)
    mx_d = _donor_select(g_donor, views_mx)
    my_d = _donor_select(g_donor, views_my)

    P333 = 1.0 / 3.0
    mq = P333 * (mc_d[:, None] + qx * mx_d[:, None] + qy * my_d[:, None])
    msum = jnp.sum(mq, axis=1)                       # (NGROUPS, nyr, nxr)
    mflx = jnp.sum(ta * msum, axis=0)

    mxsum = jnp.sum(mq * qx, axis=1)
    mysum = jnp.sum(mq * qy, axis=1)
    mxxsum = jnp.sum(mq * qx * qx, axis=1)
    mxysum = jnp.sum(mq * qx * qy, axis=1)
    myysum = jnp.sum(mq * qy * qy, axis=1)

    codes = list(views_tc.keys())
    onehot = {v: (g_donor == v) for v in codes}      # (NGROUPS, nyr, nxr)

    def wmaps(cg, xg=None, yg=None):
        """Per-view weights sum_g triarea*coeff*[donor==v] for the c/x/y
        coefficient fields (each (NGROUPS, nyr, nxr))."""
        Wc = {v: jnp.sum(ta * cg * onehot[v], axis=0) for v in codes}
        Wx = ({v: jnp.sum(ta * xg * onehot[v], axis=0) for v in codes}
              if xg is not None else None)
        Wy = ({v: jnp.sum(ta * yg * onehot[v], axis=0) for v in codes}
              if yg is not None else None)
        return Wc, Wx, Wy

    W1 = wmaps(msum, mxsum, mysum)                   # for type-1 tracers

    def donor_one(views, nt):
        return _donor_select(g_donor, {v: a[nt] for v, a in views.items()})

    # per-group sums for the distinct parents of dependent tracers
    ntrace = next(iter(views_tc.values())).shape[0]
    needed = sorted({parent[nt] for nt in range(ntrace)
                     if tracer_type[nt] >= 2})
    gsum: dict = {}
    Wp: dict = {}
    for p in needed:                     # type-1 parents come first
        tc_p = donor_one(views_tc, p)
        if tracer_type[p] == 1:
            tx_p = donor_one(views_tx, p)
            ty_p = donor_one(views_ty, p)
            mts_g = msum * tc_p + mxsum * tx_p + mysum * ty_p
            mtx_g = mxsum * tc_p + mxxsum * tx_p + mxysum * ty_p
            mty_g = mysum * tc_p + mxysum * tx_p + myysum * ty_p
        else:                            # type-2 parent (pond chain)
            pp = parent[p]
            pts, ptx, pty = gsum[pp]
            tx_p = donor_one(views_tx, p)
            ty_p = donor_one(views_ty, p)
            mts_g = pts * tc_p + ptx * tx_p + pty * ty_p
            mtx_g = mty_g = None
        gsum[p] = (mts_g, mtx_g, mty_g)
        Wp[p] = wmaps(mts_g, mtx_g, mty_g)

    # apply the weight maps to the full tracer view stacks, grouped by
    # weight set so each class is one fused multi-view pass. When a class's
    # tracers are contiguous in the stack (transport_remap sorts them so),
    # the per-view reads are basic slices — fancy-index gathers of the
    # 12 MB view stacks were the remap's single largest HBM cost.
    flux = [None] * ntrace
    classes: dict = {}
    for nt in range(ntrace):
        key = ("1",) if tracer_type[nt] == 1 else (tracer_type[nt],
                                                   parent[nt])
        classes.setdefault(key, []).append(nt)
    for key, idxs in classes.items():
        W = W1 if key[0] == "1" else Wp[key[1]]
        Wc, Wx, Wy = W
        use_grad = key[0] == "1" or key[0] == 2
        if idxs == list(range(idxs[0], idxs[-1] + 1)):
            sel = slice(idxs[0], idxs[-1] + 1)
        else:
            sel = jnp.asarray(idxs)
        acc = None
        for v in codes:
            term = Wc[v][None] * views_tc[v][sel]
            if use_grad and Wx is not None:
                term = term + Wx[v][None] * views_tx[v][sel]
                term = term + Wy[v][None] * views_ty[v][sel]
            acc = term if acc is None else acc + term
        for k, nt in enumerate(idxs):
            flux[nt] = acc[k]
    return RemapFluxes(mflx=mflx, mtflx=tuple(flux))


def horizontal_remap(dt, grid, topo: Topology, *, uvel, vvel, mm, tm,
                     tracer_type, parent):
    """Remap one mass field mm (ny, nx) + tracers tm (ntrace, ny, nx)
    given corner velocities (horizontal_remap :309-780). Returns updated
    (mm, tm). Geometry is recomputed; for multi-category use
    transport_remap which shares it."""
    geom = remap_geometry(dt, grid, topo, uvel=uvel, vvel=vvel)
    return remap_fields(grid, topo, geom, mm=mm, tm=tm,
                        tracer_type=tracer_type, parent=parent)


class RemapGeometry(NamedTuple):
    north: Geometry
    east: Geometry


def remap_geometry(dt, grid, topo: Topology, *, uvel, vvel,
                   fixed_area: bool = False) -> RemapGeometry:
    """Departure points + triangle decomposition for both edge sets.

    fixed_area: prescribe each edge's departure area from the velocity
    divergence (the l_fixed_area=T path; edgearea_e/n from
    ice_transport_remap.F90:665-679) instead of the free geometric area.
    """
    ny, nx = uvel.shape
    # departure displacements at U corners (departure_points :1493-1541)
    dpx = -dt * uvel
    dpy = -dt * vvel
    dxuE = extend(grid.dxu, topo, loc=FieldLoc.NECORNER)
    dyuE = extend(grid.dyu, topo, loc=FieldLoc.NECORNER)
    dpxE = extend(dpx, topo, loc=FieldLoc.NECORNER, kind=FieldType.VECTOR)
    dpyE = extend(dpy, topo, loc=FieldLoc.NECORNER, kind=FieldType.VECTOR)
    dxs = dpxE / jnp.where(dxuE > 0, dxuE, 1.0)
    dys = dpyE / jnp.where(dyuE > 0, dyuE, 1.0)
    A = dxuE * dyuE

    # prescribed edge areas from the velocity divergence
    # (ice_transport_remap.F90:665-679): edgearea_n(i,j) =
    # (vvel(i,j)+vvel(i-1,j))/2 * HTN(i,j) * dt, analogous for east
    ea_n = ea_e = None
    if fixed_area:
        uvE = extend(jnp.stack([uvel, vvel]), topo,
                     loc=FieldLoc.NECORNER, kind=FieldType.VECTOR)
        htnE = extend(grid.HTN, topo, loc=FieldLoc.NFACE)
        hteE = extend(grid.HTE, topo, loc=FieldLoc.EFACE)
        vE, uE = uvE[1], uvE[0]
        ea_n = 0.5 * (vE[0:ny + 1, 0:nx] + vE[0:ny + 1, 1:nx + 1]) \
            * htnE[0:ny + 1, 1:nx + 1] * dt
        ea_e = 0.5 * (uE[1:ny + 1, 0:nx + 1] + uE[0:ny, 0:nx + 1]) \
            * hteE[1:ny + 1, 0:nx + 1] * dt

    # north edges: region (ny+1, nx), edge (i,j) j=-1..ny-1 (jj=j+1)
    dxl_n = dxs[0:ny + 1, 0:nx]       # corner (i-1, j)
    dxr_n = dxs[0:ny + 1, 1:nx + 1]   # corner (i, j)
    dyl_n = dys[0:ny + 1, 0:nx]
    dyr_n = dys[0:ny + 1, 1:nx + 1]
    afl_n = A[0:ny + 1, 0:nx]
    afr_n = A[0:ny + 1, 1:nx + 1]
    gn = _edge_geometry("north", (dxl_n, dxr_n), (dyl_n, dyr_n), afl_n,
                        afr_n, edgearea=ea_n)

    # east edges: region (ny, nx+1), edge (i,j) i=-1..nx-1 (ii=i+1)
    dxl_e = dxs[1:ny + 1, 0:nx + 1]   # corner (i, j)   [left = north end]
    dyl_e = dys[1:ny + 1, 0:nx + 1]
    dxr_e = dxs[0:ny, 0:nx + 1]       # corner (i, j-1)
    dyr_e = dys[0:ny, 0:nx + 1]
    afl_e = A[1:ny + 1, 0:nx + 1]
    afr_e = A[0:ny, 0:nx + 1]
    ge = _edge_geometry("east", (dxl_e, dxr_e), (dyl_e, dyr_e), afl_e,
                        afr_e, edgearea=ea_e)
    return RemapGeometry(north=gn, east=ge)


def _reconstruct(grid, topo: Topology, *, mm, tm, tracer_type, parent):
    """Limited linear reconstructions of the mass field + tracers
    (construct_fields :1024-1316). Returns (mc, mx, my, tc, tx, ty)."""
    hm = grid.hm

    # --- construct linear reconstructions (construct_fields :1024-1316) ---
    mmask = (mm > 0.0).astype(mm.dtype)
    mx, my = limited_gradient(mm, hm, 0.0, 0.0, topo)
    mc = mm
    denom = jnp.where(mm > 0.0, mm, 1.0)
    mxav = jnp.where(mm > 0.0, mx * XXAV / denom, 0.0)
    myav = jnp.where(mm > 0.0, my * YYAV / denom, 0.0)

    # tracer reconstructions, BATCHED by (type, parent) class so the
    # limited_gradient neighborhood passes run once per class instead of
    # once per tracer (limited_gradient accepts leading batch axes)
    ntrace = tm.shape[0]
    tcs = [None] * ntrace
    txs = [None] * ntrace
    tys = [None] * ntrace
    mtx = [None] * ntrace
    mty = [None] * ntrace

    def _sel(idxs):
        """Basic slice when contiguous (no gather), else fancy index."""
        if idxs == list(range(idxs[0], idxs[-1] + 1)):
            return slice(idxs[0], idxs[-1] + 1)
        return jnp.asarray(idxs)

    idx1 = [nt for nt in range(ntrace) if tracer_type[nt] == 1]
    if idx1:
        sel = _sel(idx1)
        tx_b, ty_b = limited_gradient(tm[sel], mmask, mxav, myav, topo)
        tc_b = tm[sel] - tx_b * mxav - ty_b * myav
        # center of mass*tracer for dependents (:1208-1240)
        w2 = mc * tx_b + mx * tc_b
        w3 = mc * ty_b + my * tc_b
        mt = mm * tm[sel]
        d2 = jnp.where(jnp.abs(mt) > 0.0, mt, 1.0)
        ok = jnp.abs(mt) > ct.puny
        mtx_b = jnp.where(ok, (w2 * XXAV) / d2, 0.0)
        mty_b = jnp.where(ok, (w3 * YYAV) / d2, 0.0)
        for k, nt in enumerate(idx1):
            tcs[nt], txs[nt], tys[nt] = tc_b[k], tx_b[k], ty_b[k]
            mtx[nt], mty[nt] = mtx_b[k], mty_b[k]

    by_parent: dict = {}
    for nt in range(ntrace):
        if tracer_type[nt] == 2:
            by_parent.setdefault(parent[nt], []).append(nt)
    for p, idxs in by_parent.items():
        sel = _sel(idxs)
        tmask_p = (jnp.abs(tm[p]) > 0.0).astype(mm.dtype) * mmask
        tx_b, ty_b = limited_gradient(tm[sel], tmask_p, mtx[p], mty[p],
                                      topo)
        tc_b = tm[sel] - tx_b * mtx[p] - ty_b * mty[p]
        for k, nt in enumerate(idxs):
            tcs[nt], txs[nt], tys[nt] = tc_b[k], tx_b[k], ty_b[k]

    for nt in range(ntrace):
        if tracer_type[nt] == 3:
            tcs[nt] = tm[nt]
            txs[nt] = jnp.zeros_like(mm)
            tys[nt] = jnp.zeros_like(mm)
    tc_all = jnp.stack(tcs)
    tx_all = jnp.stack(txs)
    ty_all = jnp.stack(tys)
    return mc, mx, my, tc_all, tx_all, ty_all


def _reconstruct_ext(mmE, tmE, hmE, tracer_type, parent):
    """`_reconstruct` evaluated from one-ring-extended RAW fields — the
    Pallas remap kernel's in-VMEM reconstruction (construct_fields
    :1024-1316 on a row window).

    mmE: (nyE, nxE); tmE: (ntrace, nyE, nxE); hmE: (nyE, nxE) — the raw
    mass field, packed tracers and grid mask with a 1-cell ghost ring
    (slices of a W=2 `extend_wide` window). Returns (mc, mx, my, tc, tx,
    ty) on the interior (nyE-2, nxE-2). Recomputing the reconstruction
    per window (instead of materializing + re-extending tc/tx/ty stacks
    in HBM) is the point: the gradients are VPU work on data already in
    VMEM. ROW-LOCAL (3-point stencils): rows beyond the valid flux region
    are undefined in the ragged last tile and only feed masked outputs.

    Ghost-cell reconstructions recomputed from folded/cyclic raw values
    equal the `extend`-ed reconstructions of the XLA path: under the
    tripole fold gx/gy/mxav all flip sign, so tc is fold-invariant and
    tx/ty pick up exactly the VECTOR parity `extend` applies. (On
    tripoleT the degenerate top row differs at the ulp level:
    symmetrize-then-reconstruct here vs reconstruct-then-symmetrize
    there — both self-consistent discretizations of the fold row.)
    """
    inner = lambda F: F[..., 1:-1, 1:-1]
    mm = inner(mmE)
    mE = (mmE > 0.0).astype(mmE.dtype)
    mmask = inner(mE)
    mx, my = _limited_gradient_core(mm, mmE, hmE, inner(hmE), 0.0, 0.0)
    mc = mm
    denom = jnp.where(mm > 0.0, mm, 1.0)
    mxav = jnp.where(mm > 0.0, mx * XXAV / denom, 0.0)
    myav = jnp.where(mm > 0.0, my * YYAV / denom, 0.0)

    ntrace = tmE.shape[0]
    tm = inner(tmE)
    tcs = [None] * ntrace
    txs = [None] * ntrace
    tys = [None] * ntrace
    mtx = [None] * ntrace
    mty = [None] * ntrace

    idx1 = [nt for nt in range(ntrace) if tracer_type[nt] == 1]
    if idx1:
        sel = _sel_static(idx1)
        tx_b, ty_b = _limited_gradient_core(tm[sel], tmE[sel], mE, mmask,
                                            mxav, myav)
        tc_b = tm[sel] - tx_b * mxav - ty_b * myav
        w2 = mc * tx_b + mx * tc_b
        w3 = mc * ty_b + my * tc_b
        mt = mm * tm[sel]
        d2 = jnp.where(jnp.abs(mt) > 0.0, mt, 1.0)
        ok = jnp.abs(mt) > ct.puny
        mtx_b = jnp.where(ok, (w2 * XXAV) / d2, 0.0)
        mty_b = jnp.where(ok, (w3 * YYAV) / d2, 0.0)
        for k, nt in enumerate(idx1):
            tcs[nt], txs[nt], tys[nt] = tc_b[k], tx_b[k], ty_b[k]
            mtx[nt], mty[nt] = mtx_b[k], mty_b[k]

    by_parent: dict = {}
    for nt in range(ntrace):
        if tracer_type[nt] == 2:
            by_parent.setdefault(parent[nt], []).append(nt)
    for p, idxs in by_parent.items():
        sel = _sel_static(idxs)
        tmask_pE = (jnp.abs(tmE[p]) > 0.0).astype(mmE.dtype) * mE
        tx_b, ty_b = _limited_gradient_core(
            tm[sel], tmE[sel], tmask_pE, inner(tmask_pE), mtx[p], mty[p])
        tc_b = tm[sel] - tx_b * mtx[p] - ty_b * mty[p]
        for k, nt in enumerate(idxs):
            tcs[nt], txs[nt], tys[nt] = tc_b[k], tx_b[k], ty_b[k]

    for nt in range(ntrace):
        if tracer_type[nt] == 3:
            tcs[nt] = tm[nt]
            txs[nt] = jnp.zeros_like(mm)
            tys[nt] = jnp.zeros_like(mm)
    return (mc, mx, my, jnp.stack(tcs), jnp.stack(txs), jnp.stack(tys))


def _sel_static(idxs):
    """Basic slice when contiguous (no gather), else fancy index."""
    if idxs == list(range(idxs[0], idxs[-1] + 1)):
        return slice(idxs[0], idxs[-1] + 1)
    return jnp.asarray(idxs)


def _update(grid, *, mm, tm, fe_mflx, fe_mtflx, fn_mflx, fn_mtflx,
            tracer_type, parent):
    """Divergence update of mass + tracers (update_fields :3517-3730).

    fe_mtflx / fn_mtflx: per-tracer edge fluxes, indexable by tracer
    (a tuple of (nyr, nxr) arrays from the XLA path, or one stacked
    (ntrace, nyr, nxr) array from the Pallas kernel)."""
    ntrace = tm.shape[0]
    mtold = []
    for nt in range(ntrace):
        w = mm * tm[nt]
        p = parent[nt]
        if tracer_type[nt] >= 2:
            w = w * tm[p]
            if tracer_type[nt] == 3:
                w = w * tm[parent[p]]
        mtold.append(w)

    div_m = (fe_mflx[:, 1:] - fe_mflx[:, :-1]
             + fn_mflx[1:, :] - fn_mflx[:-1, :])
    mm_new = jnp.maximum(mm - div_m * grid.tarear, 0.0)
    mm_new = jnp.where(grid.tmask, mm_new, 0.0)

    tms = []
    pos = mm_new > 0.0
    for nt in range(ntrace):
        w1 = (fe_mtflx[nt][:, 1:] - fe_mtflx[nt][:, :-1]
              + fn_mtflx[nt][1:, :] - fn_mtflx[nt][:-1, :])
        mt_new = mtold[nt] - w1 * grid.tarear
        if tracer_type[nt] == 1:
            den = mm_new
        elif tracer_type[nt] == 2:
            den = mm_new * tms[parent[nt]]
        else:
            den = mm_new * tms[parent[nt]] * tms[parent[parent[nt]]]
        ok = pos & (jnp.abs(den) > 0.0)
        tms.append(jnp.where(ok, mt_new / jnp.where(ok, den, 1.0), 0.0))
    return mm_new, jnp.stack(tms)


def remap_fields(grid, topo: Topology, geom: RemapGeometry, *, mm, tm,
                 tracer_type, parent):
    """construct_fields + integrals + update for one mass field + tracers."""
    ny, nx = mm.shape
    mc, mx, my, tc_all, tx_all, ty_all = _reconstruct(
        grid, topo, mm=mm, tm=tm, tracer_type=tracer_type, parent=parent)

    # --- extended fields for donor views ---
    mcE = extend(mc, topo)
    mxE = extend(mx, topo, kind=FieldType.VECTOR)
    myE = extend(my, topo, kind=FieldType.VECTOR)
    tcE = extend(tc_all, topo)
    txE = extend(tx_all, topo, kind=FieldType.VECTOR)
    tyE = extend(ty_all, topo, kind=FieldType.VECTOR)

    qxn, qyn = _triangle_midpoints(geom.north)
    qxe, qye = _triangle_midpoints(geom.east)
    fn = _integrals(geom.north.donor, geom.north.triarea, qxn, qyn,
                    _nbr_views_north(mcE, ny, nx),
                    _nbr_views_north(mxE, ny, nx),
                    _nbr_views_north(myE, ny, nx),
                    _nbr_views_north(tcE, ny, nx),
                    _nbr_views_north(txE, ny, nx),
                    _nbr_views_north(tyE, ny, nx),
                    tracer_type, parent)
    fe = _integrals(geom.east.donor, geom.east.triarea, qxe, qye,
                    _nbr_views_east(mcE, ny, nx),
                    _nbr_views_east(mxE, ny, nx),
                    _nbr_views_east(myE, ny, nx),
                    _nbr_views_east(tcE, ny, nx),
                    _nbr_views_east(txE, ny, nx),
                    _nbr_views_east(tyE, ny, nx),
                    tracer_type, parent)

    return _update(grid, mm=mm, tm=tm, fe_mflx=fe.mflx,
                   fe_mtflx=fe.mtflx, fn_mflx=fn.mflx, fn_mtflx=fn.mtflx,
                   tracer_type=tracer_type, parent=parent)


def remap_fields_batch(grid, topo: Topology, geom: RemapGeometry, *, mm,
                       tm, tracer_type, parent, interpret=False):
    """remap_fields over all categories with the integrals as ONE fused
    Pallas row-tile kernel per edge (ops/pallas/remap_flux.py).

    mm: (ncat, ny, nx); tm: (ncat, ntrace, ny, nx). The XLA _integrals
    path reads the 12-MB extended tracer stacks once per donor view per
    coefficient (18 shifted HBM passes per edge per category, the
    dominant cost of the remap at gx1 size); the kernel holds a row tile
    of the RAW fields in VMEM, rebuilds the limited reconstructions
    in-register (`_reconstruct_ext`), and builds every donor view from
    them for free — the tc/tx/ty stacks never touch HBM at all.
    """
    from cice5_tpu.ops.pallas.remap_flux import integrals_tiled_both
    ny, nx = mm.shape[-2:]
    # one W=2 ghost ring of the raw fields: ring 1 holds the donor cells
    # the edge views read, ring 2 their gradient neighborhoods
    mmE2 = extend_wide(mm, topo, 2)
    tmE2 = extend_wide(tm, topo, 2)
    hmE2 = extend_wide(grid.hm, topo, 2)

    qxn, qyn = _triangle_midpoints(geom.north)
    qxe, qye = _triangle_midpoints(geom.east)
    fn_mflx, fn_mtflx, fe_mflx, fe_mtflx = integrals_tiled_both(
        (geom.north.donor, geom.north.triarea, qxn, qyn),
        (geom.east.donor, geom.east.triarea, qxe, qye),
        mmE2, tmE2, hmE2, tracer_type, parent, ny, nx,
        interpret=interpret)

    return jax.vmap(lambda m, t, fem, femt, fnm, fnmt: _update(
        grid, mm=m, tm=t, fe_mflx=fem, fe_mtflx=femt, fn_mflx=fnm,
        fn_mtflx=fnmt, tracer_type=tracer_type, parent=parent))(
        mm, tm, fe_mflx, fe_mtflx, fn_mflx, fn_mtflx)


class TransportChecks(NamedTuple):
    """Runtime transport diagnostics (ice_transport_driver.F90:123-174
    abort-on-violation checks, surfaced as diag values)."""
    conserv_err: jnp.ndarray      # max relative global-sum drift
    mono_violations: jnp.ndarray  # count of monotone-bound violations


def transport_remap(dt, grid, topo: Topology, tr: TracerRegistry, *, uvel,
                    vvel, aicen, vicen, vsnon, trcrn,
                    conserv_check=False, monotonicity_check=False,
                    fixed_area=False, kernel="xla"):
    """Full-state incremental remapping (transport_remap :198-630 +
    state_to_tracers/tracers_to_state): mass field = aicen per category;
    tracers = [hice, hsno, trcrn...] with the reference's dependency table.

    conserv_check / monotonicity_check (l_conservation_check /
    l_monotonicity_check, ice_transport_driver.F90:257-259): when either is
    on, a TransportChecks diagnostic is returned as a fifth output —
    the relative global area/volume conservation error
    (global_conservation :1011) and the count of monotone-bound violations
    (local_max_min/check_monotonicity :1084,1244).
    """
    ncat = aicen.shape[0]
    ntrcr = tr.ntrcr

    # tracer table: index 0 = hice (type 1), 1 = hsno (type 1),
    # 2+it = trcrn[it]
    tracer_type = [1, 1]
    parent = [-1, -1]
    for it in range(ntrcr):
        d = tr.depend[it]
        if d == DEP_AICE:
            tracer_type.append(1)
            parent.append(-1)
        elif d == DEP_VICE:
            tracer_type.append(2)
            parent.append(0)
        elif d == DEP_VSNO:
            tracer_type.append(2)
            parent.append(1)
        else:
            p = d - DEP_TRCR
            # depends on tracer p (itself type 1 or 2)
            if tr.depend[p] < DEP_TRCR and tr.depend[p] == DEP_AICE:
                tracer_type.append(2)
                parent.append(2 + p)
            else:
                tracer_type.append(3)
                parent.append(2 + p)

    # class-sort the tracer table so that every (type, parent) class is a
    # CONTIGUOUS block of the packed stack: the per-class reads in
    # remap_fields/_integrals then compile to basic slices instead of
    # gather copies of the ~12 MB view stacks (the dominant HBM cost of
    # remap at gx1 size). Stable sort keeps parents (type 1 < 2 < 3)
    # ahead of their dependents, which the update recursion requires.
    n_all = 2 + ntrcr
    def _ckey(i):
        t = tracer_type[i]
        return (1, 0) if t == 1 else (t, parent[i])
    order = sorted(range(n_all), key=_ckey)
    inv = [0] * n_all
    for k, i in enumerate(order):
        inv[i] = k
    tracer_type = [tracer_type[i] for i in order]
    parent = [inv[parent[i]] if parent[i] >= 0 else -1 for i in order]

    safe_a = jnp.maximum(aicen, ct.puny)
    has = aicen > 0.0
    hice = jnp.where(has, vicen / safe_a, 0.0)
    hsno = jnp.where(has, vsnon / safe_a, 0.0)
    def _src(i):
        if i == 0:
            return hice
        if i == 1:
            return hsno
        return trcrn[:, i - 2]
    tm = jnp.stack([_src(i) for i in order], axis=1)

    geom = remap_geometry(dt, grid, topo, uvel=uvel, vvel=vvel,
                          fixed_area=fixed_area)

    def one_cat(mmc, tmc):
        return remap_fields(grid, topo, geom, mm=mmc, tm=tmc,
                            tracer_type=tuple(tracer_type),
                            parent=tuple(parent))

    if monotonicity_check:
        def bounds_one(mmc, tmc):
            aimask = (mmc > 0.0).astype(mmc.dtype)
            return monotonicity_bounds(tmc, aimask, tuple(tracer_type),
                                       tuple(parent), topo)
        tmin, tmax = jax.vmap(bounds_one)(aicen, tm)

    if kernel == "pallas":
        mm_new, tm_new = remap_fields_batch(
            grid, topo, geom, mm=aicen, tm=tm,
            tracer_type=tuple(tracer_type), parent=tuple(parent))
    else:
        mm_new, tm_new = jax.vmap(one_cat)(aicen, tm)

    aicen_n = mm_new
    hice_n = tm_new[:, inv[0]]
    hsno_n = tm_new[:, inv[1]]
    trcrn_n = jnp.stack([tm_new[:, inv[2 + it]] for it in range(ntrcr)],
                        axis=1)
    vicen_n = aicen_n * hice_n
    vsnon_n = aicen_n * hsno_n

    if conserv_check or monotonicity_check:
        err = jnp.zeros((), aicen.dtype)
        nbad = jnp.zeros((), jnp.int32)
        if conserv_check:
            for m0, m1 in ((aicen, aicen_n), (vicen, vicen_n),
                           (vsnon, vsnon_n)):
                s0 = global_conservation(jnp.sum(m0, 0), grid.tarea, topo)
                s1 = global_conservation(jnp.sum(m1, 0), grid.tarea, topo)
                err = jnp.maximum(
                    err, jnp.abs(s1 - s0) / jnp.maximum(jnp.abs(s0), 1.0))
        if monotonicity_check:
            from cice5_tpu.parallel import global_sum

            def viol_one(mmc, tmc, tminc, tmaxc):
                return check_monotonicity(tminc, tmaxc, mmc, tmc,
                                          tuple(tracer_type), tuple(parent))
            bad = jax.vmap(viol_one)(mm_new, tm_new, tmin, tmax)
            nbad = global_sum(bad.astype(jnp.int32), topo).astype(jnp.int32)
        return aicen_n, vicen_n, vsnon_n, trcrn_n, TransportChecks(
            conserv_err=err, mono_violations=nbad)
    return aicen_n, vicen_n, vsnon_n, trcrn_n


def monotonicity_bounds(tm, aimask, tracer_type, parent, topo):
    """Local pre-transport tracer min/max over the 9-point neighborhood
    (ice_transport_driver.F90:1084-1190 local_max_min): bounds are taken
    over neighbors that carry the tracer (mass/parent mask), and are the
    monotone limits remapped values must respect.

    tm: (ntrace, ny, nx); aimask: 1.0 where mass > 0. Returns (tmin, tmax).
    """
    ntrace = tm.shape[0]
    masks = []
    for nt in range(ntrace):
        if tracer_type[nt] == 1:
            masks.append(aimask)
        else:
            p = parent[nt]
            masks.append(aimask * (jnp.abs(tm[p]) > ct.puny))
    pm = jnp.stack(masks)
    tmE = extend(tm, topo)
    pmE = extend(pm, topo)
    big = jnp.asarray(1.0e30, tm.dtype)
    tmin = jnp.where(pm > 0.0, tm, big)
    tmax = jnp.where(pm > 0.0, tm, -big)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            v = shifted(tmE, di, dj)
            m = shifted(pmE, di, dj) > 0.0
            tmin = jnp.minimum(tmin, jnp.where(m, v, big))
            tmax = jnp.maximum(tmax, jnp.where(m, v, -big))
    return tmin, tmax


def check_monotonicity(tmin, tmax, mm_new, tm_new, tracer_type, parent):
    """Monotonicity violations after remap
    (ice_transport_driver.F90:1244-1330 check_monotonicity): new tracer
    values outside the pre-transport neighborhood bounds. Returns a bool
    (ntrace, ny, nx) violation mask (all False when the scheme is
    monotone)."""
    ntrace = tm_new.shape[0]
    out = []
    for nt in range(ntrace):
        lc = mm_new > ct.puny
        if tracer_type[nt] >= 2:
            lc = lc & (jnp.abs(tm_new[parent[nt]]) > ct.puny)
        if tracer_type[nt] == 3:
            lc = lc & (jnp.abs(tm_new[parent[parent[nt]]]) > ct.puny)
        span = jnp.maximum(jnp.abs(tmin[nt]), jnp.abs(tmax[nt]))
        # the reference's puny tolerance assumes r8; in f32 the remap
        # arithmetic itself rounds at ~eps32, so the bound tolerance must
        # sit above that noise floor (cf. CLAUDE.md f32 conventions)
        eps_tol = max(ct.puny, 50.0 * float(jnp.finfo(tm_new.dtype).eps))
        tol = eps_tol * (1.0 + span)
        bad = lc & ((tm_new[nt] < tmin[nt] - tol)
                    | (tm_new[nt] > tmax[nt] + tol))
        out.append(bad)
    return jnp.stack(out)


def global_conservation(mm, tarea, topo):
    """Global mass integral for conservation checking
    (ice_transport_driver.F90:1011-1082 global_conservation); compare
    before/after transport."""
    from cice5_tpu.parallel import global_sum
    return global_sum(mm * tarea, topo)
