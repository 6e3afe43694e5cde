"""Ice thickness distribution (ITD) machinery.

TPU-native re-expression of /root/reference/source/ice_itd.F90 (category
bounds :83-237, aggregate :246, rebin :516, shift_ice :815, compute_tracers
:1359, cleanup_itd :1514, zap_small_areas :1778) and ice_therm_itd.F90
(linear_itd :69, fit_line :871, lateral_melt :1043, add_new_ice :1239).

State layout: aicen/vicen/vsnon (ncat, *B); trcrn (ncat, ntrcr, *B). The
reference's compressed per-cell index lists and per-boundary shiftflags
become dense masked arithmetic; the sequential loop over the ncat-1 category
boundaries stays a static Python loop (4 iterations for ncat=5), each fully
vectorized over the grid — the donor/receiver scatter is expressed as a pair
of jnp.where adds per boundary, so XLA fuses the whole shift into one pass.

Tracer conservation uses the dependency-weight formalism: every tracer slot
has a weight w(it) in {aicen, vicen, vsnon, w(parent)*trcrn[parent]}; the
conserved quantity is w*trcrn (ice_transport_driver.F90:95-110 semantics),
and shift/aggregate/compute_tracers all derive from it.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.ops.blockwrite import add_trc, set_cat, set_trc, set_trc_cat
from cice5_tpu.state import TracerRegistry, DEP_AICE, DEP_VICE, DEP_VSNO, DEP_TRCR


# ----------------------------------------------------------------------
# category bounds (ice_itd.F90:83-237)
# ----------------------------------------------------------------------

def category_bounds(ncat: int, kitd: int = 1, kcatbound: int = 1,
                    hi_min: float = 0.01) -> np.ndarray:
    """hin_max(0:ncat) category thickness limits."""
    hin_max = np.zeros(ncat + 1)
    if kcatbound == -1:
        hin_max[1] = 100.0
    elif kcatbound == 0:
        if kitd == 1:
            cc1 = 3.0 / ncat
            cc2 = 15.0 * cc1
            cc3 = 3.0
            hin_max[0] = 0.0
        else:
            hi_min = 0.1
            cc1 = max(1.1 / ncat, hi_min)
            cc2 = 25.0 * cc1
            cc3 = 2.25
            hin_max[0] = hi_min
        for n in range(1, ncat + 1):
            x1 = (n - 1) / ncat
            hin_max[n] = hin_max[n - 1] + cc1 + cc2 * (
                1.0 + np.tanh(cc3 * (x1 - 1.0)))
    elif kcatbound == 1:
        d1, d2 = 3.0 / ncat, 0.5 / ncat
        for n in range(1, ncat + 1):
            hin_max[n] = n * (d1 + (n - 1) * d2)
    elif kcatbound == 2:
        wmo = {5: [0.30, 0.70, 1.20, 2.00, 999.0],
               6: [0.15, 0.30, 0.70, 1.20, 2.00, 999.0],
               7: [0.10, 0.15, 0.30, 0.70, 1.20, 2.00, 999.0]}
        hin_max[1:] = wmo[ncat]
    # tuple of Python floats: numpy f64 scalars would strongly promote f32
    # arrays under jax_enable_x64 wherever hin_max[k] enters jnp arithmetic
    return tuple(float(h) for h in hin_max)


# ----------------------------------------------------------------------
# tracer dependency weights
# ----------------------------------------------------------------------

def tracer_weights(tr: TracerRegistry, aicen, vicen, vsnon, trcrn):
    """Per-slot conservation weights w so that (w * trcrn) is conserved.

    aicen/vicen/vsnon: (ncat, *B); trcrn: (ncat, ntrcr, *B).
    Returns w: (ncat, ntrcr, *B). Parents always precede children in the
    registry, so a single in-order pass resolves chains.
    """
    ws = []
    for it in range(tr.ntrcr):
        d = tr.depend[it]
        if d == DEP_AICE:
            w = aicen
        elif d == DEP_VICE:
            w = vicen
        elif d == DEP_VSNO:
            w = vsnon
        else:
            p = d - DEP_TRCR
            w = ws[p] * trcrn[:, p]
        ws.append(w)
    return jnp.stack(ws, axis=1)


def compute_tracers(tr: TracerRegistry, atrcrn, aicen, vicen, vsnon):
    """Invert conserved amounts back to tracer values
    (ice_itd.F90:1359-1501 compute_tracers).

    atrcrn: (ncat, ntrcr, *B) conserved amounts. Returns trcrn."""
    outs = []
    for it in range(tr.ntrcr):
        d = tr.depend[it]
        if d == DEP_AICE:
            w = aicen
            ok = aicen > ct.puny
        elif d == DEP_VICE:
            w = vicen
            ok = vicen > 0.0
        elif d == DEP_VSNO:
            w = vsnon
            ok = vsnon > 0.0
        else:
            # walk the parent chain: weight = base * prod(parent tracers)
            w = None
            q = it
            while tr.depend[q] >= DEP_TRCR:
                q = tr.depend[q] - DEP_TRCR
                w = outs[q] if w is None else w * outs[q]
            base = {DEP_AICE: aicen, DEP_VICE: vicen,
                    DEP_VSNO: vsnon}[tr.depend[q]]
            w = base * w
            ok = w > 0.0
        val = jnp.where(ok, atrcrn[:, it] / jnp.where(ok, w, 1.0), 0.0)
        if it == tr.nt_Tsfc:
            val = jnp.where(ok, val, ct.Tocnfrz)
        if it == tr.nt_fbri:
            val = jnp.where(ok, val, 1.0)
        outs.append(val)
    return jnp.stack(outs, axis=1)


# ----------------------------------------------------------------------
# aggregation (ice_itd.F90:246-508)
# ----------------------------------------------------------------------

class Aggregate(NamedTuple):
    aice: jnp.ndarray
    vice: jnp.ndarray
    vsno: jnp.ndarray
    trcr: jnp.ndarray   # (ntrcr, *B) cell-mean tracers
    aice0: jnp.ndarray


def aggregate(tr: TracerRegistry, aicen, vicen, vsnon, trcrn) -> Aggregate:
    """Category -> cell aggregates incl. dependency-weighted tracer means."""
    aice = jnp.sum(aicen, axis=0)
    vice = jnp.sum(vicen, axis=0)
    vsno = jnp.sum(vsnon, axis=0)
    w = tracer_weights(tr, aicen, vicen, vsnon, trcrn)
    atrcr = jnp.sum(w * trcrn, axis=0)             # (ntrcr, *B)
    wtot = jnp.sum(w, axis=0)
    ok = wtot > ct.puny
    trcr = jnp.where(ok, atrcr / jnp.where(ok, wtot, 1.0), 0.0)
    aice0 = jnp.maximum(1.0 - aice, 0.0)
    return Aggregate(aice=aice, vice=vice, vsno=vsno, trcr=trcr, aice0=aice0)


def aggregate_area(aicen):
    """Category -> cell ice area + open-water fraction
    (ice_itd.F90:468 aggregate_area). Returns (aice, aice0)."""
    aice = jnp.sum(aicen, axis=0)
    return aice, jnp.maximum(1.0 - aice, 0.0)


def column_sum(xin):
    """Sum a (nsum, *B) stack over its leading category/layer axis
    (ice_itd.F90:1251 column_sum) — dense analog of the gathered loop."""
    return jnp.sum(xin, axis=0)


def column_conservation_check(x1, x2, max_err):
    """Per-cell conservation check |x2 - x1| <= max_err
    (ice_itd.F90:1299 column_conservation_check).

    Dense analog of the reference's l_stop/istop/jstop abort: returns
    (nbad, max_abs_err); the caller folds nbad into the in-step failure
    counter (StepDiag.state_bad) and the host-side check_state dump
    localizes the offending cells. The reference tolerance is calibrated
    for f64; in f32 the column sums themselves round at ~eps32*|x|, so a
    scale-aware term is added (the repo-wide f32 tolerance convention,
    cf. bl99/mushy energy checks).
    """
    err = jnp.abs(x2 - x1)
    tol = max_err + 16.0 * jnp.finfo(x1.dtype).eps * jnp.abs(x1)
    return jnp.sum((err > tol).astype(jnp.int32)), jnp.max(err)


def itd_conservation_sums(tr: TracerRegistry, nilyr, nslyr, aicen, vicen,
                          vsnon, trcrn):
    """Column sums of the five fields linear_itd conservation-checks:
    vice, vsno, eice, esno, sice (ice_therm_itd.F90:700-860).

    eicen = sum_k qice_k * vicen/nilyr per category (J/m^2), likewise
    esnon; sicen = sum_k sice_k * vicen/nilyr. Returns a 5-tuple of (*B)
    arrays.
    """
    eicen = jnp.sum(trcrn[:, tr.nt_qice:tr.nt_qice + nilyr], axis=1) \
        * vicen / nilyr
    esnon = jnp.sum(trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr], axis=1) \
        * vsnon / nslyr
    sicen = jnp.sum(trcrn[:, tr.nt_sice:tr.nt_sice + nilyr], axis=1) \
        * vicen / nilyr
    return (column_sum(vicen), column_sum(vsnon), column_sum(eicen),
            column_sum(esnon), column_sum(sicen))


def itd_conservation_check(pre, post):
    """Check the 5 linear_itd column sums against the reference's
    per-field tolerances (ice_therm_itd.F90:783-860: puny for volumes
    and salt, puny*Lfresh*rho for energies). Returns the total count of
    violating (cell, field) pairs, 0 when conserved."""
    tols = (ct.puny, ct.puny, ct.puny * ct.Lfresh * ct.rhoi,
            ct.puny * ct.Lfresh * ct.rhos, ct.puny)
    nbad = jnp.zeros((), jnp.int32)
    for x1, x2, tol in zip(pre, post, tols):
        nb, _ = column_conservation_check(x1, x2, tol)
        nbad = nbad + nb
    return nbad


def zerolayer_check(tr: TracerRegistry, nilyr, nslyr, aicen, vicen, vsnon,
                    trcrn):
    """ktherm=0 consistency check (ice_itd.F90:2428 zerolayer_check):
    with zero heat capacity every enthalpy slot must equal the latent
    placeholder, i.e. eicen + rhoi*Lfresh*vicen == 0 and
    esnon + rhos*Lfresh*vsnon == 0 to within puny*Lfresh*rhos.
    Returns the count of violating (cell, category) pairs."""
    eps = jnp.finfo(vicen.dtype).eps
    # reference tolerance (f64-calibrated) + the f32 rounding floor of
    # the q*v products themselves (~eps*rho*Lfresh*v)
    max_error_i = ct.puny * ct.Lfresh * ct.rhos \
        + 16.0 * eps * ct.rhoi * ct.Lfresh * vicen
    max_error_s = ct.puny * ct.Lfresh * ct.rhos \
        + 16.0 * eps * ct.rhos * ct.Lfresh * vsnon
    eicen = jnp.sum(trcrn[:, tr.nt_qice:tr.nt_qice + nilyr], axis=1) \
        * vicen / nilyr
    esnon = jnp.sum(trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr], axis=1) \
        * vsnon / nslyr
    bad_i = jnp.abs(eicen + ct.rhoi * ct.Lfresh * vicen) > max_error_i
    bad_s = jnp.abs(esnon + ct.rhos * ct.Lfresh * vsnon) > max_error_s
    return jnp.sum((bad_i | bad_s).astype(jnp.int32))


# ----------------------------------------------------------------------
# shift_ice (ice_itd.F90:815-1243)
# ----------------------------------------------------------------------

def _shift_boundary(tr: TracerRegistry, pair, t_lo, t_hi, lo_is_donor,
                    active, da, dv):
    """One category-boundary transfer (ice_itd.F90:905-1130 core).

    pair: 8-tuple (a_lo, a_hi, v_lo, v_hi, s_lo, s_hi, at_lo, at_hi) of
    the lower/upper category's area, ice volume, snow volume, and
    conserved tracer amounts (ntrcr, *B). t_lo/t_hi: tracer VALUES used
    for the transferred amounts (the reference reads pre-shift trcrn).
    lo_is_donor/active: (*B) bool; da/dv: raw area/volume to move.
    Returns the updated 8-tuple.
    """
    a_lo, a_hi, v_lo, v_hi, s_lo, s_hi, at_lo, at_hi = pair
    a_nd = jnp.where(lo_is_donor, a_lo, a_hi)
    v_nd = jnp.where(lo_is_donor, v_lo, v_hi)

    # range snapping (ice_itd.F90:905-1032): tiny -> zero, near-full ->
    # whole category
    tiny = (da < -ct.puny * a_nd) | (dv < -ct.puny * v_nd)
    da = jnp.where((da < 0) & ~tiny, 0.0, da)
    dv = jnp.where((dv < 0) & ~tiny, 0.0, dv)
    whole = (da > a_nd * (1.0 - ct.puny)) | (dv > v_nd * (1.0 - ct.puny))
    da = jnp.where(whole, a_nd, da)
    dv = jnp.where(whole, v_nd, dv)
    active = active & (da > 0.0)
    da = jnp.where(active, da, 0.0)
    dv = jnp.where(active, dv, 0.0)

    frac = jnp.where(active, da / jnp.maximum(a_nd, ct.puny), 0.0)
    s_nd = jnp.where(lo_is_donor, s_lo, s_hi)
    dvs = s_nd * frac

    # signed deltas for the two categories at this boundary
    sgn_lo = jnp.where(lo_is_donor, -1.0, 1.0)
    a_lo = a_lo + sgn_lo * da
    a_hi = a_hi - sgn_lo * da
    v_lo = v_lo + sgn_lo * dv
    v_hi = v_hi - sgn_lo * dv
    s_lo = s_lo + sgn_lo * dvs
    s_hi = s_hi - sgn_lo * dvs

    # tracer amounts from the donor category
    t_nd = jnp.where(lo_is_donor[None], t_lo, t_hi)
    dats = []
    for it in range(tr.ntrcr):
        # walk the parent chain: amount = base(root) * prod(parents) * t
        amt = t_nd[it]
        q = it
        while tr.depend[q] >= DEP_TRCR:
            q = tr.depend[q] - DEP_TRCR
            amt = amt * t_nd[q]
        base = {DEP_AICE: da, DEP_VICE: dv, DEP_VSNO: dvs}[tr.depend[q]]
        dats.append(base * amt)
    dat = jnp.stack(dats, axis=0)                 # (ntrcr, *B)
    at_lo = at_lo + sgn_lo[None] * dat
    at_hi = at_hi - sgn_lo[None] * dat
    return a_lo, a_hi, v_lo, v_hi, s_lo, s_hi, at_lo, at_hi


def shift_ice(tr: TracerRegistry, aicen, vicen, vsnon, trcrn,
              donor, daice, dvice):
    """Transfer area/volume/tracers across category boundaries.

    donor: (ncat-1, *B) int32, -1 = no transfer, else 0-based donor category
    (either b or b+1 for boundary b). daice/dvice: (ncat-1, *B) >= 0.
    Returns updated (aicen, vicen, vsnon, trcrn).
    """
    ncat = aicen.shape[0]
    atrcrn = tracer_weights(tr, aicen, vicen, vsnon, trcrn) * trcrn

    # per-category PYTHON lists: the boundary loop updates list entries in
    # place (later boundaries must see earlier deposits — sequential
    # reference semantics, ice_itd.F90 boundary loop), with NO
    # dynamic-update-slices — each .at[b].add on the stacked arrays cost a
    # full-array HBM copy (8 x 56 MB per shift_ice call at gx1 size)
    aiL = [aicen[n] for n in range(ncat)]
    viL = [vicen[n] for n in range(ncat)]
    vsL = [vsnon[n] for n in range(ncat)]
    atL = [atrcrn[n] for n in range(ncat)]

    for b in range(ncat - 1):
        db = donor[b]
        pair = (aiL[b], aiL[b + 1], viL[b], viL[b + 1], vsL[b], vsL[b + 1],
                atL[b], atL[b + 1])
        (aiL[b], aiL[b + 1], viL[b], viL[b + 1], vsL[b], vsL[b + 1],
         atL[b], atL[b + 1]) = _shift_boundary(
            tr, pair, trcrn[b], trcrn[b + 1], db == b, db >= 0,
            daice[b], dvice[b])

    aicen = jnp.stack(aiL)
    vicen = jnp.stack(viL)
    vsnon = jnp.stack(vsL)
    atrcrn = jnp.stack(atL)
    trcrn = compute_tracers(tr, atrcrn, aicen, vicen, vsnon)
    return aicen, vicen, vsnon, trcrn


# ----------------------------------------------------------------------
# rebin (ice_itd.F90:516-729)
# ----------------------------------------------------------------------

def rebin(tr: TracerRegistry, hin_max, aicen, vicen, vsnon, trcrn):
    """Enforce category bounds by whole-category shifts.

    Each of the 2*(ncat-1) sequential boundary passes only touches the
    two categories straddling its boundary, so the whole routine runs on
    per-category Python lists and converts tracer amounts <-> values for
    just that PAIR per pass (the reference calls a full-ITD shift_ice per
    boundary, ice_itd.F90:516-729 — same math, but a dense port of that
    costs ncat/2 redundant passes over the (ncat, ntrcr, ny, nx) tracer
    stack per boundary in HBM traffic).
    """
    ncat = aicen.shape[0]
    hicen = jnp.where(aicen > ct.puny,
                      vicen / jnp.maximum(aicen, ct.puny), 0.0)

    # cat 1 minimum thickness
    if hin_max[0] > 0.0:
        thin = (aicen[0] > ct.puny) & (hicen[0] <= hin_max[0])
        aicen = set_cat(aicen, 0, jnp.where(thin, vicen[0] / hin_max[0],
                                            aicen[0]))

    atrcrn = tracer_weights(tr, aicen, vicen, vsnon, trcrn) * trcrn
    aiL = [aicen[n] for n in range(ncat)]
    viL = [vicen[n] for n in range(ncat)]
    vsL = [vsnon[n] for n in range(ncat)]
    atL = [atrcrn[n] for n in range(ncat)]

    def boundary_shift(b, donor_cat):
        h = jnp.where(aiL[donor_cat] > ct.puny,
                      viL[donor_cat] / jnp.maximum(aiL[donor_cat], ct.puny),
                      0.0)
        if donor_cat == b:            # too thick -> move up
            move = (aiL[b] > ct.puny) & (h > hin_max[b + 1])
        else:                         # too thin -> move down
            move = (aiL[b + 1] > ct.puny) & (h <= hin_max[b + 1])
        # tracer values for the pair from current amounts, then re-derive
        # the amounts from those values — the same amounts->values->amounts
        # roundtrip each full shift_ice call performs (zaps residual
        # amounts in empty categories, reference semantics)
        a2 = jnp.stack([aiL[b], aiL[b + 1]])
        v2 = jnp.stack([viL[b], viL[b + 1]])
        s2 = jnp.stack([vsL[b], vsL[b + 1]])
        t2 = compute_tracers(tr, jnp.stack([atL[b], atL[b + 1]]),
                             a2, v2, s2)
        at2 = tracer_weights(tr, a2, v2, s2, t2) * t2
        da = jnp.where(move, aiL[donor_cat], 0.0)
        dv = jnp.where(move, viL[donor_cat], 0.0)
        lo_is_donor = jnp.full(move.shape, donor_cat == b)
        pair = (aiL[b], aiL[b + 1], viL[b], viL[b + 1], vsL[b],
                vsL[b + 1], at2[0], at2[1])
        (aiL[b], aiL[b + 1], viL[b], viL[b + 1], vsL[b], vsL[b + 1],
         atL[b], atL[b + 1]) = _shift_boundary(
            tr, pair, t2[0], t2[1], lo_is_donor, move, da, dv)

    for b in range(ncat - 1):             # move thin categories up
        boundary_shift(b, b)
    for b in reversed(range(ncat - 1)):   # move thick categories down
        boundary_shift(b, b + 1)

    aicen = jnp.stack(aiL)
    vicen = jnp.stack(viL)
    vsnon = jnp.stack(vsL)
    trcrn = compute_tracers(tr, jnp.stack(atL), aicen, vicen, vsnon)
    return aicen, vicen, vsnon, trcrn


# ----------------------------------------------------------------------
# linear remapping ITD (ice_therm_itd.F90:69-868)
# ----------------------------------------------------------------------

def _fit_line(aicen, hice, hbL, hbR):
    """g(eta) = g0 + g1*eta over [hL, hR] (ice_therm_itd.F90:871-958)."""
    ok = (aicen > ct.puny) & (hbR - hbL > ct.puny)
    hL, hR = hbL, hbR
    h13 = (2.0 * hL + hR) / 3.0
    h23 = (hL + 2.0 * hR) / 3.0
    hR = jnp.where(hice < h13, 3.0 * hice - 2.0 * hL, hR)
    hL = jnp.where(hice > h23, 3.0 * hice - 2.0 * hR, hL)
    dhr = 1.0 / jnp.maximum(hR - hL, 1e-30)
    wk1 = 6.0 * aicen * dhr
    wk2 = (hice - hL) * dhr
    g0 = jnp.where(ok, wk1 * (2.0 / 3.0 - wk2), 0.0)
    g1 = jnp.where(ok, 2.0 * dhr * wk1 * (wk2 - 0.5), 0.0)
    hL = jnp.where(ok, hL, 0.0)
    hR = jnp.where(ok, hR, 0.0)
    return g0, g1, hL, hR


def linear_itd(tr: TracerRegistry, hin_max, nslyr, *, aicen_init, vicen_init,
               aicen, vicen, vsnon, trcrn, hi_min=0.01):
    """Linear-remapping transport in thickness space after thermo growth
    (ice_therm_itd.F90:69-868 linear_itd). Returns updated state.

    Cells where the boundary shift is out of range keep remap_flag=False and
    are left to rebin (call cleanup/rebin afterwards).
    """
    ncat = aicen.shape[0]
    B = aicen.shape[1:]
    dtype = aicen.dtype
    # plain Python floats: numpy scalars would strongly promote f32 arrays
    # to f64 under jax_enable_x64
    hmax = [float(h) for h in hin_max]
    hmax[ncat] = 999.9

    safe = lambda v, a: jnp.where(a > ct.puny, v / jnp.maximum(a, ct.puny), 0.0)
    hicen_init = safe(vicen_init, aicen_init)
    hicen = safe(vicen, aicen)
    dhicen = jnp.where(aicen > ct.puny, hicen - hicen_init, 0.0)

    # new boundaries hbnew (:282-350)
    hbnew = [jnp.full(B, hmax[0], dtype)]
    remap = jnp.ones(B, bool)
    for n in range(ncat - 1):
        hi_n, hi_n1 = hicen_init[n], hicen_init[n + 1]
        both = (hi_n > ct.puny) & (hi_n1 > ct.puny)
        slope = jnp.where(both, (dhicen[n + 1] - dhicen[n])
                          / jnp.where(both, hi_n1 - hi_n, 1.0), 0.0)
        hb = jnp.where(
            both, hmax[n + 1] + dhicen[n] + slope * (hmax[n + 1] - hi_n),
            jnp.where(hi_n > ct.puny, hmax[n + 1] + dhicen[n],
                      jnp.where(hi_n1 > ct.puny, hmax[n + 1] + dhicen[n + 1],
                                hmax[n + 1])))
        remap = remap & ~((aicen[n] > ct.puny) & (hicen[n] >= hb))
        remap = remap & ~((aicen[n + 1] > ct.puny) & (hicen[n + 1] <= hb))
        remap = remap & (hb <= hmax[n + 2]) & (hb >= hmax[n])
        hbnew.append(hb)
    # hbnew(ncat)
    hb_last = jnp.where(aicen[ncat - 1] > ct.puny,
                        3.0 * hicen[ncat - 1] - 2.0 * hbnew[ncat - 1],
                        hmax[ncat])
    hbnew.append(jnp.maximum(hb_last, hmax[ncat - 1]))

    # --- category-1 open-water melt (:469-540) ---
    g0, g1, hL, hR = _fit_line(aicen[0], hicen_init[0], hbnew[0],
                               jnp.full(B, hmax[1], dtype))
    dh0 = dhicen[0]
    melt1 = remap & (aicen[0] > ct.puny) & (dh0 < 0.0)
    dh0m = jnp.minimum(-dh0, hmax[1])
    etamax = jnp.minimum(dh0m, hR) - hL
    x1 = etamax
    x2 = 0.5 * etamax * etamax
    da0 = g1 * x2 + g0 * x1
    damax = aicen[0] * (1.0 - hicen[0] / jnp.maximum(hicen_init[0], ct.puny))
    da0 = jnp.minimum(da0, damax)
    do_melt = melt1 & (etamax > 0.0)
    new_a1 = jnp.where(do_melt, aicen[0] - da0, aicen[0])
    hicen0 = jnp.where(do_melt,
                       hicen[0] * aicen[0] / jnp.maximum(new_a1, ct.puny),
                       hicen[0])
    aicen = set_cat(aicen, 0, new_a1)
    hicen = set_cat(hicen, 0, hicen0)
    # dh0 >= 0: shift lower bound right
    hbnew[0] = jnp.where(remap & (aicen[0] > ct.puny) & (dh0 >= 0.0),
                         jnp.minimum(dh0, hmax[1]), hbnew[0])

    # --- fit g(h) in every category with new boundaries (:545-560) ---
    g0s, g1s, hLs, hRs = [], [], [], []
    for n in range(ncat):
        g0, g1, hL, hR = _fit_line(aicen[n], hicen[n], hbnew[n], hbnew[n + 1])
        g0s.append(g0); g1s.append(g1); hLs.append(hL); hRs.append(hR)

    # --- boundary transfers (:565-648) ---
    donorL, daiceL, dviceL = [], [], []
    for n in range(ncat - 1):
        up = hbnew[n + 1] > hmax[n + 1]         # transfer n -> n+1
        etamin = jnp.where(up,
                           jnp.maximum(hmax[n + 1], hLs[n]) - hLs[n], 0.0)
        etamax = jnp.where(up,
                           jnp.minimum(hbnew[n + 1], hRs[n]) - hLs[n],
                           jnp.minimum(hmax[n + 1], hRs[n + 1]) - hLs[n + 1])
        nd_lo = up
        g0d = jnp.where(up, g0s[n], g0s[n + 1])
        g1d = jnp.where(up, g1s[n], g1s[n + 1])
        hLd = jnp.where(up, hLs[n], hLs[n + 1])
        a_nd = jnp.where(up, aicen[n], aicen[n + 1])
        v_nd = jnp.where(up, vicen[n], vicen[n + 1])

        has = remap & (etamax > etamin)
        x1 = etamax - etamin
        wk1 = etamin * etamin
        wk2 = etamax * etamax
        x2 = 0.5 * (wk2 - wk1)
        x3 = (wk2 * etamax - wk1 * etamin) / 3.0
        da = jnp.where(has, g1d * x2 + g0d * x1, 0.0)
        dv = jnp.where(has, g1d * x3 + g0d * x2 + da * hLd, 0.0)

        small = (da < a_nd * ct.puny) | (dv < v_nd * ct.puny)
        da = jnp.where(small, 0.0, da)
        dv = jnp.where(small, 0.0, dv)
        has = has & ~small
        whole = (da > a_nd * (1.0 - ct.puny)) | (dv > v_nd * (1.0 - ct.puny))
        da = jnp.where(has & whole, a_nd, da)
        dv = jnp.where(has & whole, v_nd, dv)

        dc = jnp.where(has, jnp.where(nd_lo, n, n + 1), -1).astype(jnp.int32)
        donorL.append(dc)
        daiceL.append(da)
        dviceL.append(dv)
    donor = jnp.stack(donorL)
    daice = jnp.stack(daiceL)
    dvice = jnp.stack(dviceL)

    # maintain qsno negative definiteness across the weighted shift (:655-690)
    qs0, qs1 = tr.nt_qsno, tr.nt_qsno + nslyr
    trcrn = add_trc(trcrn, qs0, qs1 - qs0, ct.rhos * ct.Lfresh)
    aicen, vicen, vsnon, trcrn = shift_ice(
        tr, aicen, vicen, vsnon, trcrn, donor, daice, dvice)
    trcrn = add_trc(trcrn, qs0, qs1 - qs0, -ct.rhos * ct.Lfresh)

    # enforce cat-1 minimum thickness (:697-715)
    h1 = safe(vicen[0], aicen[0])
    thin = remap & (aicen[0] > ct.puny) & (h1 < hi_min) & (hi_min > 0)
    da0 = jnp.where(thin, aicen[0] * (1.0 - h1 / hi_min), 0.0)
    aicen = set_cat(aicen, 0, aicen[0] - da0)
    return aicen, vicen, vsnon, trcrn


# ----------------------------------------------------------------------
# aerosol / pond / BGC conservation helpers
# ----------------------------------------------------------------------

def _aero_mass_per_cat(tr: TracerRegistry, vicen, vsnon, trcrn,
                       snow=True, ice=True):
    """Per-(species, category) aerosol mass (kg/m^2): vsnon*(snow-layer
    concentrations) + vicen*(ice-layer concentrations). Slot layout is the
    reference's nt_aero+4*(it-1): [sno ssl, sno int, ice ssl, ice int]
    (ice_state.F90:118, ice_aerosol.F90:165). Returns (n_aero, ncat, *B)
    or an empty (0,)+B-ish array when no aerosols."""
    na = tr.n_aero
    if na == 0:
        return jnp.zeros((0,) + vicen.shape, vicen.dtype)
    a0 = tr.nt_aero
    out = []
    for it in range(na):
        m = jnp.zeros_like(vicen)
        if snow:
            m = m + vsnon * (trcrn[:, a0 + 4 * it]
                             + trcrn[:, a0 + 4 * it + 1])
        if ice:
            m = m + vicen * (trcrn[:, a0 + 4 * it + 2]
                             + trcrn[:, a0 + 4 * it + 3])
        out.append(m)
    return jnp.stack(out)


def _pond_volume_per_cat(tr: TracerRegistry, aicen, trcrn, tr_pond_topo):
    """Per-category topo-pond water volume aicen*apnd*hpnd (m)
    (ice_itd.F90:1910-1913). Zero array when topo ponds are off."""
    if not tr_pond_topo or tr.nt_apnd < 0:
        return jnp.zeros_like(aicen)
    return aicen * trcrn[:, tr.nt_apnd] * trcrn[:, tr.nt_hpnd]


def _bgc_mass_per_cat(tr: TracerRegistry, aicen, trcrn):
    """Per-(bgc tracer, category) PHYSICAL skeletal-BGC mass per grid
    area: aicen*conc*phi_sk (mmol/m^2). The trcrn slot carries
    concentration*sk_l of the porous layer; the physical mass carries the
    porosity factor, matching the units of flux_bio (ice_algae.F90:464
    flux_bio += ...*phi_sk). Slots are area-rooted (ice_zbgc.F90:311-319).
    Returns (nbtrcr, ncat, *B)."""
    if tr.nbtrcr == 0:
        return jnp.zeros((0,) + aicen.shape, aicen.dtype)
    from cice5_tpu.models.tracers.brine import PHI_SK
    return jnp.stack([aicen * trcrn[:, s] * PHI_SK for s in tr.nt_bgc])


# ----------------------------------------------------------------------
# lateral melt (ice_therm_itd.F90:1043-1235)
# ----------------------------------------------------------------------

class LateralMelt(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    fresh: jnp.ndarray
    fsalt: jnp.ndarray
    fhocn: jnp.ndarray
    meltl: jnp.ndarray
    dfpond: jnp.ndarray      # topo-pond water removed (m)
    dfaero: jnp.ndarray      # (n_aero, *B) aerosol flux to ocean (kg/m^2/s)
    dflux_bio: jnp.ndarray   # (nbtrcr, *B) BGC flux to ocean (mmol/m^2/s)


def lateral_melt(dt, tr: TracerRegistry, nilyr, nslyr, *, aicen, vicen,
                 vsnon, trcrn, rside, tr_pond_topo=False) -> LateralMelt:
    """Melt fraction rside of every category laterally; tracers unchanged.

    The melted fraction's aerosol / topo-pond water / skeletal-BGC load
    goes to the ocean (ice_therm_itd.F90:1146-1152 dfpond, :1196-1212
    faero_ocn). Deviation for strict conservation: the reference computes
    the aerosol flux from POST-melt volumes (under-recording by a factor
    1-rside; same quirk it has for fhocn); here the aerosol/BGC fluxes use
    PRE-melt volumes so the global budget closes exactly. BGC routing is
    a conservation completion the 5.1.2 reference omits (its skl tracers
    simply shrink with area)."""
    r = rside[None]
    dfresh = jnp.sum((ct.rhos * vsnon + ct.rhoi * vicen) * r, axis=0) / dt
    dfsalt = jnp.sum(ct.rhoi * vicen * r, axis=0) \
        * ct.ice_ref_salinity * 0.001 / dt
    meltl = jnp.sum(vicen * r, axis=0)
    dfpond = jnp.sum(_pond_volume_per_cat(tr, aicen, trcrn, tr_pond_topo)
                     * r, axis=0)
    dfaero = jnp.sum(_aero_mass_per_cat(tr, vicen, vsnon, trcrn)
                     * r[None], axis=1) / dt
    dflux_bio = jnp.sum(_bgc_mass_per_cat(tr, aicen, trcrn) * r[None],
                        axis=1) / dt

    aicen_new = aicen * (1.0 - r)
    vicen_new = vicen * (1.0 - r)
    vsnon_new = vsnon * (1.0 - r)

    qice = trcrn[:, tr.nt_qice:tr.nt_qice + nilyr]    # (ncat, nilyr, *B)
    qsno = trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr]
    # note: reference uses post-melt volumes here (vicen already scaled)
    fhocn = (jnp.sum(jnp.sum(qice, axis=1) * vicen_new / nilyr * r, axis=0)
             + jnp.sum(jnp.sum(qsno, axis=1) * vsnon_new / nslyr * r,
                       axis=0)) / dt
    return LateralMelt(aicen=aicen_new, vicen=vicen_new, vsnon=vsnon_new,
                       fresh=dfresh, fsalt=dfsalt, fhocn=fhocn, meltl=meltl,
                       dfpond=dfpond, dfaero=dfaero, dflux_bio=dflux_bio)


# ----------------------------------------------------------------------
# add_new_ice (ice_therm_itd.F90:1239-1860)
# ----------------------------------------------------------------------

class NewIce(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    trcrn: jnp.ndarray
    frazil: jnp.ndarray
    dfresh: jnp.ndarray   # frazil fresh-water flux to ocean (kg/m^2/s)
    dfsalt: jnp.ndarray   # frazil salt flux to ocean (kg/m^2/s)
    flux_bio: jnp.ndarray  # (nbtrcr, *B) BGC uptake from the ocean into
                           # new frazil ice (mmol/m^2/s, negative = ocean
                           # loses; ice_zbgc.F90:988-999 add_new_ice_bgc)


def add_new_ice(dt, tr: TracerRegistry, hin_max, nilyr, *, aicen, vicen,
                trcrn, aice, aice0, frzmlt, Tf, salinz,
                tr_FY=False, tr_lvl=False, tr_iage=False,
                update_ocn_f=False, ktherm=1, sss=None,
                phi_init=0.75, dSin0_frazil=3.0,
                hfrazilmin=ct.hfrazilmin,
                tr_brine=False, ocean_bio=None,
                initbio_frac=1.0) -> NewIce:
    """Frazil formation: convert positive freezing potential into new ice
    in category 1 (or spread over categories when open water is scarce).

    ktherm=2 frazil (ice_therm_itd.F90:1460-1492): new ice forms as mush
    at bulk salinity Si0 = sss - dSin0_frazil (quadratic taper for fresh
    water), liquid fraction phi_init, enthalpy from the mush liquidus;
    otherwise frazil is fresh latent-heat ice with the salinz profile.

    BGC/brine coupling (ice_zbgc.F90:866-1060 add_new_ice_bgc): the full
    frazil volume takes up ocean BGC tracer (dissolved tracers at
    initbio_frac, the rest fully) as a negative flux_bio; with tr_brine
    the brine volume vbrin = fbri*vicen grows with the new ice volume and
    fbri is re-derived so vbrin is conserved plus the frazil addition."""
    ncat = aicen.shape[0]
    B = aicen.shape[1:]
    # float(): numpy scalars would strongly promote f32 arrays under x64
    hi0max = float(hin_max[1]) * 0.9 if ncat > 1 else ct.bignum
    salinz = jnp.asarray(salinz, aicen.dtype)   # avoid f64 promotion

    nb = (1,) * len(B)
    if ktherm == 2:
        from cice5_tpu.models.thermo import mushy as mushy_mod
        if sss is None:
            sss = -Tf / ct.depressT
        Si0new = jnp.where(sss > 2.0 * dSin0_frazil, sss - dSin0_frazil,
                           sss ** 2 / (4.0 * dSin0_frazil))
        Ti0 = jnp.minimum(
            mushy_mod.liquidus_temperature(Si0new / phi_init), -0.1)
        qi0new = mushy_mod.enthalpy_mush(Ti0, Si0new)     # (B), < 0
        salz_hs = Si0new[None, None]          # hsurp-mix salinity profile
        salz_c1 = Si0new[None]                # cat-1-mix profile
        qi0_hs = qi0new[None, None]
        qi0_c1 = qi0new[None]
    else:
        qi0new = -ct.rhoi * ct.Lfresh
        salz_hs = salinz.reshape((1, nilyr) + nb)
        salz_c1 = salinz.reshape((nilyr,) + nb)
        qi0_hs = qi0new
        qi0_c1 = qi0new
    fnew = jnp.maximum(frzmlt, 0.0)
    vi0new = -fnew * dt / qi0new
    frazil = vi0new

    # frazil fresh/salt fluxes to the ocean (ice_therm_itd.F90:1524-1546):
    # POP-style coupling excludes frzmlt>0 fluxes unless update_ocn_f
    if update_ocn_f:
        dfresh = -ct.rhoi * vi0new / dt
        dfsalt = ct.ice_ref_salinity * 1e-3 * dfresh
    elif ktherm == 2:
        # return mushy-layer frazil-enthalpy difference to the ocean
        vi0tmp = fnew * dt / (ct.rhoi * ct.Lfresh)
        dfresh = -ct.rhoi * (vi0new - vi0tmp) / dt
        dfsalt = ct.ice_ref_salinity * 1e-3 * dfresh
    else:
        dfresh = jnp.zeros_like(vi0new)
        dfsalt = jnp.zeros_like(vi0new)

    # brine volume before any new-ice addition (add_new_ice_bgc,
    # ice_zbgc.F90:966-976: vbrin = fbri*vicen_init per category)
    if tr_brine and tr.nt_fbri >= 0:
        vbrin = trcrn[:, tr.nt_fbri] * vicen

    grow = vi0new > 0.0
    open_w = aice0 > ct.puny
    hi0new = jnp.maximum(vi0new / jnp.maximum(aice0, ct.puny), hfrazilmin)
    too_thick = (hi0new > hi0max) & (aice0 + ct.puny < 1.0)

    # case A: open water, fits in cat 1
    ai_A = vi0new / jnp.maximum(hi0new, ct.puny)
    # case B: open water but too thick: fill open water at hi0max, spread rest
    ai_B = aice0
    vi_B = ai_B * hi0max
    hsurp_B = (vi0new - vi_B) / jnp.maximum(aice, ct.puny)
    # case C: no open water: spread everything
    hsurp_C = vi0new / jnp.maximum(aice, ct.puny)

    ai0new = jnp.where(grow & open_w, jnp.where(too_thick, ai_B, ai_A), 0.0)
    vi0n = jnp.where(grow & open_w, jnp.where(too_thick, vi_B, vi0new), 0.0)
    hsurp = jnp.where(grow,
                      jnp.where(open_w, jnp.where(too_thick, hsurp_B, 0.0),
                                hsurp_C), 0.0)

    # --- distribute hsurp over all categories, area unchanged (:1612-1690)
    has_surp = hsurp > ct.puny
    vsurp = hsurp[None] * aicen                       # (ncat, *B)
    vtmp = vicen + jnp.where(has_surp[None], vsurp, 0.0)
    ratio_old = jnp.where(vtmp > 0.0, vicen / jnp.maximum(vtmp, 1e-30), 1.0)
    ratio_new = jnp.where(vtmp > 0.0, vsurp / jnp.maximum(vtmp, 1e-30), 0.0)
    q0 = tr.nt_qice
    s0 = tr.nt_sice
    # block update of all qice/sice layers at once: per-layer .at[].set
    # chains cost one full trcrn copy EACH (2*nilyr dynamic-update-slices)
    hsm = has_surp[None, None]
    ro, rn = ratio_old[:, None], ratio_new[:, None]
    qblk = trcrn[:, q0:q0 + nilyr]
    sblk = trcrn[:, s0:s0 + nilyr]
    qnew = jnp.where(hsm, qblk * ro + qi0_hs * rn, qblk)
    snew = jnp.where(hsm, sblk * ro + salz_hs * rn, sblk)
    if s0 == q0 + nilyr:
        trcrn = set_trc(trcrn, q0, jnp.concatenate([qnew, snew], axis=1))
    else:
        trcrn = set_trc(trcrn, q0, qnew)
        trcrn = set_trc(trcrn, s0, snew)
    if tr_iage:
        trcrn = set_trc(trcrn, tr.nt_iage, jnp.where(
            has_surp[None] & (vtmp > ct.puny),
            (trcrn[:, tr.nt_iage] * vicen + dt * vsurp)
            / jnp.maximum(vtmp, ct.puny), trcrn[:, tr.nt_iage]))
    if tr_lvl:
        trcrn = set_trc(trcrn, tr.nt_vlvl, jnp.where(
            has_surp[None] & (vicen > ct.puny),
            (trcrn[:, tr.nt_vlvl] * vicen + trcrn[:, tr.nt_alvl] * vsurp)
            / jnp.maximum(vtmp, ct.puny), trcrn[:, tr.nt_vlvl]))
    # ice-aerosol dilution on hsurp thickening: new frazil carries no
    # aerosol, so concentrations scale by vicen/vtmp keeping the mass
    # amount fixed (conservation completion — the reference leaves the
    # concentrations unchanged, inflating aerosol mass with the grown
    # volume; cf. ice_therm_itd.F90:1612-1690 which updates only
    # qice/sice/iage/vlvl)
    for it in range(tr.n_aero):
        i0 = tr.nt_aero + 4 * it + 2
        trcrn = set_trc(trcrn, i0, jnp.where(
            hsm, trcrn[:, i0:i0 + 2] * ro, trcrn[:, i0:i0 + 2]))
    vicen = jnp.where(has_surp[None], vtmp, vicen)

    # --- add vi0n/ai0new to category 1 (:1697-1800) ---
    add1 = vi0n > 0.0
    area1 = aicen[0]
    vice1 = vicen[0]
    a1new = jnp.where(add1, area1 + ai0new, area1)
    v1new = jnp.where(add1, vice1 + vi0n, vice1)
    aicen = set_cat(aicen, 0, a1new)
    vicen = set_cat(vicen, 0, v1new)

    def mixA(val, newval):   # area-weighted mix into cat 1
        return jnp.where(add1, (val * area1 + newval * ai0new)
                         / jnp.maximum(a1new, ct.puny), val)

    def mixV(val, newval):   # volume-weighted mix into cat 1
        return jnp.where(add1 & (v1new > ct.puny),
                         (val * vice1 + newval * vi0n)
                         / jnp.maximum(v1new, ct.puny), val)

    trcrn = set_trc_cat(trcrn, 0, tr.nt_Tsfc,
                        jnp.minimum(mixA(trcrn[0, tr.nt_Tsfc], Tf), 0.0))
    if tr_FY:
        trcrn = set_trc_cat(trcrn, 0, tr.nt_FY,
                            jnp.minimum(mixA(trcrn[0, tr.nt_FY], 1.0), 1.0))
    if tr_iage:
        trcrn = set_trc_cat(trcrn, 0, tr.nt_iage,
                            mixV(trcrn[0, tr.nt_iage], dt))
    if tr_lvl:
        trcrn = set_trc_cat(trcrn, 0, tr.nt_alvl,
                            mixA(trcrn[0, tr.nt_alvl], 1.0))
        trcrn = set_trc_cat(trcrn, 0, tr.nt_vlvl,
                            mixV(trcrn[0, tr.nt_vlvl], 1.0))
    # block mixV over all qice/sice layers of category 1 (one update)
    mixm = (add1 & (v1new > ct.puny))[None]
    v1s = jnp.maximum(v1new, ct.puny)
    qb = trcrn[0, q0:q0 + nilyr]
    sb = trcrn[0, s0:s0 + nilyr]
    qbn = jnp.where(mixm, (qb * vice1 + qi0_c1 * vi0n) / v1s, qb)
    sbn = jnp.where(mixm, (sb * vice1 + salz_c1 * vi0n) / v1s, sb)
    if s0 == q0 + nilyr:
        trcrn = set_trc_cat(trcrn, 0, q0,
                            jnp.concatenate([qbn, sbn], axis=0))
    else:
        trcrn = set_trc_cat(trcrn, 0, q0, qbn)
        trcrn = set_trc_cat(trcrn, 0, s0, sbn)
    # aerosol-free new ice: dilute cat-1 ice-aerosol concentrations so the
    # aerosol amount is unchanged by the volume growth (see hsurp note)
    for it in range(tr.n_aero):
        i0 = tr.nt_aero + 4 * it + 2
        trcrn = set_trc_cat(trcrn, 0, i0, jnp.where(
            mixm, trcrn[0, i0:i0 + 2] * vice1 / v1s, trcrn[0, i0:i0 + 2]))

    # --- add_new_ice_bgc (ice_zbgc.F90:866-1060) ---
    if tr_brine and tr.nt_fbri >= 0:
        # hsurp thickening: vbrin grows by vsurp; cat-1 frazil: by vi0n
        vbrin = jnp.where(has_surp[None], vbrin + vsurp, vbrin)
        vbrin = set_cat(vbrin, 0,
                        jnp.where(add1, vbrin[0] + vi0n, vbrin[0]))
        touched = has_surp[None] | jnp.concatenate(
            [add1[None], jnp.zeros((ncat - 1,) + B, bool)])
        fbri_new = jnp.where(vicen > 0.0,
                             vbrin / jnp.maximum(vicen, 1e-30), 1.0)
        trcrn = set_trc(trcrn, tr.nt_fbri,
                        jnp.where(touched, fbri_new, trcrn[:, tr.nt_fbri]))
    if tr.nbtrcr and ocean_bio is not None:
        # ocean loses tracer into the full frazil volume: dissolved
        # tracers at initbio_frac, particulate fully (ice_zbgc.F90:
        # 988-999; negative flux_bio = uptake from the ocean). The
        # uptaken mass U seeds the ice-side skeletal concentrations
        # (cat-1 share vi0n/vi0new area-mixed into category 1, hsurp
        # share spread over all categories) so the ice+ocean budget
        # closes exactly — a conservation completion: the reference
        # records the ocean loss but leaves the ice concentrations to
        # the next step's first-ice seeding.
        from cice5_tpu.models.tracers.brine import PHI_SK
        btype = jnp.asarray(tr.bgc_type, vi0new.dtype)
        fac = btype * initbio_frac + (1.0 - btype)     # (nbtrcr,)
        fac = fac.reshape((tr.nbtrcr,) + (1,) * len(B))
        U = jnp.where(grow, vi0new, 0.0)[None] * ocean_bio * fac
        flux_bio = -U / dt
        vi0_safe = jnp.maximum(vi0new, ct.puny)
        for k, slot in enumerate(tr.nt_bgc):
            ck = trcrn[:, slot]
            # hsurp thickening: area unchanged, conc gains the per-area
            # share of U assigned to the thickened volume
            gain_h = jnp.where(has_surp,
                               U[k] * hsurp / (vi0_safe * PHI_SK), 0.0)
            cn = jnp.where(has_surp[None] & (aicen > ct.puny),
                           ck + gain_h[None], ck)
            # cat-1 frazil: mass-weighted mix over the grown area
            u1 = jnp.where(add1, U[k] * vi0n / vi0_safe, 0.0)
            c1 = jnp.where(add1,
                           (cn[0] * area1 + u1 / PHI_SK)
                           / jnp.maximum(a1new, ct.puny), cn[0])
            trcrn = set_trc(trcrn, slot, set_cat(cn, 0, c1))
    else:
        flux_bio = jnp.zeros((tr.nbtrcr,) + B, aicen.dtype)

    return NewIce(aicen=aicen, vicen=vicen, trcrn=trcrn, frazil=frazil,
                  dfresh=dfresh, dfsalt=dfsalt, flux_bio=flux_bio)


# ----------------------------------------------------------------------
# zap + cleanup (ice_itd.F90:1514-2270)
# ----------------------------------------------------------------------

class Cleanup(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    trcrn: jnp.ndarray
    dfresh: jnp.ndarray
    dfsalt: jnp.ndarray
    dfhocn: jnp.ndarray
    dfpond: jnp.ndarray      # topo-pond water removed (m)
    dfaero: jnp.ndarray      # (n_aero, *B) aerosol flux to ocean (kg/m^2/s)
    dflux_bio: jnp.ndarray   # (nbtrcr, *B) BGC flux to ocean (mmol/m^2/s)
    zapped: jnp.ndarray      # (ncat, *B) bool: category fully zapped
                             # (sets first_ice, ice_itd.F90:2013-2017)


def zap_small_areas(dt, tr: TracerRegistry, nilyr, nslyr, *, aicen, vicen,
                    vsnon, trcrn, tr_pond_topo=False) -> Cleanup:
    """Zap categories with 0 < aicen <= puny, returning melt water/salt/heat
    to the ocean (ice_itd.F90:1778-2166), and renormalize aice > 1.

    Conservation bookkeeping beyond water/salt/heat: zapped topo-pond
    water leaves the fpond accumulator (ice_itd.F90:1905-1913), zapped
    snow+ice aerosol mass goes to faero_ocn (:1918-1927 + zap_snow
    :2221-2236), and zapped skeletal-BGC amount goes to flux_bio (a
    conservation completion: 5.1.2 passes flux_bio into the zap but
    never updates it, silently destroying the bio mass)."""
    zap = (jnp.abs(aicen) <= ct.puny) & (jnp.abs(aicen) != 0.0)
    qice = trcrn[:, tr.nt_qice:tr.nt_qice + nilyr]
    qsno = trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr]

    dfhocn = jnp.sum(jnp.where(zap[:, None],
                               qice * vicen[:, None] / nilyr, 0.0),
                     axis=(0, 1)) / dt
    dfhocn = dfhocn + jnp.sum(jnp.where(zap[:, None],
                                        qsno * vsnon[:, None] / nslyr, 0.0),
                              axis=(0, 1)) / dt
    dfresh = jnp.sum(jnp.where(zap, ct.rhoi * vicen + ct.rhos * vsnon, 0.0),
                     axis=0) / dt
    dfsalt = jnp.sum(jnp.where(zap, ct.rhoi * vicen, 0.0), axis=0) \
        * ct.ice_ref_salinity * 0.001 / dt
    dfpond = jnp.sum(jnp.where(
        zap, _pond_volume_per_cat(tr, aicen, trcrn, tr_pond_topo), 0.0),
        axis=0)
    dfaero = jnp.sum(jnp.where(
        zap[None], _aero_mass_per_cat(tr, vicen, vsnon, trcrn), 0.0),
        axis=1) / dt
    dflux_bio = jnp.sum(jnp.where(
        zap[None], _bgc_mass_per_cat(tr, aicen, trcrn), 0.0), axis=1) / dt

    aicen = jnp.where(zap, 0.0, aicen)
    vicen = jnp.where(zap, 0.0, vicen)
    vsnon = jnp.where(zap, 0.0, vsnon)
    # reset tracers of zapped categories
    tvals = []
    for it in range(tr.ntrcr):
        if it == tr.nt_Tsfc:
            tvals.append(jnp.where(zap, ct.Tocnfrz, trcrn[:, it]))
        elif it == tr.nt_fbri:
            tvals.append(jnp.where(zap, 1.0, trcrn[:, it]))
        else:
            tvals.append(jnp.where(zap, 0.0, trcrn[:, it]))
    trcrn = jnp.stack(tvals, axis=1)

    # renormalize aice in (1, 1+puny] (ice_itd.F90:2028-2160: state scales
    # by 1/aice, tracers unchanged, the scaled-away fraction's water/salt/
    # heat/pond/aerosol/BGC load goes to the ocean)
    aice = jnp.sum(aicen, axis=0)
    over = aice > 1.0
    scale = jnp.where(over, 1.0 / jnp.maximum(aice, 1.0), 1.0)
    excess = (1.0 - scale)   # == (aice-1)/aice where over, else 0
    dfresh = dfresh + jnp.sum(
        (ct.rhoi * vicen + ct.rhos * vsnon) * excess[None],
        axis=0) / dt
    dfsalt = dfsalt + jnp.sum(ct.rhoi * vicen * excess[None],
                              axis=0) * ct.ice_ref_salinity * 0.001 / dt
    dfhocn = dfhocn + (jnp.sum(jnp.sum(qice, axis=1) * vicen / nilyr, axis=0)
                       + jnp.sum(jnp.sum(qsno, axis=1) * vsnon / nslyr,
                                 axis=0)) * excess / dt
    dfpond = dfpond + jnp.sum(
        _pond_volume_per_cat(tr, aicen, trcrn, tr_pond_topo)
        * excess[None], axis=0)
    dfaero = dfaero + jnp.sum(
        _aero_mass_per_cat(tr, vicen, vsnon, trcrn)
        * excess[None, None], axis=1) / dt
    dflux_bio = dflux_bio + jnp.sum(
        _bgc_mass_per_cat(tr, aicen, trcrn) * excess[None, None],
        axis=1) / dt
    aicen = aicen * scale[None]
    vicen = vicen * scale[None]
    vsnon = vsnon * scale[None]

    return Cleanup(aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                   dfresh=dfresh, dfsalt=dfsalt, dfhocn=dfhocn,
                   dfpond=dfpond, dfaero=dfaero, dflux_bio=dflux_bio,
                   zapped=zap)


def zap_snow_temperature(dt, tr: TracerRegistry, nslyr, *, aicen, vsnon,
                         trcrn):
    """Remove snow whose diagnosed temperature is out of bounds
    (ice_itd.F90:2274-2420): Tmin = -100 C; Tmax from the roundoff bound
    -zqsn*puny*nslyr/(rhos*cp_ice*vsnon). Zapped snow mass/energy go to the
    ocean, and its aerosol load to faero_ocn (zap_snow, ice_itd.F90:
    2221-2236). Returns (vsnon, trcrn, dfresh, dfhocn, dfaero)."""
    TMIN = -100.0
    hsn = jnp.where(aicen > ct.puny,
                    vsnon / jnp.maximum(aicen, ct.puny), 0.0)
    qsno = trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr]     # (ncat,nslyr,...)
    thick = (hsn > ct.hs_min)[:, None]
    zqsn = jnp.where(thick, qsno, -ct.rhos * ct.Lfresh)
    Tmax = jnp.where(thick,
                     -zqsn * ct.puny * nslyr
                     / (ct.rhos * ct.cp_ice
                        * jnp.maximum(vsnon, ct.puny)[:, None]),
                     ct.puny)
    zTsn = (ct.Lfresh + zqsn / ct.rhos) / ct.cp_ice
    bad = jnp.any((zTsn < TMIN) | (zTsn > Tmax), axis=1) \
        & (aicen > ct.puny)
    dfresh = jnp.sum(jnp.where(bad, ct.rhos * vsnon / dt, 0.0), axis=0)
    dfhocn = jnp.sum(jnp.where(bad[:, None], qsno * vsnon[:, None] / nslyr,
                               0.0), axis=(0, 1)) / dt
    dfaero = jnp.sum(jnp.where(
        bad[None],
        _aero_mass_per_cat(tr, vsnon, vsnon, trcrn, ice=False), 0.0),
        axis=1) / dt
    vsnon = jnp.where(bad, 0.0, vsnon)
    trcrn = set_trc(trcrn, tr.nt_qsno,
                    jnp.where(bad[:, None], -ct.rhos * ct.Lfresh, qsno))
    # zero the weightless snow-aerosol concentrations so later snowfall
    # cannot resurrect the zapped mass
    for it in range(tr.n_aero):
        s0 = tr.nt_aero + 4 * it
        trcrn = set_trc(trcrn, s0,
                        jnp.where(bad[:, None], 0.0, trcrn[:, s0:s0 + 2]))
    return vsnon, trcrn, dfresh, dfhocn, dfaero


def cleanup_itd(dt, tr: TracerRegistry, hin_max, nilyr, nslyr, *, aicen,
                vicen, vsnon, trcrn, tr_pond_topo=False) -> Cleanup:
    """rebin + snow-temperature zap + small-area zap
    (ice_itd.F90:1514-1769 cleanup_itd).

    Ordering note: the reference zaps small areas BEFORE the snow-
    temperature zap; here small-area zap runs last so its aice>1
    renormalization sees the final volumes — the two zaps touch disjoint
    cells (aicen<=puny vs aicen>puny) so the order only matters for the
    renorm, where last is strictly more conservative."""
    aicen, vicen, vsnon, trcrn = rebin(tr, hin_max, aicen, vicen, vsnon,
                                       trcrn)
    vsnon, trcrn, dfresh_s, dfhocn_s, dfaero_s = zap_snow_temperature(
        dt, tr, nslyr, aicen=aicen, vsnon=vsnon, trcrn=trcrn)
    out = zap_small_areas(dt, tr, nilyr, nslyr, aicen=aicen, vicen=vicen,
                          vsnon=vsnon, trcrn=trcrn,
                          tr_pond_topo=tr_pond_topo)
    return out._replace(dfresh=out.dfresh + dfresh_s,
                        dfhocn=out.dfhocn + dfhocn_s,
                        dfaero=out.dfaero + dfaero_s)
