"""Runtime diagnostics: global conservation budgets.

Equivalent of /root/reference/source/ice_diagnostics.F90 runtime_diags (:103)
+ total_energy/total_salt (:1038/:1124): hemispheric area/extent/volume/
energy sums and step-to-step heat/water/salt budget closure, printed every
diagfreq steps. Reductions are deterministic jnp sums (the bfbflag concern of
mpi/ice_global_reductions.F90:142-267 vanishes on a fixed mesh).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cice5_tpu import constants as ct
from cice5_tpu.parallel.distributed import to_host as _g


class GlobalDiags(NamedTuple):
    arean: jnp.ndarray     # total ice area N hemisphere (m^2)
    areas: jnp.ndarray
    extentn: jnp.ndarray   # area where aice > 0.15
    extents: jnp.ndarray
    volumen: jnp.ndarray   # ice volume (m^3)
    volumes: jnp.ndarray
    snwvlmn: jnp.ndarray
    snwvlms: jnp.ndarray
    etotn: jnp.ndarray     # total ice+snow energy (J)
    etots: jnp.ndarray
    salt: jnp.ndarray      # total salt content (kg)
    umax: jnp.ndarray      # max ice speed (m/s)
    amax: jnp.ndarray


def compute_diags(state, grid, tr, nilyr, nslyr) -> GlobalDiags:
    aice = jnp.sum(state.aicen, axis=0)
    vice = jnp.sum(state.vicen, axis=0)
    vsno = jnp.sum(state.vsnon, axis=0)

    qice = state.trcrn[:, tr.nt_qice:tr.nt_qice + nilyr]
    qsno = state.trcrn[:, tr.nt_qsno:tr.nt_qsno + nslyr]
    sice = state.trcrn[:, tr.nt_sice:tr.nt_sice + nilyr]
    eice = jnp.sum(jnp.sum(qice, axis=1) * state.vicen / nilyr, axis=0)
    esno = jnp.sum(jnp.sum(qsno, axis=1) * state.vsnon / nslyr, axis=0)
    salt = jnp.sum(jnp.sum(sice, axis=1) * state.vicen / nilyr, axis=0) \
        * ct.rhoi * 0.001

    an, as_ = grid.tarean, grid.tareas
    ext = (aice > 0.15).astype(aice.dtype)
    speed = jnp.sqrt(state.uvel ** 2 + state.vvel ** 2)
    return GlobalDiags(
        arean=jnp.sum(aice * an), areas=jnp.sum(aice * as_),
        extentn=jnp.sum(ext * an), extents=jnp.sum(ext * as_),
        volumen=jnp.sum(vice * an), volumes=jnp.sum(vice * as_),
        snwvlmn=jnp.sum(vsno * an), snwvlms=jnp.sum(vsno * as_),
        etotn=jnp.sum((eice + esno) * an),
        etots=jnp.sum((eice + esno) * as_),
        salt=jnp.sum(salt * (an + as_)),
        umax=jnp.max(speed), amax=jnp.max(aice))


def format_diags(istep: int, d: GlobalDiags) -> str:
    """Text block in the spirit of runtime_diags' log output."""
    g = lambda x: float(x)
    return (
        f"istep {istep:8d} "
        f"| area N/S {g(d.arean):.4e}/{g(d.areas):.4e} m^2 "
        f"| extent N/S {g(d.extentn):.4e}/{g(d.extents):.4e} m^2 "
        f"| volume N/S {g(d.volumen):.4e}/{g(d.volumes):.4e} m^3 "
        f"| snow N/S {g(d.snwvlmn):.3e}/{g(d.snwvlms):.3e} "
        f"| energy {g(d.etotn) + g(d.etots):.6e} J "
        f"| salt {g(d.salt):.4e} kg "
        f"| max|u| {g(d.umax):.3f} m/s | max aice {g(d.amax):.3f}")


def print_state(state, grid, tr, nilyr, nslyr, j: int, i: int,
                label: str = "") -> str:
    """Full column dump at one grid point (print_state,
    ice_diagnostics.F90:1331 — the point-debug hook)."""
    lines = [f"--- print_state {label} at (j={j}, i={i}) "
             f"lat={float(grid.TLAT[j, i]) * 57.29578:.2f} "
             f"lon={float(grid.TLON[j, i]) * 57.29578:.2f} ---"]
    for n in range(state.aicen.shape[0]):
        a = float(state.aicen[n, j, i])
        v = float(state.vicen[n, j, i])
        s = float(state.vsnon[n, j, i])
        t = float(state.trcrn[n, tr.nt_Tsfc, j, i])
        lines.append(f"cat {n}: aicen {a:.5f} vicen {v:.5f} vsnon {s:.5f} "
                     f"Tsfc {t:.3f}")
        qi = [float(state.trcrn[n, tr.nt_qice + k, j, i])
              for k in range(nilyr)]
        lines.append("   qice: " + " ".join(f"{q:.3e}" for q in qi))
    lines.append(f"uvel {float(state.uvel[j, i]):.4f} "
                 f"vvel {float(state.vvel[j, i]):.4f} "
                 f"sst {float(state.sst[j, i]):.3f}")
    return "\n".join(lines)


def check_state(state, grid, tr, nilyr, nslyr, istep=None, log=print):
    """Failure detection (the debug_ice / print_points_state hook,
    ice_diagnostics.F90:1331-1601 + drivers/cice/CICE.F90:76): scan the
    state for NaN/Inf or physically impossible values; on failure print the
    full column state of the worst cell and return False.

    Host-side (call between steps, on gathered arrays)."""
    import numpy as np
    checks = [
        ("aicen", _g(state.aicen), -1e-6, 1.0 + 1e-6),
        ("vicen", _g(state.vicen), -1e-6, 100.0),
        ("vsnon", _g(state.vsnon), -1e-6, 50.0),
        ("uvel", _g(state.uvel), -5.0, 5.0),
        ("vvel", _g(state.vvel), -5.0, 5.0),
        ("Tsfc", _g(state.trcrn[:, tr.nt_Tsfc]), -100.0, 1e-6),
    ]
    for name, arr, lo, hi in checks:
        bad = ~np.isfinite(arr) | (arr < lo) | (arr > hi)
        if bad.any():
            idx = np.argwhere(bad)[0]
            j, i = int(idx[-2]), int(idx[-1])
            pre = f"istep {istep}: " if istep is not None else ""
            log(f"{pre}check_state FAILED: {name}"
                f"[{','.join(map(str, idx))}] = {arr[tuple(idx)]}"
                f" outside [{lo}, {hi}]")
            log(print_state(state, grid, tr, nilyr, nslyr, j, i,
                            label=f"bad cell ({j},{i})"))
            return False
    return True


def nearest_point(grid, lat_deg: float, lon_deg: float):
    """(j, i) of the ocean T-cell nearest a (lat, lon) in degrees — the
    latpnt/lonpnt diagnostic-point lookup (init_diags,
    ice_diagnostics.F90:931-1020 region)."""
    import numpy as np
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg) % (2.0 * np.pi)
    TLAT = np.asarray(grid.TLAT)
    TLON = np.asarray(grid.TLON) % (2.0 * np.pi)
    dlon = np.abs(TLON - lon)
    dlon = np.minimum(dlon, 2.0 * np.pi - dlon)
    # chord distance on the sphere, land masked out
    d2 = (TLAT - lat) ** 2 + (np.cos(lat) * dlon) ** 2
    d2 = np.where(np.asarray(grid.hm) > 0.5, d2, np.inf)
    j, i = np.unravel_index(int(np.argmin(d2)), d2.shape)
    return int(j), int(i)


def print_points_state(state, grid, tr, nilyr, nslyr, latpnts, lonpnts,
                       label: str = "") -> str:
    """Column dumps at the diagnostic points nearest each (lat, lon) pair
    (print_points_state, ice_diagnostics.F90:1466)."""
    blocks = []
    for lat, lon in zip(latpnts, lonpnts):
        j, i = nearest_point(grid, lat, lon)
        blocks.append(print_state(state, grid, tr, nilyr, nslyr, j, i,
                                  label=f"{label} pnt({lat},{lon})"))
    return "\n".join(blocks)


def hbrine_diags(state, grid, tr, nilyr, latpnts, lonpnts,
                 darcy_V=None) -> str:
    """Dynamic-brine-height point diagnostics (hbrine_diags,
    ice_brine.F90:730-828): cell-mean fbri, category-1 and cell-mean brine
    fraction hbri/hice, Darcy velocity, and the salinity profile at each
    diagnostic point."""
    import numpy as np
    if tr.nt_fbri < 0:
        return "hbrine_diags: brine-height tracer inactive"
    aicen = np.asarray(_g(state.aicen))
    vicen = np.asarray(_g(state.vicen))
    trcrn = np.asarray(_g(state.trcrn))
    dv = None if darcy_V is None else np.asarray(_g(darcy_V))
    lines = []
    for lat, lon in zip(latpnts, lonpnts):
        j, i = nearest_point(grid, lat, lon)
        a = aicen[:, j, i]
        v = vicen[:, j, i]
        fbri = trcrn[:, tr.nt_fbri, j, i]
        vice = v.sum()
        # hbrine/hice ratios (reference phinS/phinS1)
        phinS = (fbri * v).sum() / vice if vice > 0 else 0.0
        phinS1 = fbri[0] if a[0] > 0 else 0.0
        sin = trcrn[:, tr.nt_sice:tr.nt_sice + nilyr, j, i]
        smean = (sin * v[:, None]).sum(0) / vice if vice > 0 else sin[0] * 0
        lines.append(
            f"hbrine pnt({lat},{lon}) (j,i)=({j},{i}): "
            f"hbri/hi cell {phinS:.4f} cat1 {phinS1:.4f}"
            + (f" darcy_V {dv[j, i]:.3e} m/s" if dv is not None else "")
            + " | Sin " + " ".join(f"{s:.3f}" for s in smean))
    return "\n".join(lines)


def bgc_diags(state, grid, tr, latpnts, lonpnts, ocean_bio=None,
              flux_bio=None) -> str:
    """Skeletal-BGC point diagnostics (bgc_diags, ice_algae.F90:937-1132):
    per-tracer skeletal concentration and (when given) ocean concentration
    and ice-ocean flux at each diagnostic point."""
    import numpy as np
    if not tr.nt_bgc:
        return "bgc_diags: skeletal BGC inactive"
    aicen = np.asarray(_g(state.aicen))
    trcrn = np.asarray(_g(state.trcrn))
    lines = []
    for lat, lon in zip(latpnts, lonpnts):
        j, i = nearest_point(grid, lat, lon)
        a = aicen[:, j, i]
        asum = max(a.sum(), 1e-30)
        parts = []
        for name, slot in zip(tr.bgc_names, tr.nt_bgc):
            conc = (trcrn[:, slot, j, i] * a).sum() / asum
            s = f"{name} {conc:.4e}"
            if ocean_bio is not None:
                s += f"/{np.asarray(_g(ocean_bio[name]))[j, i]:.4e}"
            if flux_bio is not None:
                s += f" flux {np.asarray(_g(flux_bio[name]))[j, i]:.3e}"
            parts.append(s)
        lines.append(f"bgc pnt({lat},{lon}) (j,i)=({j},{i}): "
                     + " | ".join(parts))
    return "\n".join(lines)
