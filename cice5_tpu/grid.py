"""Model grid: metrics, masks, staggering.

TPU-native redesign of /root/reference/source/ice_grid.F90. The reference
builds per-block (nx_block, ny_block, max_blocks) metric arrays with ghost
rings; here the grid is one pytree of dense global ``(ny, nx)`` arrays (axis 0
= j/latitude rows, axis 1 = i/longitude columns — trailing axes map to TPU
sublane/lane tiles). Ghost cells are not stored: stencil operators extend
fields on the fly via the halo module (single-device: pad/roll; multi-device:
ppermute inside shard_map).

B-grid staggering follows the reference exactly (ice_grid.F90:340-370,
1408-1533): the U point (i, j) is the NE corner of T cell (i, j); HTN(i, j) is
the length of the T cell's north edge, HTE(i, j) its east edge, and

    dxu(i,j) = 1/2 (HTN(i,j) + HTN(i+1,j))     dxt(i,j) = 1/2 (HTN(i,j) + HTN(i,j-1))
    dyu(i,j) = 1/2 (HTE(i,j) + HTE(i,j+1))     dyt(i,j) = 1/2 (HTE(i,j) + HTE(i-1,j))
    dxhy = 1/2 (HTE(i,j) - HTE(i-1,j))         dyhx = 1/2 (HTN(i,j) - HTN(i,j-1))
    cyp  = 1.5 HTE(i,j) - 0.5 HTE(i-1,j)       cxp  = 1.5 HTN(i,j) - 0.5 HTN(i,j-1)
    cym  = -(1.5 HTE(i-1,j) - 0.5 HTE(i,j))    cxm  = -(1.5 HTN(i,j-1) - 0.5 HTN(i,j))

Grid construction runs once on host in float64 numpy (cheap, off the hot
path), then casts to the model dtype.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cice5_tpu.config import GridConfig, ModelConfig
from cice5_tpu.utils import pytree_dataclass
from cice5_tpu import constants as ct


@pytree_dataclass
class Grid:
    """Grid metric/mask pytree (all (ny, nx), model dtype unless noted)."""
    ULAT: jnp.ndarray      # U-point latitude (radians)
    ULON: jnp.ndarray
    TLAT: jnp.ndarray      # T-point latitude (radians)
    TLON: jnp.ndarray
    HTN: jnp.ndarray       # T-cell north edge length (m)
    HTE: jnp.ndarray       # T-cell east edge length (m)
    dxt: jnp.ndarray
    dyt: jnp.ndarray
    dxu: jnp.ndarray
    dyu: jnp.ndarray
    tarea: jnp.ndarray
    uarea: jnp.ndarray
    tarear: jnp.ndarray
    uarear: jnp.ndarray
    tinyarea: jnp.ndarray
    dxhy: jnp.ndarray
    dyhx: jnp.ndarray
    cxp: jnp.ndarray
    cyp: jnp.ndarray
    cxm: jnp.ndarray
    cym: jnp.ndarray
    ANGLE: jnp.ndarray     # U-point rotation to geographic (radians)
    ANGLET: jnp.ndarray    # T-point rotation
    hm: jnp.ndarray        # T-cell ocean mask (1=ocean, 0=land), float
    uvm: jnp.ndarray       # U-cell ocean mask, float
    tmask: jnp.ndarray     # bool
    umask: jnp.ndarray     # bool
    tarean: jnp.ndarray    # N-hemisphere masked T area (m^2)
    tareas: jnp.ndarray    # S-hemisphere masked T area
    fcor: jnp.ndarray      # Coriolis parameter at U points (1/s)

    @property
    def shape(self):
        return self.hm.shape


def _shift(a: np.ndarray, di: int, dj: int, cyclic_x: bool,
           edge: str = "replicate") -> np.ndarray:
    """a[j + dj, i + di] with edge replication (or linear extrapolation,
    the ice_HaloExtrapolate semantics) in y and (optionally) cyclic x."""
    out = np.roll(a, (-dj, -di), axis=(0, 1))
    ex = edge == "extrapolate"
    if dj > 0:
        out[-dj:, :] = (2.0 * a[-1:, :] - a[-2:-1, :]) if ex else a[-1:, :]
    elif dj < 0:
        out[:-dj, :] = (2.0 * a[:1, :] - a[1:2, :]) if ex else a[:1, :]
    if not cyclic_x:
        if di > 0:
            out[:, -di:] = (2.0 * a[:, -1:] - a[:, -2:-1]) if ex \
                else a[:, -1:]
        elif di < 0:
            out[:, :-di] = (2.0 * a[:, :1] - a[:, 1:2]) if ex else a[:, :1]
    return out


def _tlatlon(ulat: np.ndarray, ulon: np.ndarray, cyclic_x: bool):
    """T-point lat/lon as the Cartesian mean of the 4 surrounding U corners
    (ice_grid.F90 Tlatlon). Edge ghosts use the linear extrapolation the
    reference applies to ULAT/ULON before Tlatlon (ice_HaloExtrapolate,
    ice_grid.F90:780-816)."""
    z = np.sin(ulat)
    x = np.cos(ulon) * np.cos(ulat)
    y = np.sin(ulon) * np.cos(ulat)

    def corner_avg(q):
        return 0.25 * (q + _shift(q, -1, 0, cyclic_x, "extrapolate")
                       + _shift(q, 0, -1, cyclic_x, "extrapolate")
                       + _shift(q, -1, -1, cyclic_x, "extrapolate"))

    tx, ty, tz = corner_avg(x), corner_avg(y), corner_avg(z)
    da = np.sqrt(tx * tx + ty * ty + tz * tz)
    tz = np.where(da > 0, tz / np.maximum(da, 1e-300), 0.0)
    tlat = np.arcsin(np.clip(tz, -1.0, 1.0))
    tlon = np.arctan2(ty, tx)
    return tlat, tlon


def _finish_grid(gcfg: GridConfig, ulat, ulon, htn, hte, angle, hm,
                 dtype) -> Grid:
    """Derive all secondary metrics from (ULAT, ULON, HTN, HTE, ANGLE, hm)."""
    cyc = gcfg.ew_boundary == "cyclic"
    sh = lambda a, di, dj: _shift(a, di, dj, cyc)

    # primary_grid_lengths_HTN/HTE (ice_grid.F90:1409-1545): cyclic-x wrap for
    # dxu/dyt; dxt extrapolated along the south row and dyu along the north row
    dxu = 0.5 * (htn + sh(htn, 1, 0))
    dxt = 0.5 * (htn + sh(htn, 0, -1))
    dxt[0, :] = 2.0 * htn[1, :] - htn[2, :]          # j=1 extrap (:1462)
    dyu = 0.5 * (hte + sh(hte, 0, 1))
    dyu[-1, :] = 2.0 * hte[-2, :] - hte[-3, :]       # j=ny extrap (:1517)
    dyt = 0.5 * (hte + sh(hte, -1, 0))
    if not cyc:
        dyt[:, 0] = 0.5 * (hte[:, 0] + (2.0 * hte[:, 1] - hte[:, 2]))

    tarea = dxt * dyt
    uarea = dxu * dyu
    tarear = np.where(tarea > 0, 1.0 / np.maximum(tarea, 1e-300), 0.0)
    uarear = np.where(uarea > 0, 1.0 / np.maximum(uarea, 1e-300), 0.0)
    tinyarea = ct.puny * tarea

    dxhy = 0.5 * (hte - sh(hte, -1, 0))
    dyhx = 0.5 * (htn - sh(htn, 0, -1))
    cyp = 1.5 * hte - 0.5 * sh(hte, -1, 0)
    cxp = 1.5 * htn - 0.5 * sh(htn, 0, -1)
    cym = -(1.5 * sh(hte, -1, 0) - 0.5 * hte)
    cxm = -(1.5 * sh(htn, 0, -1) - 0.5 * htn)

    # U mask from the 4 surrounding T cells (ice_grid.F90:1589-1592).
    # Tripole north seam: the row-above ghost is the FOLD image
    # hm(nx-1-i, ny-1) (U-fold center mapping, mpi/ice_boundary.F90:1494;
    # the reference's makemask runs after bound() fills tripole ghosts).
    # With a replicate ghost the top-row umask violates the fold
    # self-conjugacy umask(i) == umask(nx-2-i) wherever land meets the
    # seam, which makes the seam ill-posed: the per-subcycle EVP re-
    # symmetrizes the seam row every exchange and hides it, while the
    # chunked (margin-decay) EVP evolves the inconsistency — they then
    # disagree at the seam next to land.
    hm_n = sh(hm, 0, 1)
    hm_ne = sh(hm, 1, 1)
    if gcfg.ns_boundary == "tripole":
        fold = hm[-1, ::-1]                     # ghost(i) = hm(nx-1-i)
        hm_n = hm_n.copy()
        hm_ne = hm_ne.copy()
        hm_n[-1, :] = fold
        hm_ne[-1, :] = np.roll(fold, -1)        # ghost(i+1)
    uvm = np.minimum.reduce([hm, sh(hm, 1, 0), hm_n, hm_ne])
    tmask = hm > 0.5
    umask = uvm > 0.5

    # ANGLET: 4-corner average of ANGLE with branch-cut handling
    # (ice_grid.F90:440-460); rectgrid has ANGLE=0 so this is exact there too.
    a0 = angle
    aw = sh(angle, -1, 0)
    as_ = sh(angle, 0, -1)
    asw = sh(angle, -1, -1)
    neg = a0 < 0.0
    fix = lambda q: np.where(neg & (np.abs(q - a0) > np.pi), q - 2 * np.pi, q)
    anglet = 0.25 * (a0 + fix(aw) + fix(as_) + fix(asw))

    tlat, tlon = _tlatlon(ulat, ulon, cyc)

    lmask_n = ulat >= -ct.puny
    tarean = np.where(lmask_n, tarea * hm, 0.0)
    tareas = np.where(~lmask_n, tarea * hm, 0.0)
    fcor = 2.0 * ct.omega * np.sin(ulat)

    cast = lambda a: jnp.asarray(a, dtype)
    return Grid(
        ULAT=cast(ulat), ULON=cast(ulon), TLAT=cast(tlat), TLON=cast(tlon),
        HTN=cast(htn), HTE=cast(hte), dxt=cast(dxt), dyt=cast(dyt),
        dxu=cast(dxu), dyu=cast(dyu), tarea=cast(tarea), uarea=cast(uarea),
        tarear=cast(tarear), uarear=cast(uarear), tinyarea=cast(tinyarea),
        dxhy=cast(dxhy), dyhx=cast(dyhx), cxp=cast(cxp), cyp=cast(cyp),
        cxm=cast(cxm), cym=cast(cym), ANGLE=cast(angle), ANGLET=cast(anglet),
        hm=cast(hm), uvm=cast(uvm),
        tmask=jnp.asarray(tmask), umask=jnp.asarray(umask),
        tarean=cast(tarean), tareas=cast(tareas), fcor=cast(fcor),
    )


def rectgrid(cfg: ModelConfig, land_mask: np.ndarray | None = None) -> Grid:
    """Regular rectangular grid (ice_grid.F90:1145-1303 rectgrid).

    Default land mask follows the reference: for cyclic-EW the top/bottom two
    rows are land and the rest ocean; ``land_mask`` (1=ocean) overrides.
    """
    g = cfg.grid
    ny, nx = g.ny, g.nx
    dlon = g.dx_const / ct.radius * ct.rad_to_deg
    dlat = g.dy_const / ct.radius * ct.rad_to_deg
    ulon = (g.lon0 + dlon * np.arange(nx))[None, :] * np.ones((ny, 1))
    ulat = (g.lat0 + dlat * np.arange(ny))[:, None] * np.ones((1, nx))
    # large test domains from the Barrow origin would march past the pole;
    # clamp (ULAT only feeds fcor, hemisphere masks, and coszen — the metric
    # arrays are constant on rectgrid)
    ulat = np.minimum(ulat, 89.99)
    ulon = np.deg2rad(ulon)
    ulat = np.deg2rad(ulat)

    htn = np.full((ny, nx), g.dx_const)
    hte = np.full((ny, nx), g.dy_const)
    angle = np.zeros((ny, nx))

    if land_mask is None:
        hm = np.zeros((ny, nx))
        if g.grid_type == "column":
            hm[:, :] = 1.0   # all ocean for single-column testing
        elif g.ew_boundary == "cyclic":
            hm[2:ny - 2, :] = 1.0
        else:
            hm[2:ny - 2, 2:nx - 2] = 1.0
    else:
        hm = np.asarray(land_mask, np.float64)

    return _finish_grid(g, ulat, ulon, htn, hte, angle, hm, cfg.xp_dtype)


def popgrid_np(cfg: ModelConfig, ulat, ulon, htn, hte, angle, kmt) -> Grid:
    """Build a Grid from POP-style global arrays already loaded to host
    (the reader equivalent of ice_grid.F90:543-874 popgrid/popgrid_nc:
    ULAT/ULON in radians, HTN/HTE in meters, ANGLE in radians, KMT levels)."""
    hm = (np.asarray(kmt) >= 1).astype(np.float64)
    # reference clamps file ANGLE into [-pi, pi] (ice_grid.F90:797-798)
    angle = np.clip(np.asarray(angle, np.float64), -np.pi, np.pi)
    return _finish_grid(cfg.grid, np.asarray(ulat), np.asarray(ulon),
                        np.asarray(htn), np.asarray(hte), angle,
                        hm, cfg.xp_dtype)


def popgrid(cfg: ModelConfig) -> Grid:
    """Read + build a POP displaced-pole/tripole grid from the files named in
    cfg.grid (ice_grid.F90:543 popgrid, :659 popgrid_nc)."""
    from cice5_tpu.io import readers
    g = cfg.grid
    if not g.grid_file or not g.kmt_file:
        raise ValueError(
            f"grid_type={g.grid_type!r} needs grid_file/kmt_file in GridConfig")
    if g.grid_format == "nc":
        data = readers.read_pop_grid_nc(g.grid_file, g.kmt_file)
    else:
        data = readers.read_pop_grid_binary(g.grid_file, g.kmt_file,
                                            g.nx, g.ny)
    got = data["ULAT"].shape
    if got != (g.ny, g.nx):
        raise ValueError(f"grid file {g.grid_file} is {got[::-1]} (nx, ny) "
                         f"but config says ({g.nx}, {g.ny})")
    return popgrid_np(cfg, data["ULAT"], data["ULON"], data["HTN"],
                      data["HTE"], data["ANGLE"], data["kmt"])


SENTINEL = 1.0e36      # latlongrid metric sentinel (ice_grid.F90:1118-1131)


def latlongrid(cfg: ModelConfig, tlat_deg, tlon_deg, tarea_rad2,
               mask) -> Grid:
    """CESM/CAM latitude-longitude grid for thermodynamics-only runs
    (ice_grid.F90:876-1141 latlongrid): TLON/TLAT + cell areas from a CESM
    domain file; the U grid is unused (metrics are 1e36 sentinels, so
    dynamics MUST be off — kdyn=0), ULAT is TLAT shifted by half a row so
    default initialization finds ice.
    """
    ny, nx = np.asarray(tlat_deg).shape
    dtype = cfg.xp_dtype
    tlat = np.deg2rad(np.asarray(tlat_deg, np.float64))
    tlon = np.deg2rad(np.asarray(tlon_deg, np.float64))
    tarea = np.asarray(tarea_rad2, np.float64) * ct.radius ** 2
    hm = (np.asarray(mask) >= 0.5).astype(np.float64)

    sh = lambda a, di, dj: _shift(a, di, dj, False)
    if ny == 1:
        uarea = tarea.copy()
        ulat = tlat.copy()
    else:
        uarea = 0.25 * (tarea + sh(tarea, 1, 0) + sh(tarea, 0, 1)
                        + sh(tarea, 1, 1))
        ulat = tlat + np.pi / ny
    uvm = np.minimum.reduce([hm, sh(hm, 1, 0), sh(hm, 0, 1), sh(hm, 1, 1)])
    z = np.zeros((ny, nx))
    big = np.full((ny, nx), SENTINEL)
    cast = lambda a: jnp.asarray(a, dtype)
    lmask_n = ulat >= -ct.puny
    return Grid(
        ULAT=cast(ulat), ULON=cast(z), TLAT=cast(tlat), TLON=cast(tlon),
        HTN=cast(big), HTE=cast(big), dxt=cast(big), dyt=cast(big),
        dxu=cast(big), dyu=cast(big), tarea=cast(tarea), uarea=cast(uarea),
        tarear=cast(1.0 / tarea), uarear=cast(1.0 / uarea),
        tinyarea=cast(ct.puny * tarea),
        dxhy=cast(big), dyhx=cast(big), cxp=cast(big), cyp=cast(big),
        cxm=cast(big), cym=cast(big), ANGLE=cast(z), ANGLET=cast(z),
        hm=cast(hm), uvm=cast(uvm),
        tmask=jnp.asarray(hm > 0.5), umask=jnp.asarray(uvm > 0.5),
        tarean=cast(np.where(lmask_n, tarea * hm, 0.0)),
        tareas=cast(np.where(~lmask_n, tarea * hm, 0.0)),
        fcor=cast(2.0 * ct.omega * np.sin(ulat)))


def gridbox_corners(grid) -> tuple:
    """Per-cell corner longitudes/latitudes for history cell bounds
    (ice_grid.F90:1972-2121 gridbox_corners): corner order NE, NW, SW, SE
    from the U (NE-corner) coordinates. Returns (lont_bounds,
    latt_bounds) each (4, ny, nx) in degrees."""
    ulat = np.rad2deg(np.asarray(grid.ULAT))
    ulon = np.rad2deg(np.asarray(grid.ULON))
    sh = lambda a, di, dj: _shift(a, di, dj, True)
    latb = np.stack([ulat, sh(ulat, -1, 0), sh(ulat, -1, -1),
                     sh(ulat, 0, -1)])
    lonb = np.stack([ulon, sh(ulon, -1, 0), sh(ulon, -1, -1),
                     sh(ulon, 0, -1)])
    return lonb, latb


def make_grid(cfg: ModelConfig, **kw) -> Grid:
    t = cfg.grid.grid_type
    if t in ("rectangular", "column"):
        return rectgrid(cfg, **kw)
    if t in ("displaced_pole", "tripole"):
        return popgrid(cfg)
    if t == "latlon":
        from cice5_tpu.io import readers
        g = cfg.grid
        d = readers.read_latlon_domain(g.grid_file or g.kmt_file)
        return latlongrid(cfg, d["yc"], d["xc"], d["area"], d["mask"])
    if t == "cpom":
        from cice5_tpu.io import readers
        g = cfg.grid
        data = readers.read_cpom_grid_binary(g.grid_file, g.kmt_file,
                                             g.nx, g.ny)
        return popgrid_np(cfg, data["ULAT"], data["ULON"], data["HTN"],
                          data["HTE"], data["ANGLE"], data["kmt"])
    raise NotImplementedError(f"grid_type={t}")
