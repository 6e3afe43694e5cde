"""Tripole fold ORACLE: a U-fold tripole domain is mathematically the
bottom half of a doubled cyclic-x domain glued to its own 180-degree
rotation (mpi/ice_boundary.F90:1494-1596 fold indexing). Running the SAME
physics on the explicit doubled domain (where the seam is ordinary
interior) and on the half domain with the tripole halo must agree —
including on grids with NONUNIFORM metrics, which exercises the
partner-metric fold (ghost cxp = -cym of the image cell, etc.,
ice_grid.F90:356-367 coefficient definitions).

This is the strongest validation of the fold machinery: unlike
decomposition invariance (which compares two programs that share the same
extend()), the doubled domain never calls the tripole code at all.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# doubled-domain oracles are the heavyweight compile items: default gate
# runs them under -m slow only (full suite: pytest -m "slow or not slow")
pytestmark = pytest.mark.slow

from cice5_tpu import ModelConfig
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import popgrid_np
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.evp import evp
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.parallel import Topology


# ---------------------------------------------------------------------
# doubled-domain construction (all 0-based; derivations in halo.py)
#
# T-cell (i, ny+k) 1-based maps to (nxG+1-i, ny+1-k):
#   X2[ny:2ny] = X[::-1, ::-1]
# U-point (NE corner, offsets (1,1)) maps to (nxG-i, ny-k):
#   X2[ny-1+k, i] = X[ny-1-k, (nx-2-i) % nx],  k = 1..ny
# faces: htn2[ny-1+k, i] = htn[ny-1-k, nx-1-i]   (north face <-> south face)
#        hte2[ny-1+k, i] = hte[ny-k, (nx-2-i) % nx]  (east <-> west)
# ---------------------------------------------------------------------

def _mirror_T(X, sign=1.0):
    return np.concatenate([X, sign * X[::-1, ::-1]], axis=0)


def _mirror_U(X, sign=1.0):
    top = sign * np.roll(X[ny_of(X) - 2::-1, ::-1], -1, axis=1)
    pad = np.zeros((1, X.shape[1]), X.dtype)
    return np.concatenate([X, top, pad], axis=0)


def ny_of(X):
    return X.shape[0]


def build_grids(ny=16, nx=32, seed=0):
    """Nonuniform half grid + the equivalent doubled grid; both built by
    popgrid_np from (ulat, ulon, htn, hte) so every derived metric on the
    half grid is EXACTLY the doubled grid's bottom half (the half Grid is
    literally a slice of the doubled Grid)."""
    rng = np.random.default_rng(seed)
    dx0 = 25.0e3
    ii = np.arange(nx)
    jj = np.arange(ny)
    # smooth nonuniform face lengths; htn top row must be symmetric under
    # i -> nx-1-i (the fold-line faces are shared with their own images)
    htn = dx0 * (1.0 + 0.25 * np.sin(2 * np.pi * ii / nx)[None, :]
                 + 0.15 * np.cos(2 * np.pi * jj / ny)[:, None])
    sym = 0.5 * (htn[-1] + htn[-1][::-1])
    htn[-1] = sym
    hte = dx0 * (1.0 + 0.2 * np.cos(4 * np.pi * ii / nx)[None, :]
                 + 0.1 * np.sin(2 * np.pi * jj / ny)[:, None])

    # zonal ULAT (rows only) keeps the shared fold U-row self-consistent
    lat_row = np.deg2rad(np.linspace(60.0, 75.0, ny))
    ulat = np.broadcast_to(lat_row[:, None], (ny, nx)).copy()
    ulon = np.broadcast_to(np.linspace(0, 2 * np.pi, nx, endpoint=False),
                           (ny, nx)).copy()
    hm = np.ones((ny, nx))
    hm[:2] = 0.0                            # open southern band -> land

    # --- doubled fields ---
    htn2 = np.concatenate([htn, htn[ny - 2::-1, ::-1],
                           htn[:1, ::-1]], axis=0)   # last row unused (land)
    hte2 = np.concatenate(
        [hte, np.roll(hte[::-1, ::-1], -1, axis=1)], axis=0)
    # zonal ulat: U rows ny..2ny-2 take rows ny-2..0; final row replicated
    lat2 = np.concatenate([lat_row, lat_row[ny - 2::-1], lat_row[:1]])
    ulat2 = np.broadcast_to(lat2[:, None], (2 * ny, nx)).copy()
    ulon2 = np.concatenate(
        [ulon, np.roll(ulon[ny - 2::-1, ::-1], -1, axis=1),
         ulon[:1]], axis=0)
    hm2 = _mirror_T(hm)
    ang = np.zeros((ny, nx))
    ang2 = np.zeros((2 * ny, nx))

    cfg2 = ModelConfig(grid=GridConfig(nx=nx, ny=2 * ny,
                                       ew_boundary="cyclic",
                                       ns_boundary="open"),
                       dtype="float64")
    G2 = popgrid_np(cfg2, ulat2, ulon2, htn2, hte2, ang2,
                    (hm2 > 0.5).astype(np.int32))
    G1 = jax.tree.map(lambda a: a[:ny], G2)
    return G1, G2


def evp_inputs(G, topo, ny, nx, doubled=False):
    """Mirror-consistent EVP inputs. Scalars on T mirror plainly; the wind
    stress is a VECTOR on T (sign flip under the fold)."""
    jj = np.arange(G.tmask.shape[0])[:, None] * np.ones((1, nx))
    ii = np.ones((G.tmask.shape[0], 1)) * np.arange(nx)[None, :]
    nyd = G.tmask.shape[0]

    def half_field(f):
        # f defined on the half domain rows 0..ny-1
        jh = np.arange(ny)[:, None] * np.ones((1, nx))
        ih = np.ones((ny, 1)) * np.arange(nx)[None, :]
        return f(jh, ih)

    aice_h = half_field(lambda j, i: 0.85 + 0.1 * np.sin(2 * np.pi * i / nx)
                        * np.cos(np.pi * j / ny))
    strx_h = half_field(lambda j, i: 0.08 + 0.04 * np.cos(2 * np.pi * i / nx))
    stry_h = half_field(lambda j, i: 0.02 * np.sin(2 * np.pi * j / ny))

    if doubled:
        aice = _mirror_T(aice_h)
        strx = _mirror_T(strx_h, sign=-1.0)
        stry = _mirror_T(stry_h, sign=-1.0)
    else:
        aice, strx, stry = aice_h, strx_h, stry_h

    tmask = np.asarray(G.tmask)
    aice = jnp.asarray(np.where(tmask, aice, 0.0))
    z = jnp.zeros_like(aice)
    return dict(
        aice=aice, vice=aice * 1.2, vsno=aice * 0.0,
        strength=strength_hibler(aice, aice * 1.2),
        strairxT=jnp.asarray(np.where(tmask, strx, 0.0)),
        strairyT=jnp.asarray(np.where(tmask, stry, 0.0)),
        uocn=z, vocn=z, uvel=z, vvel=z,
        stressp=jnp.zeros((4,) + aice.shape),
        stressm=jnp.zeros((4,) + aice.shape),
        stress12=jnp.zeros((4,) + aice.shape), iceumask=z)


@pytest.mark.parametrize("algorithm", ["subcycle", "chunked"])
def test_evp_tripole_matches_doubled_domain(algorithm):
    ny, nx = 16, 32
    G1, G2 = build_grids(ny, nx)
    p = dyn.EVPParams.classic(dt=3600.0, ndte=40)
    topo1 = Topology(ew="cyclic", ns="tripole")
    topo2 = Topology(ew="cyclic", ns="open")

    if algorithm == "chunked":
        from cice5_tpu.models.dynamics.evp import evp_chunked
        r1 = evp_chunked(3600.0, p, G1, topo1, K=5,
                         **evp_inputs(G1, topo1, ny, nx))
    else:
        r1 = evp(3600.0, p, G1, topo1, **evp_inputs(G1, topo1, ny, nx))
    r2 = evp(3600.0, p, G2, topo2, **evp_inputs(G2, topo2, ny, nx,
                                                doubled=True))

    u1, v1 = np.asarray(r1.uvel), np.asarray(r1.vvel)
    u2, v2 = np.asarray(r2.uvel), np.asarray(r2.vvel)
    scale = max(np.abs(u2).max(), 1e-12)
    # interior U rows 0..ny-2 and the shared fold row ny-1
    np.testing.assert_allclose(u1[:ny], u2[:ny], atol=3e-8 * scale,
                               err_msg="uvel: half-tripole vs doubled")
    np.testing.assert_allclose(v1[:ny], v2[:ny], atol=3e-8 * scale,
                               err_msg="vvel: half-tripole vs doubled")
    # and the doubled domain itself must keep the U-point mirror symmetry
    # u(i, j) = -u((nx-2-i) % nx, 2ny-2-j) throughout the run
    cols = (nx - 2 - np.arange(nx)) % nx
    u2m = np.stack([-u2[2 * ny - 2 - j][cols] for j in range(2 * ny - 1)])
    np.testing.assert_allclose(u2[:2 * ny - 1], u2m, atol=3e-8 * scale,
                               err_msg="doubled domain lost mirror symmetry")
