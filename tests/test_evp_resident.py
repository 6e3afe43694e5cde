"""VMEM-resident EVP sweep (ops/pallas/evp_resident.py): bit-level
trajectory equivalence with the XLA subcycle loop in interpret mode,
on open-north and tripole topologies.

The kernel body runs the SAME subcycle_sweep function as the XLA path
(with the tripole x-reversal traced as a permutation-matrix contraction,
which is exact), so interpret mode must be bit-exact; on real TPU
hardware only fusion ordering differs (~1e-6 relative, checked in the
driven TPU benches).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cice5_tpu import ModelConfig
from cice5_tpu.config import GridConfig
from cice5_tpu.grid import rectgrid
from cice5_tpu.models.dynamics import evp as evp_mod
from cice5_tpu.models.dynamics import shared as dyn
from cice5_tpu.models.dynamics.strength import strength_hibler
from cice5_tpu.ops.pallas.evp_resident import sweep_resident
from cice5_tpu.parallel import Topology


def setup(ny=16, nx=32, ns="open"):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, dx_const=20000.0,
                                      dy_const=20000.0),
                      dtype="float64")
    g = rectgrid(cfg)
    topo = Topology(ew="cyclic", ns=ns)
    rng = np.random.RandomState(7)
    aice = jnp.where(g.tmask, jnp.asarray(rng.uniform(0.3, 1.0, (ny, nx))),
                     0.0)
    vice = aice * 1.5
    z = jnp.zeros((ny, nx), jnp.float64)
    f = dict(
        aice=aice, vice=vice, vsno=aice * 0.1,
        strength=strength_hibler(aice, vice),
        strairxT=jnp.where(g.tmask, 0.12, 0.0),
        strairyT=jnp.where(g.tmask, -0.05, 0.0),
        uocn=z + 0.02, vocn=z,
        uvel=jnp.asarray(rng.uniform(-0.1, 0.1, (ny, nx))),
        vvel=jnp.asarray(rng.uniform(-0.1, 0.1, (ny, nx))),
        stressp=jnp.zeros((4, ny, nx)), stressm=jnp.zeros((4, ny, nx)),
        stress12=jnp.zeros((4, ny, nx)), iceumask=z)
    return g, topo, f


@pytest.mark.parametrize("ns", ["open", "tripole"])
def test_resident_matches_xla_loop(ns, monkeypatch):
    g, topo, f = setup(ns=ns)
    p = dyn.EVPParams.classic(3600.0, ndte=12)

    # capture the prepared sweep inputs from a reference evp() run
    captured = {}
    orig = evp_mod.subcycle_sweep

    def capture(pp, ndte, tp, **kw):
        captured["args"] = (pp, ndte, tp)
        captured["kw"] = kw
        return orig(pp, ndte, tp, **kw)

    monkeypatch.setattr(evp_mod, "subcycle_sweep", capture)
    evp_mod.evp(3600.0, p, g, topo, **f)
    monkeypatch.setattr(evp_mod, "subcycle_sweep", orig)

    pp, ndte, tp = captured["args"]
    ref = orig(pp, ndte, tp, **captured["kw"])
    got = sweep_resident(pp, ndte, tp, **captured["kw"], interpret=True)

    flat_ref = list(ref[:3]) + list(ref[3])
    flat_got = list(got[:3]) + list(got[3])
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_refuses_sharded():
    g, topo, f = setup()
    sh = Topology(ew="cyclic", ns="open", axis_x="x")
    p = dyn.EVPParams.classic(3600.0, ndte=4)
    with pytest.raises(NotImplementedError):
        sweep_resident(p, 4, sh, uvel=f["uvel"], vvel=f["vvel"],
                       stressR=None, maskR=None, strengthR=None, gR=None,
                       icem_u=None, aiu=None, uocn=None, vocn=None,
                       waterx=None, watery=None, forcex=None, forcey=None,
                       umassdti=None, fm=None, uarear=None,
                       uvel_init=None, vvel_init=None, Cw=None)
