"""Multi-host execution (SURVEY §4(f), §2.10; VERDICT r1 item 7):
2 localhost processes x 4 virtual CPU devices each, one global (2,4) mesh
spanning both, full sharded steps, decomposition invariance vs the
single-process run, and primary-only IO."""
import dataclasses
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_decomposition_invariance(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, f"127.0.0.1:{port}", "2", str(i),
         str(tmp_path)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"

    # single-process reference (8 virtual devices in THIS process)
    import jax
    from cice5_tpu.config import rect_config
    from cice5_tpu.driver.model import Model
    cfg = rect_config(ny=16, nx=32, dtype="float64", accum_dtype="float64")
    cfg = cfg.replace(dyn=dataclasses.replace(cfg.dyn, ndte=12))
    m = Model(cfg)
    st = m.init_state(ice_mask=np.asarray(m.grid.tmask))
    for k in range(2):
        st, _ = m.step(st, m.forcing_at(k))

    with np.load(tmp_path / "multihost_result.npz") as z:
        for name in ("aicen", "vicen", "uvel", "vvel"):
            a = np.asarray(getattr(st, name))
            b = z[name]
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(a, b, atol=1e-9 * scale,
                                       err_msg=name)
