"""Batched tridiagonal (Thomas) solver.

The reference hand-rolls serial TDMA solvers per column
(/root/reference/source/ice_therm_bl99.F90:1763 tridiag_solver,
ice_therm_mushy.F90:2887 tdma_solve_sparse). On TPU the per-column solve is
tiny (nilyr+nslyr+1 ~ 9 unknowns), so we run the Thomas recurrence over the
layer axis with ``lax.scan`` while the batch axis (all grid cells x
categories) rides the vector lanes — thousands of independent solves per VPU
instruction, no gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tridiag_solve(sbdiag, diag, spdiag, rhs):
    """Solve the batched tridiagonal system along axis 0.

    Args:
      sbdiag: (n, ...) sub-diagonal a_k (a_0 unused)
      diag:   (n, ...) main diagonal b_k
      spdiag: (n, ...) super-diagonal c_k (c_{n-1} unused)
      rhs:    (n, ...) right-hand side
    Returns:
      x: (n, ...) solution, batched over trailing axes.
    """
    n = diag.shape[0]

    if n <= 24:
        # Unrolled Thomas recurrence: for the model's tiny layer counts
        # (nilyr+nslyr+1 ~ 9) a static unroll fuses into one XLA kernel,
        # where lax.scan would emit 2n tiny sequential kernels.
        cps, dps = [], []
        cp = jnp.zeros_like(diag[0])
        dp = jnp.zeros_like(diag[0])
        for k in range(n):
            w = 1.0 / (diag[k] - sbdiag[k] * cp)
            cp = spdiag[k] * w
            dp = (rhs[k] - sbdiag[k] * dps[-1]) * w if k else rhs[k] * w
            cps.append(cp)
            dps.append(dp)
        xs = [None] * n
        x = dps[n - 1]
        xs[n - 1] = x
        for k in range(n - 2, -1, -1):
            x = dps[k] - cps[k] * x
            xs[k] = x
        return jnp.stack(xs)

    def fwd(carry, inputs):
        cp_prev, dp_prev = carry
        a, b, c, d = inputs
        denom = b - a * cp_prev
        w = 1.0 / denom
        cp = c * w
        dp = (d - a * dp_prev) * w
        return (cp, dp), (cp, dp)

    z = jnp.zeros_like(diag[0])
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (z, z), (sbdiag, diag, spdiag, rhs))

    def bwd(x_next, inputs):
        cp, dp = inputs
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, z, (cps, dps), reverse=True)
    return xs
