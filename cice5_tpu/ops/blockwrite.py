"""Dynamic-update-slice block writes for the tracer stack.

``trcrn.at[:, a:b].set(v)`` (and ``.add``) lowers to a lax.scatter on
XLA:TPU, and the scatter pins a tracer-major operand layout
({3,2,0,1}); every such site in the hot path materializes TWO full
(ncat, ntrcr, ny, nx) layout-conversion copies (~56 MB each at gx1
size, visible as unattributed ``copy``/``constant_dynamic-update-
slice`` time in xprof).  An explicit ``lax.dynamic_update_slice`` is
bit-identical for these static contiguous slices and lowers to an
in-place DUS with no layout constraint.

These helpers exist so call sites stay one-liners; values are cast to
the stack dtype exactly as ``.at[].set`` would (silently, matching the
scatter's cast semantics).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _prep(trcrn, val, width_axis=1):
    if val.ndim == trcrn.ndim - 1:
        val = jnp.expand_dims(val, width_axis)
    return val.astype(trcrn.dtype)


def set_trc(trcrn, i0: int, val):
    """trcrn[:, i0:i0+w] = val.  val: (ncat, w, *B) or (ncat, *B) (w=1)."""
    val = _prep(trcrn, val)
    start = (0, i0) + (0,) * (trcrn.ndim - 2)
    return lax.dynamic_update_slice(trcrn, val, start)


def add_trc(trcrn, i0: int, w: int, delta):
    """trcrn[:, i0:i0+w] += delta (delta broadcastable to the slice)."""
    sizes = (trcrn.shape[0], w) + trcrn.shape[2:]
    start = (0, i0) + (0,) * (trcrn.ndim - 2)
    blk = lax.dynamic_slice(trcrn, start, sizes)
    return lax.dynamic_update_slice(
        trcrn, (blk + delta).astype(trcrn.dtype), start)


def set_trc_cat(trcrn, cat: int, i0: int, val):
    """trcrn[cat, i0:i0+w] = val.  val: (w, *B) or (*B) (w=1)."""
    if val.ndim == trcrn.ndim - 2:
        val = val[None]
    start = (cat, i0) + (0,) * (trcrn.ndim - 2)
    return lax.dynamic_update_slice(trcrn, val[None].astype(trcrn.dtype),
                                    start)


def set_cat(arr, cat: int, val):
    """arr[cat] = val for a (ncat, *B) stack (the .at[k].set analog)."""
    start = (cat,) + (0,) * (arr.ndim - 1)
    return lax.dynamic_update_slice(arr, val[None].astype(arr.dtype),
                                    start)
