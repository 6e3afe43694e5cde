"""Pytree-registered dataclass helper.

The reference keeps model state in Fortran module globals
(/root/reference/source/ice_state.F90:53-147, ice_flux.F90:34-330); here all
state is explicit, immutable pytree dataclasses threaded through one jitted
step function — the functional idiom XLA requires.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def pytree_dataclass(cls: type[T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in ``meta_fields`` are static (hashed into the treedef);
    everything else is a leaf/child. Instances get a ``.replace(**kw)`` method.
    """
    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(f.name for f in dataclasses.fields(c)
                            if f.name not in meta_fields)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields))
        if not hasattr(c, "replace"):
            c.replace = lambda self, **kw: dataclasses.replace(self, **kw)
        return c

    return wrap if cls is None else wrap(cls)
