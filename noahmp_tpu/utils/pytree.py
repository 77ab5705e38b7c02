"""Pytree dataclass helper.

All state containers in the framework are frozen dataclasses registered as
JAX pytrees so they flow through jit/vmap/scan/shard_map natively.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Decorate a class as a frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are treated as static (hashable) auxiliary data.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c)
                       if f.name not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields))
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **kwargs):
    """dataclasses.replace that reads nicely at call sites."""
    return dataclasses.replace(obj, **kwargs)
