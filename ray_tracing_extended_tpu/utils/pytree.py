"""Small helper for frozen dataclass pytrees.

All device-side containers in this framework (scenes, cameras, hit records,
materials) are struct-of-array pytrees so they flow through jit/vmap/shard_map
without custom flatten logic.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are static (hashed into the jit cache key); everything else
    is traced array data.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        ]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )
        return c

    return wrap if cls is None else wrap(cls)
