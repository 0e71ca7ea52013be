"""Pytree-dataclass helper for operators and solver states.

Operators in this framework are immutable dataclasses of arrays
(pytrees) with pure methods, so they can be passed straight through
``jax.jit``/``shard_map`` — the functional counterpart of the
reference's stateful MatOp objects.
"""

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Freeze ``cls`` as a dataclass and register it as a JAX pytree.

    ``meta_fields`` become static (hashable) auxiliary data; everything
    else is traversed as pytree leaves.
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

    if cls is None:
        return wrap
    return wrap(cls)
