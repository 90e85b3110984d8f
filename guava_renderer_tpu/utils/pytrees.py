"""Pytree helpers for the remote-compile path.

Arrays closed over by a jitted function are embedded in the lowered
module as dense constants; at full scale (EHM tables + UV charts +
weights) that serializes to ~1.3 GB of MLIR, which the axon tunnel's
remote-compile endpoint rejects with HTTP 413. `split_arrays` separates a
mixed pytree (e.g. EhmModel: jnp arrays + python ints/tuples) into array
leaves to pass as jit ARGUMENTS and a rebuild closure holding only the
static metadata.
"""

from __future__ import annotations

import jax


def split_arrays(tree):
    """-> (array_leaves, rebuild): `rebuild(array_leaves)` returns an
    equivalent tree; only non-array leaves are captured statically."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    is_arr = [hasattr(l, "shape") and hasattr(l, "dtype") for l in leaves]
    arrays = [l for l, a in zip(leaves, is_arr) if a]
    static = [None if a else l for l, a in zip(leaves, is_arr)]

    def rebuild(arrs):
        it = iter(arrs)
        return jax.tree_util.tree_unflatten(
            treedef, [next(it) if a else s for s, a in zip(static, is_arr)]
        )

    return arrays, rebuild
