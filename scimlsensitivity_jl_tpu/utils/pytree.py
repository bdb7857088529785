"""PyTree utilities.

The reference handles structured (non-array) parameters through
SciMLStructures.canonicalize / Functors.functor recursion
(reference: src/parameters_handling.jl:15-138, src/utils.jl:1-7).
In JAX, parameters and states are pytrees natively, so this module only
provides the small set of helpers the solver core needs: flatten/unflatten
between pytrees and flat vectors (for the integrator's dense-output buffers
and for linear algebra in stiff solvers), and elementwise tree arithmetic
(the analogue of recursive_copyto!/recursive_neg!/recursive_add!).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = [
    "ravel_pytree",
    "tree_add",
    "tree_sub",
    "tree_neg",
    "tree_scale",
    "tree_zeros_like",
    "tree_axpy",
    "tree_dot",
    "tree_size",
    "flat_dim",
]


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_neg(a):
    return jax.tree_util.tree_map(jnp.negative, a)


def tree_scale(c, a):
    return jax.tree_util.tree_map(lambda x: c * x, a)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_axpy(c, x, y):
    """y + c * x, elementwise over the tree."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + c * xi, x, y)


def tree_dot(a, b):
    """Sum of elementwise products over the whole tree (a scalar)."""
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_size(a) -> int:
    """Total number of scalar elements in the tree (static)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(a))


def flat_dim(a) -> int:
    return tree_size(a)
