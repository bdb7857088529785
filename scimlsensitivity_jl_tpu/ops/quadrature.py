"""Gauss–Kronrod quadrature pairs, computed (not transcribed) at import.

The reference's QuadratureAdjoint drives `quadgk` — adaptive Gauss–Kronrod
with paired (n, 2n+1) rules and an error estimate — and GaussKronrodAdjoint
uses the GK pair inside an integrating callback
(/root/reference/src/quadrature_adjoint.jl:536-633,
 /root/reference/src/gauss_adjoint.jl:815-825).

Rather than hard-coding node tables, the Kronrod extension is constructed
numerically in float64 on the host:

  1. The Stieltjes polynomial E_{n+1} (whose roots are the Kronrod-only
     nodes) is expanded in the Legendre basis; its coefficients solve the
     defining orthogonality ∫ E_{n+1}(x) P_n(x) x^k dx = 0 for k = 0..n.
  2. The 2n+1 Kronrod weights come from moment matching on P_0..P_{2n}
     (the rule is exact to degree 3n+1 ≥ 2n, and the Legendre-basis
     Vandermonde is well conditioned).
  3. The embedded n-point Gauss weights are placed at the Gauss nodes with
     zeros at Kronrod-only nodes, so `wk - wg` contracted with the same
     integrand samples gives the quadgk error estimate for free.

Exactness (degree 3n+1 for the Kronrod rule, 2n-1 for the embedded Gauss
rule) is asserted by tests/test_quadrature.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["gauss_kronrod_01", "gl_01"]


def _legval(c, x):
    return np.polynomial.legendre.legval(x, c)


@lru_cache(maxsize=None)
def _gk_pair_np(n: int):
    """(nodes, kronrod weights, embedded gauss weights) on [-1, 1], float64.

    nodes: (2n+1,) ascending; the n Gauss nodes are interleaved among them.
    """
    # High-order GL rule for the construction integrals (max integrand degree
    # here is (n+1) + n + n = 3n+1; 4n points are exact with margin).
    xq, wq = np.polynomial.legendre.leggauss(4 * n + 8)

    def inner(cA, cB, k):
        # ∫_{-1}^{1} A(x) B(x) x^k dx with A, B in Legendre coefficients
        return np.sum(wq * _legval(cA, xq) * _legval(cB, xq) * xq ** k)

    Pn = np.zeros(n + 1)
    Pn[n] = 1.0

    # E_{n+1} = P_{n+1} + sum_{j=0..n} c_j P_j ;  n+1 orthogonality conditions
    A = np.empty((n + 1, n + 1))
    b = np.empty(n + 1)
    for k in range(n + 1):
        for j in range(n + 1):
            ej = np.zeros(n + 1)
            ej[j] = 1.0
            A[k, j] = inner(ej, Pn, k)
        top = np.zeros(n + 2)
        top[n + 1] = 1.0
        b[k] = -inner(top, Pn, k)
    c = np.linalg.solve(A, b)
    E = np.concatenate([c, [1.0]])  # Legendre coefficients of E_{n+1}

    kron_nodes = np.polynomial.legendre.Legendre(E).roots().real
    gauss_nodes = np.polynomial.legendre.leggauss(n)[0]
    nodes = np.sort(np.concatenate([gauss_nodes, kron_nodes]))

    # Kronrod weights: exactness on P_0..P_{2n}  (∫ P_j = 2 δ_{j0})
    m = 2 * n + 1
    V = np.empty((m, m))
    for j in range(m):
        ej = np.zeros(j + 1)
        ej[j] = 1.0
        V[j] = _legval(ej, nodes)
    rhs = np.zeros(m)
    rhs[0] = 2.0
    wk = np.linalg.solve(V, rhs)

    # Embedded Gauss weights aligned to the 2n+1 node vector
    gx, gw = np.polynomial.legendre.leggauss(n)
    wg = np.zeros(m)
    for xi, wi in zip(gx, gw):
        idx = int(np.argmin(np.abs(nodes - xi)))
        wg[idx] = wi
    return nodes, wk, wg


def gauss_kronrod_01(n: int, dtype):
    """GK(n, 2n+1) pair mapped to [0, 1]: (x, w_kronrod, w_gauss_embedded).

    `w_kronrod @ f(x)` is the high-order estimate; `(w_kronrod - w_gauss) @
    f(x)` is the embedded error estimate — both from one set of samples.
    """
    nodes, wk, wg = _gk_pair_np(n)
    x01 = 0.5 * (nodes + 1.0)
    return (
        jnp.asarray(x01, dtype),
        jnp.asarray(0.5 * wk, dtype),
        jnp.asarray(0.5 * wg, dtype),
    )


def gl_01(order: int, dtype):
    """Plain Gauss–Legendre nodes/weights on [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(order)
    return jnp.asarray(0.5 * (x + 1.0), dtype), jnp.asarray(0.5 * w, dtype)
