"""Linearly-implicit Euler extrapolation (SEULEX-class stiff solver).

Fills the reference's high-order stiff slot (Rodas4/FBDF in the
OrdinaryDiffEq test matrix — SURVEY §2 item 4 / §7): instead of a
long-coefficient Rosenbrock tableau or a multistep history, arbitrary order
K comes from extrapolating the L-stable linearly implicit Euler method —
every constant derives from the substep sequence, and a step is
straight-line XLA (substep counts static, loops unrolled at trace time),
exactly like the explicit GBS solver in extrapolation.py.

Per step of size H with K levels and substep sequence n_j = 1, 2, ..., K:

    W_j = M - h_j J,  h_j = H / n_j,  J = ∂f/∂u frozen at (u, t)
    linearly implicit Euler:  W_j Δ = h_j f(u_k, t_k);  u_{k+1} = u_k + Δ
    T_j  = result after n_j substeps
    T[j,l] = T[j,l-1] + (T[j,l-1] - T[j-1,l-1]) / (n_j/n_{j-l} - 1)
    u1 = T[K-1,K-1]  (order K),  err = T[K-1,K-1] - T[K-1,K-2].

The h¹ error expansion of the W-method makes the Aitken-Neville ratios
linear (n_j/n_{j-l}), not squared as in GBS. Hairer-Wanner, Solving ODEs II,
§IV.9. Supports constant mass matrices including singular diagonal ones
(semi-explicit index-1 DAEs): W = M - hJ is nonsingular for index-1, the
returned derivative estimate u̇ = W_fine⁻¹ f has exactly the consistent
algebraic slope u̇_a = -J_aa⁻¹ J_ad u̇_d, and algebraic rows are excluded
from the error estimate (reference mass-matrix surface:
adjoint_common.jl:110-139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

__all__ = ["Seulex", "Rodas4Like"]


class Seulex:
    """levels: number of extrapolation levels K (order = K)."""

    def __init__(self, levels: int = 4, mass_matrix=None):
        if levels < 2:
            raise ValueError("Seulex needs at least 2 levels")
        self.levels = levels
        self.seq = tuple(range(1, levels + 1))  # 1,2,3,...
        self.order = levels
        self.fsal = False
        self.n_stages = sum(self.seq)
        self.mass_matrix = mass_matrix
        self.name = f"Seulex(levels={levels})"

    def with_mass_matrix(self, M):
        return Seulex(self.levels, mass_matrix=M)

    def __repr__(self):
        return self.name

    def step(self, fvec, t, dt, u, f0):
        K = self.levels
        n = u.shape[0]
        M = self.mass_matrix
        eyeM = jnp.eye(n, dtype=u.dtype) if M is None else jnp.asarray(M, u.dtype)
        jac_fn = getattr(fvec, "jac", None)  # analytic hook (see sdirk.py)
        J = (jac_fn(u, t) if jac_fn is not None
             else jax.jacfwd(lambda uu: fvec(uu, t))(u))

        lus = []
        T = []
        for nsub in self.seq:
            h = dt / nsub
            lu = lu_factor(eyeM - h * J)
            lus.append(lu)
            z = u
            for m in range(nsub):
                z = z + lu_solve(lu, h * fvec(z, t + m * h))
            T.append(z)

        # Aitken-Neville with linear ratios n_j / n_{j-l} (h¹ expansion).
        for l in range(1, K):
            for j in range(K - 1, l - 1, -1):
                r = self.seq[j] / self.seq[j - l]
                T[j] = T[j] + (T[j] - T[j - 1]) / (r - 1.0)
        u1 = T[K - 1]
        err = T[K - 1] - T[K - 2]

        if M is None:
            f1 = fvec(u1, t + dt)
        else:
            # Derivative estimate for the dense output / FSAL slot: W⁻¹f at
            # the finest level gives the consistent algebraic slope for
            # singular M (see module docstring).
            f1 = lu_solve(lus[-1], fvec(u1, t + dt))
            alg = jnp.sum(jnp.abs(eyeM), axis=1) == 0
            err = jnp.where(alg, 0.0, err)
        bad = ~jnp.all(jnp.isfinite(u1))
        err = jnp.where(bad, jnp.full_like(err, jnp.inf), err)
        return u1, f1, err


def Rodas4Like(**kw):
    """Order-4 stiff extrapolation — the slot Rodas4 fills in the
    reference's stiff test matrix (SURVEY §2 item 4)."""
    return Seulex(levels=4, **kw)
