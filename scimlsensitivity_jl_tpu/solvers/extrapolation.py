"""Gragg-Bulirsch-Stoer extrapolation solver (high-order explicit).

Covers the reference's high-order explicit slot (Vern9-class accuracy;
SURVEY §2 item 4 lists Vern9 among the L0 integrators). Instead of a
long-coefficient Verner tableau, GBS builds arbitrary even order from the
modified-midpoint rule + Aitson-Neville polynomial extrapolation — every
constant derives from the substep sequence, and the whole step is
straight-line XLA (substep counts static, loops unrolled at trace time).

Per step with K levels and substep sequence n_j = 2, 4, 6, ...:
    T_j = Gragg midpoint result with n_j substeps (with the final smoothing
          step, which kills the oscillating error term and makes the error
          expansion even in h)
    T[j,l] = T[j,l-1] + (T[j,l-1] - T[j-1,l-1]) / ((n_j/n_{j-l})² - 1)
    u1 = T[K-1,K-1]   (order 2K),   err = T[K-1,K-1] - T[K-1,K-2].

Hairer-Norsett-Wanner, Solving ODEs I, §II.9.
"""

from __future__ import annotations

__all__ = ["GBS", "Vern9Like"]


class GBS:
    """levels: number of extrapolation levels K (order = 2K)."""

    def __init__(self, levels: int = 4):
        if levels < 2:
            raise ValueError("GBS needs at least 2 levels")
        self.levels = levels
        self.seq = tuple(2 * (j + 1) for j in range(levels))  # 2,4,6,...
        self.order = 2 * levels
        self.fsal = False
        self.n_stages = sum(self.seq) + levels + 1
        self.name = f"GBS(levels={levels})"

    def __repr__(self):
        return self.name

    def _midpoint(self, fvec, t, dt, u, f0, nsub: int):
        h = dt / nsub
        z_prev = u
        z = u + h * f0
        for m in range(1, nsub):
            z_next = z_prev + 2.0 * h * fvec(z, t + m * h)
            z_prev, z = z, z_next
        # Gragg smoothing: S = (z_{n} + z_{n-1} + h f(z_n)) / 2
        return 0.5 * (z + z_prev + h * fvec(z, t + dt))

    def step(self, fvec, t, dt, u, f0):
        K = self.levels
        T = [self._midpoint(fvec, t, dt, u, f0, n) for n in self.seq]
        # Aitken-Neville with ratios (n_j / n_{j-l})^2
        for l in range(1, K):
            for j in range(K - 1, l - 1, -1):
                r = (self.seq[j] / self.seq[j - l]) ** 2
                T[j] = T[j] + (T[j] - T[j - 1]) / (r - 1.0)
        u1 = T[K - 1]
        err = T[K - 1] - T[K - 2]
        f1 = fvec(u1, t + dt)
        return u1, f1, err


def Vern9Like():
    """Order-10 GBS — the high-accuracy explicit workhorse slot that Vern9
    fills in the reference's test matrix."""
    return GBS(levels=5)
