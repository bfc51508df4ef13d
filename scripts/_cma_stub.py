"""Minimal numpy CMA-ES standing in for the ``cma`` PyPI package.

The reference's IPPMashaMission drives ``cma.CMAEvolutionStrategy``
through ask/tell only (reference planning/ipp_masha.py:160-178:
CMAEvolutionStrategy(x0, sigma0, inopts={bounds, maxiter, popsize,
CMA_stds}), .stop(), .ask(), .tell(), .disp(), .result.xbest, plus
``cma.optimization_tools.EvalParallel2``).  The ``cma`` package is not
installed in this environment (zero egress), so the quality-parity
harness substitutes this faithful (mu/mu_w, lambda)-CMA-ES:

  * log-rank recombination weights, mu = floor(lambda/2)
  * cumulative step-size adaptation (CSA) and rank-1 + rank-mu
    covariance updates with Hansen's default constants
  * per-coordinate initial scales from ``CMA_stds`` (C0 = diag(stds^2))
  * box constraints by resampling into bounds (up to 10 tries, then
    clipping) — the real package uses a smooth boundary transform;
    this is the one documented deviation
  * termination purely on maxiter (the mission caps iterations anyway)

This keeps the reference's *planning logic* (objective, greedy warm
start, greedy-keep fallback) bit-identical while replacing only the
generic optimizer core with the standard published algorithm.
"""

import numpy as np


class _Result:
    def __init__(self):
        self.xbest = None
        self.fbest = np.inf


class CMAEvolutionStrategy:
    def __init__(self, x0, sigma0=1.0, inopts=None):
        opts = dict(inopts or {})
        self.x = np.asarray(x0, dtype=float).copy()
        self.n = len(self.x)
        self.sigma = float(sigma0)
        self.maxiter = int(opts.get("maxiter", 100))
        self.lam = int(opts.get("popsize", 4 + int(3 * np.log(self.n))))
        bounds = opts.get("bounds")
        self.lower = np.asarray(bounds[0], float) if bounds else None
        self.upper = np.asarray(bounds[1], float) if bounds else None
        stds = opts.get("CMA_stds")
        scales = np.asarray(stds, float) if stds is not None else np.ones(self.n)

        # recombination weights (Hansen tutorial defaults)
        self.mu = self.lam // 2
        w = np.log(self.mu + 0.5) - np.log(np.arange(1, self.mu + 1))
        self.weights = w / np.sum(w)
        self.mueff = 1.0 / np.sum(self.weights**2)

        n, mueff = self.n, self.mueff
        self.cc = (4 + mueff / n) / (n + 4 + 2 * mueff / n)
        self.cs = (mueff + 2) / (n + mueff + 5)
        self.c1 = 2 / ((n + 1.3) ** 2 + mueff)
        self.cmu = min(
            1 - self.c1, 2 * (mueff - 2 + 1 / mueff) / ((n + 2) ** 2 + mueff)
        )
        self.damps = 1 + 2 * max(0, np.sqrt((mueff - 1) / (n + 1)) - 1) + self.cs
        self.chiN = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n**2))

        self.C = np.diag(scales**2)
        self.pc = np.zeros(n)
        self.ps = np.zeros(n)
        self.iteration = 0
        self.result = _Result()
        self._rng = np.random.default_rng()
        self._pending = None

    # -- decomposition (eigen; n is small: 3 * horizon) ----------------
    def _sample(self):
        d, B = np.linalg.eigh(self.C)
        d = np.sqrt(np.maximum(d, 1e-20))
        z = self._rng.standard_normal((self.lam, self.n))
        y = z * d[None, :] @ B.T
        x = self.x[None, :] + self.sigma * y
        if self.lower is not None:
            for i in range(self.lam):
                for _ in range(10):
                    if np.all(x[i] >= self.lower) and np.all(x[i] <= self.upper):
                        break
                    zi = self._rng.standard_normal(self.n)
                    x[i] = self.x + self.sigma * (B @ (d * zi))
                x[i] = np.clip(x[i], self.lower, self.upper)
        return x

    def ask(self):
        self._pending = self._sample()
        return list(self._pending)

    def tell(self, solutions, fitnesses):
        X = np.asarray(solutions, float)
        f = np.asarray(fitnesses, float)
        order = np.argsort(f)
        if f[order[0]] < self.result.fbest:
            self.result.fbest = f[order[0]]
            self.result.xbest = X[order[0]].copy()

        xold = self.x.copy()
        sel = X[order[: self.mu]]
        self.x = self.weights @ sel

        y = (self.x - xold) / self.sigma
        d, B = np.linalg.eigh(self.C)
        d = np.sqrt(np.maximum(d, 1e-20))
        invsqrtC = B @ np.diag(1.0 / d) @ B.T
        self.ps = (1 - self.cs) * self.ps + np.sqrt(
            self.cs * (2 - self.cs) * self.mueff
        ) * (invsqrtC @ y)
        hsig = float(
            np.linalg.norm(self.ps)
            / np.sqrt(1 - (1 - self.cs) ** (2 * (self.iteration + 1)))
            / self.chiN
            < 1.4 + 2 / (self.n + 1)
        )
        self.pc = (1 - self.cc) * self.pc + hsig * np.sqrt(
            self.cc * (2 - self.cc) * self.mueff
        ) * y

        artmp = (sel - xold[None, :]) / self.sigma
        self.C = (
            (1 - self.c1 - self.cmu) * self.C
            + self.c1
            * (
                np.outer(self.pc, self.pc)
                + (1 - hsig) * self.cc * (2 - self.cc) * self.C
            )
            + self.cmu * artmp.T @ (self.weights[:, None] * artmp)
        )
        self.sigma *= np.exp(
            (self.cs / self.damps) * (np.linalg.norm(self.ps) / self.chiN - 1)
        )
        self.iteration += 1

    def stop(self):
        return {"maxiter": True} if self.iteration >= self.maxiter else {}

    def disp(self):
        pass


class _EvalParallel2:
    """Serial stand-in for cma.optimization_tools.EvalParallel2."""

    def __init__(self, fitness_function, number_of_processes=None):
        self.f = fitness_function

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __call__(self, solutions):
        return [float(self.f(np.asarray(x))) for x in solutions]


class optimization_tools:  # noqa: N801 — mirrors the cma module layout
    EvalParallel2 = _EvalParallel2
