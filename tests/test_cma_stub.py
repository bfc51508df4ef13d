"""Sanity-check scripts/_cma_stub.py against published CMA-ES behavior.

The quality-parity harness (scripts/quality_parity.py) substitutes this
stub for the absent ``cma`` PyPI package when driving the REFERENCE
IPPMashaMission (reference planning/ipp_masha.py:160-178).  The parity
tables are only meaningful if the stub is a competent CMA-ES — these
tests pin the stub to convergence milestones any correct
(mu/mu_w, lambda)-CMA-ES with Hansen's default constants achieves (cf.
Hansen, "The CMA Evolution Strategy: A Tutorial", §4 figures):

* sphere: linear convergence to 1e-9 well within 300 iterations (n=10)
* Rosenbrock n=5: solved to 1e-6 within ~6k evaluations
* cigar (axis ratio 1e3): needs a working covariance-matrix update —
  an isotropic ES stalls for ~1e6 evals; CMA-ES solves it in ~4k.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../scripts"))

from _cma_stub import CMAEvolutionStrategy


def _minimize(f, x0, sigma0, maxiter, popsize=None, seed=0):
    opts = {"maxiter": maxiter}
    if popsize:
        opts["popsize"] = popsize
    es = CMAEvolutionStrategy(np.asarray(x0, float), sigma0, inopts=opts)
    es._rng = np.random.default_rng(seed)
    while not es.stop():
        xs = es.ask()
        es.tell(xs, [float(f(np.asarray(x))) for x in xs])
    return es.result.fbest, es.iteration * es.lam


def test_stub_sphere_linear_convergence():
    fbest, evals = _minimize(
        lambda x: float(np.sum(x * x)), np.ones(10), 0.5, maxiter=300
    )
    assert fbest < 1e-9, f"sphere fbest={fbest} after {evals} evals"


def test_stub_rosenbrock():
    def rosen(x):
        return float(
            np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
        )

    fbest, evals = _minimize(rosen, np.zeros(5), 0.5, maxiter=800)
    assert fbest < 1e-6, f"rosenbrock fbest={fbest} after {evals} evals"
    assert evals <= 7000


def test_stub_cigar_covariance_adaptation():
    def cigar(x):
        return float(x[0] ** 2 + 1e6 * np.sum(x[1:] ** 2))

    fbest, evals = _minimize(cigar, np.ones(5), 0.5, maxiter=700)
    assert fbest < 1e-8, f"cigar fbest={fbest} after {evals} evals"


def test_stub_respects_bounds():
    es = CMAEvolutionStrategy(
        np.zeros(4), 1.0,
        inopts={"maxiter": 20, "bounds": [[-1.0] * 4, [1.0] * 4]},
    )
    es._rng = np.random.default_rng(1)
    while not es.stop():
        xs = es.ask()
        X = np.asarray(xs)
        assert np.all(X >= -1.0) and np.all(X <= 1.0)
        es.tell(xs, [float(np.sum((np.asarray(x) - 0.3) ** 2)) for x in xs])
    assert es.result.fbest < 0.05
