"""Integration tests: Taylor-Green vortex convergence for the HDG schemes.

The method-of-exact-solutions harness of the reference driver
(driver.py:371-381) is the de-facto integration test (SURVEY.md section 4):
the L2 errors against the analytic decaying vortex must be small and shrink
at the expected rate under mesh/timestep refinement.
"""

import numpy as np
import pytest

from incompressibleeulerhdg_tpu.mesh.generators import unit_square_mesh
from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation
from incompressibleeulerhdg_tpu.models.problems import TaylorGreen
from incompressibleeulerhdg_tpu.timesteppers.hdg_implicit import (
    IncompressibleEulerHDGImplicit,
)
from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
    IncompressibleEulerHDGIMEXSSP2_332,
    IncompressibleEulerHDGIMEXImplicit,
)


def run_taylor_green(stepper_cls, nx, degree, dt, tfinal=0.2, **kwargs):
    disc = HDGDiscretisation(unit_square_mesh(nx), degree)
    stepper = stepper_cls(disc, dt, **kwargs)
    problem = TaylorGreen(disc)
    Q0, p0 = problem.initial_condition()
    Q, p = stepper.solve(Q0, p0, None, problem.f_rhs(), tfinal)
    Q_exact, p_exact = problem.solution(tfinal)
    errQ = stepper.velocity_error_norm(Q, Q_exact)
    errp = stepper.pressure_error_norm(p, p_exact)
    return errQ, errp


def test_hdg_implicit_projection_taylor_green():
    """First-order scheme: errors O(dt); halving dt+h halves the error."""
    e1Q, e1p = run_taylor_green(IncompressibleEulerHDGImplicit, 4, 1, 0.05)
    e2Q, e2p = run_taylor_green(IncompressibleEulerHDGImplicit, 8, 1, 0.025)
    assert e1Q < 0.1
    assert e2Q < 0.6 * e1Q, (e1Q, e2Q)
    assert e2p < 0.75 * e1p, (e1p, e2p)


def test_hdg_imex_implicit_matches_hdg_implicit_order():
    """The 2-stage IMEX 'implicit' tableau is first order as well."""
    e1Q, _ = run_taylor_green(IncompressibleEulerHDGIMEXImplicit, 4, 1, 0.05)
    e2Q, _ = run_taylor_green(IncompressibleEulerHDGIMEXImplicit, 8, 1, 0.025)
    assert e1Q < 0.1
    assert e2Q < 0.6 * e1Q, (e1Q, e2Q)


def test_hdg_imex_ssp2_second_order():
    """SSP2(3,3,2): second order in time; refining (h, dt) by 2 cuts the
    velocity error by ~4 once spatial error is subdominant."""
    e1Q, _ = run_taylor_green(IncompressibleEulerHDGIMEXSSP2_332, 4, 1, 0.1)
    e2Q, _ = run_taylor_green(IncompressibleEulerHDGIMEXSSP2_332, 8, 1, 0.05)
    assert e1Q < 0.05
    rate = np.log2(e1Q / e2Q)
    assert rate > 1.5, (e1Q, e2Q, rate)
