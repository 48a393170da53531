"""Monolithic coupled (u, p, lambda) stage solve.

The reference solves the unsplit stage system with GMRES + MUMPS LU
(/root/reference/src/timesteppers/hdg_imex.py:600-620 and the monolithic
branches of hdg_implicit/dg_implicit).  A sparse direct factorisation is the
wrong tool on TPU; instead we run FGMRES on the coupled system with the
*projection method as preconditioner* — one approximate cycle of

    tentative solve   (M - c f_impl) dQ~ = r_u
    mixed-Poisson     rhs (-1/c) weak_div(psi, dQ~) + r_p rows, r_lam rows
    delta = (dQ~ + c du, dp, dlam)

per preconditioner application (the same cycle the reference's Richardson
iteration applies, hdg_imex.py:568-599, but wrapped in a flexible Krylov
method so it converges for any timestep size).  The constant-pressure
nullspace (0, 1, 1) is deflated exactly as in the split path.
"""

import jax
import jax.numpy as jnp

from ..ops import fields as F
from ..ops.forms import f_impl_apply, pressure_gradient_apply, gamma_apply, weak_divergence_apply
from .pressure import pressure_solve
from .tentative import tentative_solve
from .preconditioners import build_tentative_operator, tentative_operator_matvec
from .krylov import fgmres

__all__ = ["monolithic_stage_solve", "coupled_matvec"]


def coupled_matvec(geom, star, Q, p, lam, c, alpha=1.0, upwind=True, tau=1.0):
    """Apply the monolithic stage operator (reference a_implicit,
    hdg_imex.py:602-609):

    r_u   = M Q - c f_impl(Q, Q*) - c g(p, lam)
    (r_p, r_lam) = Gamma(Q, p, lam)
    """
    r_u = (
        F.mass_apply(geom, geom.m1, Q)
        - c * f_impl_apply(geom, star, Q, alpha, upwind)
        - c * pressure_gradient_apply(geom, p, lam)
    )
    r_p, r_lam = gamma_apply(geom, Q, p, lam, tau)
    return r_u, r_p, r_lam


def monolithic_stage_solve(
    geom,
    cs,
    star,
    b_u,
    c,
    *,
    alpha=1.0,
    upwind=True,
    rtol=1.0e-11,
    inner_rtol=1.0e-6,
    x0=None,
    precond=None,
    restart=20,
    maxiter=100,
):
    """Solve the coupled stage system with b on the u-rows and 0 on Gamma rows.

    :returns: (Q, p, lam, fgmres iters, fgmres iters)
    """
    dtype = b_u.dtype
    nc, d1 = geom.n_cells, geom.d1
    d0, nf, nt = geom.d0, geom.n_facets, cs.nt
    nu = nc * d1 * 2
    np_ = nc * d0

    def flat(u, p, lam):
        return jnp.concatenate([u.ravel(), p.ravel(), lam.ravel()])

    def unflat(v):
        u = v[:nu].reshape(2, d1, nc)
        p = v[nu : nu + np_].reshape(d0, nc)
        lam = v[nu + np_ :].reshape(nt, nf)
        return u, p, lam

    t_op = build_tentative_operator(geom, star, c, alpha, upwind)

    def matvec(v):
        u, p, lam = unflat(v)
        # u-rows via the assembled blocks (same operator, far cheaper than
        # re-deriving the weak form per Krylov iteration)
        r_u = tentative_operator_matvec(geom, t_op, u) - c * pressure_gradient_apply(
            geom, p, lam
        )
        r_p, r_lam = gamma_apply(geom, u, p, lam, cs.tau)
        return flat(r_u, r_p, r_lam)

    def M(v):
        r_u, r_p, r_lam = unflat(v)
        dQt, _, _ = tentative_solve(
            geom, star, r_u, c, alpha=alpha, upwind=upwind,
            rtol=inner_rtol, maxiter=60, op=t_op,
        )
        f_p = (-1.0 / c) * weak_divergence_apply(geom, dQt) + r_p
        du, dp, dlam, _, _ = pressure_solve(
            geom, cs, jnp.zeros_like(r_u), f_p, r_lam,
            rtol=inner_rtol, maxiter=60, precond=precond,
        )
        return flat(dQt + c * du, dp, dlam)

    # deflate the (0, 1_p, 1_lam) nullspace
    nullv = flat(
        jnp.zeros((2, d1, nc), dtype),
        jnp.ones((d0, nc), dtype),
        jnp.ones((nt, nf), dtype),
    )
    nullv = nullv / jnp.linalg.norm(nullv)

    def project(v):
        return v - nullv * jnp.dot(nullv, v)

    b = flat(b_u, jnp.zeros((d0, nc), dtype), jnp.zeros((nt, nf), dtype))
    x0flat = None if x0 is None else flat(*x0)
    x, iters, _ = fgmres(
        matvec, b, M=M, x0=x0flat, rtol=rtol, restart=restart, maxiter=maxiter,
        project=project,
    )
    Q, p, lam = unflat(x)
    return Q, p, lam, iters, iters
