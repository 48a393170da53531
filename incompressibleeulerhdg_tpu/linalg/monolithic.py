"""Monolithic coupled (u, p, lambda) stage solve via projection-preconditioned
Richardson iteration.

The reference solves the unsplit stage system with GMRES + MUMPS LU
(/root/reference/src/timesteppers/hdg_imex.py:600-620, dg/hdg monolithic
branches).  A sparse direct factorisation is the wrong tool on TPU; instead we
iterate the *same* projection preconditioner the reference uses for its
Richardson iteration (hdg_imex.py:568-599) to convergence:

    repeat:
      1. tentative solve   (M - c f_impl) dQ~ = r_u-row residual
      2. mixed-Poisson solve with rhs -(1/c) weak_div(psi, dQ~)
      3. x += (dQ~ + c du, dp, dlam)
    until the full-system residual is below rtol

Because the advective coupling enters at O(c) = O(dt), this converges
geometrically for timestep sizes of practical interest and reproduces the
monolithic solution to solver tolerance.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import fields as F
from ..ops.forms import f_impl_apply, pressure_gradient_apply, gamma_apply, weak_divergence_apply
from .pressure import pressure_solve
from .tentative import tentative_solve
from .preconditioners import tentative_block_jacobi_build

__all__ = ["monolithic_stage_solve", "coupled_matvec"]


def coupled_matvec(geom, star, Q, p, lam, c, alpha=1.0, upwind=True, tau=1.0):
    """Apply the monolithic stage operator.

    r_u   = M Q - c f_impl(Q, Q*) - c g(p, lam)
    (r_p, r_lam) = Gamma(Q, p, lam)
    (reference a_implicit, hdg_imex.py:602-609)
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
    rtol=1.0e-12,
    max_outer=60,
    inner_rtol=1.0e-12,
    x0=None,
    precond=None,
):
    """Solve the coupled stage system with b on the u-rows and 0 on Gamma rows.

    :returns: (Q, p, lam, total tentative iters, total pressure iters)
    """
    dtype = b_u.dtype
    nf, nt = geom.n_facets, cs.nt
    if x0 is None:
        Q = jnp.zeros_like(b_u)
        p = jnp.zeros((geom.n_cells, geom.d0), dtype)
        lam = jnp.zeros((nf, nt), dtype)
    else:
        Q, p, lam = x0

    blocks_inv = tentative_block_jacobi_build(geom, star, c, alpha, upwind)
    bnorm = jnp.sqrt(jnp.sum(b_u**2))
    target = rtol * bnorm

    def residual(Q, p, lam):
        r_u, r_p, r_lam = coupled_matvec(geom, star, Q, p, lam, c, alpha, upwind, cs.tau)
        return b_u - r_u, -r_p, -r_lam

    def res_norm(r_u, r_p, r_lam):
        return jnp.sqrt(jnp.sum(r_u**2) + jnp.sum(r_p**2) + jnp.sum(r_lam**2))

    def body(state):
        Q, p, lam, _, it_t, it_p, k = state
        r_u, r_p, r_lam = residual(Q, p, lam)
        dQt, n_t = tentative_solve(
            geom, star, r_u, c, alpha=alpha, upwind=upwind,
            rtol=inner_rtol, blocks_inv=blocks_inv,
        )
        f_p = (-1.0 / c) * weak_divergence_apply(geom, dQt) + r_p
        du, dp, dlam, n_p = pressure_solve(
            geom, cs, jnp.zeros_like(r_u), f_p, r_lam, rtol=inner_rtol,
            precond=precond,
        )
        Q = Q + dQt + c * du
        p = p + dp
        lam = lam + dlam
        r = res_norm(*residual(Q, p, lam))
        return Q, p, lam, r, it_t + n_t, it_p + n_p, k + 1

    def cond(state):
        _, __, ___, r, _it, _ip, k = state
        return jnp.logical_and(r > target, k < max_outer)

    r0 = res_norm(*residual(Q, p, lam))
    state = (Q, p, lam, r0, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    Q, p, lam, r, it_t, it_p, _ = lax.while_loop(cond, body, state)
    return Q, p, lam, it_t, it_p
