"""Batched field evaluation primitives shared by all weak-form kernels.

Every operation maps DG coefficient arrays to quadrature-point values (or the
adjoint scatter back to test-function coefficients) as dense einsums over
``(n_cells, ...)`` / ``(n_facets, ...)`` — the TPU-native replacement for the
per-element C kernels TSFC generates for the reference's UFL forms.
"""

import jax.numpy as jnp

__all__ = [
    "cell_values",
    "cell_grads",
    "cell_div",
    "facet_traces",
    "trace_values",
    "scatter_facets",
    "facet_integrate_trace",
    "cell_integrate",
    "integral",
    "mass_apply",
    "mass_solve",
    "l2_norm_sq",
    "interior_mask",
]


def cell_values(phi, u):
    """Evaluate DG field at cell quadrature points: (nc, nd, ...) -> (nc, nq, ...)."""
    return jnp.einsum("qi,ci...->cq...", phi, u)


def cell_grads(geom, gphi, u):
    """Physical gradients at cell quadrature points.

    Returns (nc, nq, ..., 2) with last axis the spatial derivative direction:
    grad_x phi = jac_inv^T gradref phi.
    """
    gref = jnp.einsum("qib,ci...->cq...b", gphi, u)  # (nc, nq, ..., b)
    return jnp.einsum("cq...b,cba->cq...a", gref, geom.jac_inv)


def cell_div(geom, u):
    """Divergence of a velocity field at cell quadrature points: (nc, nq)."""
    g = cell_grads(geom, geom.gphi1, u)  # (nc, nq, 2comp, 2deriv)
    return g[..., 0, 0] + g[..., 1, 1]


def facet_traces(geom, tphi, u):
    """Both-side traces of a DG field at facet quadrature points.

    Returns (u_plus, u_minus), each (nf, nqf, ...).  For boundary facets the
    minus trace is garbage (clamped gather) — callers must mask it out with
    :func:`interior_mask`.
    """
    T0 = tphi[geom.ftab[:, 0]]  # (nf, nqf, nd)
    T1 = tphi[geom.ftab[:, 1]]
    u0 = jnp.einsum("fqi,fi...->fq...", T0, u[geom.fcells[:, 0]])
    u1 = jnp.einsum("fqi,fi...->fq...", T1, u[geom.fcells[:, 1]])
    return u0, u1


def trace_values(geom, lam):
    """Evaluate the DGT trace field at facet quadrature points: (nf, nqf)."""
    return jnp.einsum("qj,fj->fq", geom.tr, lam)


def interior_mask(geom, ndim=2):
    """(nf, 1, ...) float mask: 1 on interior facets, 0 on boundary."""
    m = (jnp.arange(geom.n_facets) < geom.n_int).astype(geom.wq.dtype)
    return m.reshape((-1,) + (1,) * (ndim - 1))


def gather_facet_contribs(geom, c0, c1):
    """Accumulate per-facet-side contributions into cells WITHOUT scatters.

    Each cell has exactly three facets, so the facet->cell scatter-add is
    re-expressed as two gathers + a select over ``cell_facets`` /
    ``cfside`` — scatters lower to slow serialized code on TPU while gathers
    vectorize.

    :arg c0/c1: (nf, ...) contributions targeting the plus / minus cell
    :returns: (nc, ...) summed per cell
    """
    cf = geom.cell_facets  # (nc, 3)
    side = geom.cfside  # (nc, 3) 0 plus / 1 minus
    a0 = c0[cf]  # (nc, 3, ...)
    a1 = c1[cf]
    sel = (side == 0).astype(c0.dtype).reshape(side.shape + (1,) * (c0.ndim - 1))
    return jnp.sum(jnp.where(sel > 0, a0, a1), axis=1)


def scatter_facets(geom, tphi, g0, g1):
    """Adjoint of facet trace evaluation: accumulate facet integrands into cells.

    r[c, i, ...] += sum_{facets of c} L_f sum_q wqf[q] T_side[f,q,i] g_side[f,q,...]

    :arg g0/g1: integrand multiplying the test function's plus/minus trace,
        shape (nf, nqf, ...).  g1 is masked to interior facets internally.
    """
    w = geom.flen[:, None] * geom.wqf[None, :]  # (nf, nqf)
    T0 = tphi[geom.ftab[:, 0]]
    T1 = tphi[geom.ftab[:, 1]]
    c0 = jnp.einsum("fq,fqi,fq...->fi...", w, T0, g0)
    g1 = g1 * interior_mask(geom, g1.ndim)
    c1 = jnp.einsum("fq,fqi,fq...->fi...", w, T1, g1)
    return gather_facet_contribs(geom, c0, c1)


def facet_integrate_trace(geom, integrand):
    """Integrate against the DGT test basis: (nf, nqf) -> (nf, nt)."""
    w = geom.flen[:, None] * geom.wqf[None, :]
    return jnp.einsum("fq,qj,fq->fj", w, geom.tr, integrand)


def cell_integrate(geom, phi, integrand):
    """Integrate a quadrature-point integrand against a cell test basis.

    (nc, nq, ...) -> (nc, nd, ...):  r = detJ * sum_q wq phi[q,i] g[c,q,...]
    """
    return jnp.einsum("c,q,qi,cq...->ci...", geom.det_jac, geom.wq, phi, integrand)


def integral(geom, phi, u):
    """Scalar integral of a DG field over the domain."""
    vals = cell_values(phi, u)
    return jnp.einsum("c,q,cq...->...", geom.det_jac, geom.wq, vals)


def mass_apply(geom, mref, u):
    """Apply the block-diagonal DG mass matrix (affine cells: detJ * M_ref)."""
    dj = geom.det_jac.reshape((-1,) + (1,) * (u.ndim - 1))
    return dj * jnp.einsum("ij,cj...->ci...", mref, u)


def mass_solve(geom, minv, r):
    """Solve M u = r for the block-diagonal DG mass matrix."""
    dj = geom.det_jac.reshape((-1,) + (1,) * (r.ndim - 1))
    return jnp.einsum("ij,cj...->ci...", minv, r) / dj


def l2_norm_sq(geom, phi, u):
    """Squared L2 norm of a DG field (scalar or vector)."""
    vals = cell_values(phi, u)
    sq = vals**2 if vals.ndim == 2 else jnp.sum(vals**2, axis=-1)
    return jnp.einsum("c,q,cq->", geom.det_jac, geom.wq, sq)
