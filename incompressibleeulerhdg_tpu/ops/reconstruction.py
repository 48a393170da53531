"""Right-hand side of the IMEX pressure reconstruction solve.

Rebuild of the reference's ``b_rhs_pressure_reconstruction``
(/root/reference/src/timesteppers/hdg_imex.py:200-214):

    weak_div(psi, -f + (grad Q) Q) - mu (n . f) ds

where Q is the new velocity and f the forcing at t + dt.  The argument
G = -f + (grad Q) Q is evaluated pointwise: its cell divergence needs second
derivatives of Q (Hessian tabulations) and its facet traces need gradient
traces.
"""

import jax.numpy as jnp

from . import fields as F
from .forms import weak_divergence_values

__all__ = ["pressure_reconstruction_rhs", "facet_grad_traces"]


def facet_grad_traces(geom, u):
    """Physical gradient traces of a DG(k+1) field at facet quadrature.

    Returns (g_plus, g_minus), each (nf, nqf, ..., 2); last axis is the
    derivative direction.
    """
    out = []
    for side in (0, 1):
        T = geom.tgphi1[geom.ftab[:, side]]  # (nf, nqf, d1, 2)
        c = geom.fcells[:, side]
        gref = jnp.einsum("fqib,fi...->fq...b", T, u[c])
        out.append(jnp.einsum("fq...b,fba->fq...a", gref, geom.jac_inv[c]))
    return out[0], out[1]


def convective_term(geom, Q):
    """(grad Q) Q = (Q . grad) Q at cell quadrature points: (nc, nq, 2).

    UFL's ``dot(grad(Q), Q)`` (hdg_imex.py:205): (grad Q)_{ab} Q_b with
    (grad Q)_{ab} = d_b Q_a.
    """
    gQ = F.cell_grads(geom, geom.gphi1, Q)  # (nc, nq, a, d)
    Qq = F.cell_values(geom.phi1, Q)
    return jnp.einsum("cqad,cqd->cqa", gQ, Qq)


def pressure_reconstruction_rhs(geom, Q, f_nodal):
    """(f_p, f_lam) rows of the reconstruction solve.

    :arg Q: new velocity (nc, d1, 2)
    :arg f_nodal: forcing at t + dt interpolated into V_Q (nc, d1, 2)
    :returns: (psi-rows (nc, d0), mu-rows (nf, nt))
    """
    # --- cell divergence of G = -f + (grad Q) Q ---------------------------
    gQ = F.cell_grads(geom, geom.gphi1, Q)  # (nc, nq, a, d)
    Qq = F.cell_values(geom.phi1, Q)  # (nc, nq, 2)
    href = jnp.einsum("qibf,cia->cqabf", geom.hphi1, Q)
    hphys = jnp.einsum("cqabf,cbd,cfe->cqade", href, geom.jac_inv, geom.jac_inv)
    # div((grad Q) Q) = (d_b d_a Q_a) Q_b + (d_b Q_a)(d_a Q_b)
    term1 = jnp.einsum("cqaab,cqb->cq", hphys, Qq)
    term2 = jnp.einsum("cqad,cqda->cq", gQ, gQ)
    divG = -F.cell_div(geom, f_nodal) + term1 + term2

    # --- facet normal traces of G ----------------------------------------
    f0, f1 = F.facet_traces(geom, geom.tphi1, f_nodal)
    Q0, Q1 = F.facet_traces(geom, geom.tphi1, Q)
    g0, g1 = facet_grad_traces(geom, Q)
    G0 = jnp.einsum("fqad,fqd->fqa", g0, Q0) - f0
    G1 = jnp.einsum("fqad,fqd->fqa", g1, Q1) - f1
    Gn0 = jnp.einsum("fqa,fa->fq", G0, geom.normal)
    Gn1 = jnp.einsum("fqa,fa->fq", G1, geom.normal)

    f_p = weak_divergence_values(geom, divG, Gn0, Gn1)

    # --- boundary mu-row: -mu (n . f) ds ---------------------------------
    fn0 = jnp.einsum("fqa,fa->fq", f0, geom.normal)
    bnd = 1.0 - F.interior_mask(geom)
    f_lam = -F.facet_integrate_trace(geom, fn0 * bnd)
    return f_p, f_lam
