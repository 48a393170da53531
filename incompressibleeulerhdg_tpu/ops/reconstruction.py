"""Right-hand side of the IMEX pressure reconstruction solve.

Rebuild of the reference's ``b_rhs_pressure_reconstruction``
(/root/reference/src/timesteppers/hdg_imex.py:200-214):

    weak_div(psi, -f + (grad Q) Q) - mu (n . f) ds

where Q is the new velocity and f the forcing at t + dt.  The argument
G = -f + (grad Q) Q is evaluated pointwise: its cell divergence needs second
derivatives of Q (Hessian tabulations) and its facet traces need gradient
traces.  All fields batch-last: Q, f_nodal (2, d1, nc).
"""

import jax.numpy as jnp

from . import fields as F
from .forms import weak_divergence_values

__all__ = ["pressure_reconstruction_rhs", "facet_grad_traces"]


def facet_grad_traces(geom, u):
    """Physical gradient traces of a DG(k+1) field at facet quadrature.

    Returns (g_plus, g_minus), each (..., 2, nqf, nf); the new axis (before
    nqf) is the derivative direction.  Per-facet gradient-trace tables are
    assembled from the 6 static tables by one-hot sums over ``ftab``.
    """
    dtype = geom.wq.dtype
    out = []
    for side in (0, 1):
        oh = (geom.ftab[side][None, :] == jnp.arange(6)[:, None]).astype(dtype)
        T = jnp.einsum("tf,tqib->iqbf", oh, geom.tgphi1)  # (d1, nqf, 2, nf)
        c = geom.fcells[side]
        gref = jnp.einsum("iqbf,...if->...bqf", T, u[..., c])
        out.append(jnp.einsum("...bqf,baf->...aqf", gref, geom.jac_inv[:, :, c]))
    return out[0], out[1]


def convective_term(geom, Q):
    """(grad Q) Q = (Q . grad) Q at cell quadrature points: (2, nq, nc).

    UFL's ``dot(grad(Q), Q)`` (hdg_imex.py:205): (grad Q)_{ab} Q_b with
    (grad Q)_{ab} = d_b Q_a.
    """
    gQ = F.cell_grads(geom, geom.gphi1, Q)  # (2 comp a, 2 deriv d, nq, nc)
    Qq = F.cell_values(geom.phi1, Q)  # (2, nq, nc)
    return jnp.einsum("adqc,dqc->aqc", gQ, Qq)


def pressure_reconstruction_rhs(geom, Q, f_nodal):
    """(f_p, f_lam) rows of the reconstruction solve.

    :arg Q: new velocity (2, d1, nc)
    :arg f_nodal: forcing at t + dt interpolated into V_Q (2, d1, nc)
    :returns: (psi-rows (d0, nc), mu-rows (nt, nf))
    """
    # --- cell divergence of G = -f + (grad Q) Q ---------------------------
    gQ = F.cell_grads(geom, geom.gphi1, Q)  # (2 a, 2 d, nq, nc)
    Qq = F.cell_values(geom.phi1, Q)  # (2, nq, nc)
    # reference Hessian contraction: d_d d_e Q_a = hphi[q,i,b,f] jinv[b,d] jinv[f,e] Q[a,i]
    href = jnp.einsum("qibf,aic->abfqc", geom.hphi1, Q)  # (a, b, f, nq, nc)
    hphys = jnp.einsum("abfqc,bdc,fec->adeqc", href, geom.jac_inv, geom.jac_inv)
    # div((grad Q) Q) = (d_b d_a Q_a) Q_b + (d_b Q_a)(d_a Q_b)
    term1 = jnp.einsum("aabqc,bqc->qc", hphys, Qq)
    term2 = jnp.einsum("adqc,daqc->qc", gQ, gQ)
    divG = -F.cell_div(geom, f_nodal) + term1 + term2

    # --- facet normal traces of G ----------------------------------------
    f0, f1 = F.facet_traces(geom, geom.tphi1, f_nodal)  # (2, nqf, nf)
    Q0, Q1 = F.facet_traces(geom, geom.tphi1, Q)
    g0, g1 = facet_grad_traces(geom, Q)  # (2 a, 2 d, nqf, nf)
    G0 = jnp.einsum("adqf,dqf->aqf", g0, Q0) - f0
    G1 = jnp.einsum("adqf,dqf->aqf", g1, Q1) - f1
    Gn0 = jnp.einsum("aqf,af->qf", G0, geom.normal)
    Gn1 = jnp.einsum("aqf,af->qf", G1, geom.normal)

    f_p = weak_divergence_values(geom, divG, Gn0, Gn1)

    # --- boundary mu-row: -mu (n . f) ds ---------------------------------
    fn0 = jnp.einsum("aqf,af->qf", f0, geom.normal)
    bnd = 1.0 - F.interior_mask(geom)
    f_lam = -F.facet_integrate_trace(geom, fn0 * bnd)
    return f_p, f_lam
