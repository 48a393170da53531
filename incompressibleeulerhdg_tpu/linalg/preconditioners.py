"""Preconditioners and assembled operators for the matrix-free Krylov solvers.

- TentativeOperator: the per-stage tentative velocity operator M - c f_impl
  assembled into batch-last dense blocks (own-cell D + facet cross blocks),
  applied as a block SpMV and preconditioned by multiplicative colored
  facet-pair Schwarz sweeps — the TPU-native replacement for the GMRES+ILU
  tentative solver of the reference (hdg_imex.py:224-228)
- facet-block Jacobi for the condensed trace system (the default when the
  GTMG two-level scheme of linalg/gtmg.py is not supplied)

All fields are batch-last with component-major local dofs (dof = a * d1 + i,
so a (2, d1, nc) field reshapes to (nu, nc) for free); all block tables are
(nu, nu, n) batch-last — batch-major (n, 20, 20) tables tile-pad 6-25x in
HBM on TPU.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fields import interior_mask
from .smallinv import gauss_jordan_inv_bl

_register_tentative_op = partial(
    jax.tree_util.register_dataclass,
    data_fields=["D", "Bx", "Cx", "Dinv", "Sinv", "Dinv0"],
    meta_fields=[],
)


def _register_tentative_op_wrap(cls):
    return _register_tentative_op(dataclass(cls))


__all__ = [
    "trace_block_jacobi",
    "TentativeOperator",
    "build_tentative_operator",
    "tentative_operator_matvec",
    "tentative_patch_apply",
    "tentative_colored_apply",
]


def trace_block_jacobi(cs):
    """Return a flat-vector preconditioner applying per-facet inverse diagonal
    blocks (batch-last storage, (nt, nf) trace layout)."""
    nt = cs.nt

    def M(v):
        lam = v.reshape(nt, -1)
        return jnp.einsum("ijf,jf->if", cs.Sdiag_inv, lam).ravel()

    return M


@_register_tentative_op_wrap
class TentativeOperator:
    """Assembled per-stage tentative operator M - c f_impl + its patch factors.

    The Krylov matvec uses the SAME blocks as the Schwarz patches: assembling
    once per stage and applying dense blocks replaces re-deriving the weak
    form from tabulations per application.
    """

    D: jnp.ndarray  # (nu, nu, nc) own-cell blocks
    Bx: jnp.ndarray  # (nu, nu, nf) -c K01: plus-test rows, minus-side trial
    Cx: jnp.ndarray  # (nu, nu, nf) -c K10: minus-test rows, plus-side trial
    Dinv: jnp.ndarray  # (nu, nu, nc)
    Sinv: jnp.ndarray  # (nu, nu, nf) patch Schur inverses
    Dinv0: jnp.ndarray  # (nu, nu, nf) Dinv gathered to each facet's plus cell
    # (stored: gathering 400-element columns per application runs at
    # per-element DRAM speed — measured 183 ms per gather at 512^2)
    #
    # NOTE: bf16 table copies for the preconditioner were tried TWICE and are
    # a dead end — both the patch Schur factors (iterations 20 -> 60-210 at
    # 384^2) and the sweep's residual-update matvec tables (GMRES stalled at
    # maxiter from 128^2 up).  The sweep computes r - A z with z ~ A^{-1} r,
    # so table rounding is amplified by cond(A) ~ alpha * nx (the
    # penalty/mass entry ratio): eps_bf16 * cond crosses O(1) around
    # nx ~ 128.  Small-mesh CPU checks pass and prove nothing.


def _bm(A, x):
    """Batch-last block matvec: (nu, nu, n) x (nu, n) -> (nu, n).

    einsum form: XLA fuses the multiply-reduce without materialising the
    table-sized (nu, nu, n) product temporary of the broadcast form.
    """
    return jnp.einsum("ijn,jn->in", A, x)


def _bmm(A, B):
    """Batch-last block matmul: (n, n, m) x (n, n, m) -> (n, n, m).

    Unrolled over the contraction index as lane-parallel FMAs: einsum /
    dot_general with the batch in the minor dim relayouts the operands to
    batch-major (25x padded) and is measured ~8x slower at this size.
    """
    out = 0.0
    for k in range(A.shape[1]):
        out = out + A[:, k, None, :] * B[None, k, :, :]
    return out


def build_tentative_operator(geom, star, c, alpha=1.0, upwind=True, pc_dtype=None):
    """Assemble blocks + facet-pair Schwarz factors per stage, batch-last.

    The 2x2 cell-block patch  [[D_plus, -c K01], [-c K10, D_minus]]  is
    factorised in block-Schur form: per-cell D^{-1} (shared by the patches
    containing each cell) + per-facet nu x nu Schur inverse.  This resolves
    the O(alpha/h) normal-jump penalty couplings that make block Jacobi
    degrade under mesh refinement — the TPU-native analogue of the
    reference's ILU preconditioner (hdg_imex.py:224-228).

    Assembly strategy (everything batch-last; no batch-major transients):
    every facet integrand separates into STATIC reference-table factors and
    per-entity coefficients, so blocks are sums of
       (static (d1, d1, nqf) tables) x (per-entity (nqf, n) coefficients)
    GEMMs plus rank-one n (x) n penalty terms with per-entity scalars.  The
    6 facet trace tables enter via one-hot masks on the per-entity
    coefficients, never via (n, nqf, d1) table gathers (which tile-pad ~13x
    and dominated the previous build at 1.7 s per stage).
    """
    star_bl, snq = star  # (2, d1, nc), (nqf, nf)
    d1 = geom.d1
    nu = 2 * d1
    nc = geom.n_cells
    nf = geom.n_facets
    nqf = geom.wqf.shape[0]
    dtype = star_bl.dtype
    eye2 = jnp.eye(2, dtype=dtype)
    upw = 1.0 if upwind else 0.0

    # ------------------------------------------------------------------
    # own-cell blocks D = mass - c * f_impl_own
    # ------------------------------------------------------------------
    # volume convection  +c * int phi_i (Q*.grad) phi_j  (= -c * vol_f_impl)
    star_q = jnp.einsum("qi,aic->aqc", geom.phi1, star_bl)  # (2, nq, nc)
    jinv = geom.jac_inv
    # 2-term elementwise contraction (lane-batched einsum would relayout)
    R = jnp.stack(
        [
            jinv[b, 0][None, :] * star_q[0] + jinv[b, 1][None, :] * star_q[1]
            for b in (0, 1)
        ]
    )  # (2=b, nq, nc)
    Gvol = jnp.einsum("q,qi,qjb->ijbq", geom.wq, geom.phi1, geom.gphi1)
    S_own = c * geom.det_jac[None, None, :] * jnp.einsum("ijbq,bqc->ijc", Gvol, R)
    # mass
    S_own = S_own + geom.det_jac[None, None, :] * geom.m1[:, :, None]

    # facet terms accumulated per trace table t via one-hot masks:
    #   scalar (delta_ab):  -c * (0.5 sgn sn - upw |sn|) , interior only
    #   penalty (n (x) n):  +c * alpha / h_F              , all facets
    Gt = jnp.einsum("tqi,tqj->tijq", geom.tphi1, geom.tphi1)  # (6, d1, d1, nqf)
    Pt = jnp.einsum("q,tqi,tqj->tij", geom.wqf, geom.tphi1, geom.tphi1)  # (6, d1, d1)
    Ct = jnp.zeros((6, nqf, nc), dtype)
    NNt = jnp.zeros((6, 2, 2, nc), dtype)
    if geom.shift is not None:
        # facet values per cell slot as slices/rolls — keeps the per-stage
        # build gather-free AND slab-local (cross-slab slot values arrive
        # through the distributed shift in ops/structured.py)
        from ..ops.structured import slot_gather

        sn_slots = slot_gather(geom, snq)
        flen_slots = slot_gather(geom, geom.flen)
        hfi_slots = slot_gather(geom, geom.hF_inv)
        nrm_slots = slot_gather(geom, geom.normal)
    for l in range(3):
        if geom.shift is not None:
            sn_l, flen_l = sn_slots[l], flen_slots[l]
            hfi_l, n_l = hfi_slots[l], nrm_slots[l]
        else:
            fl = geom.cell_facets[l]
            sn_l = snq[:, fl]  # (nqf, nc)
            flen_l = geom.flen[fl]
            hfi_l = geom.hF_inv[fl]
            n_l = geom.normal[:, fl]  # (2, nc)
        int_l = 1.0 - geom.cf_bnd[l].astype(dtype)  # (nc,)
        w_l = geom.wqf[:, None] * flen_l[None, :]  # (nqf, nc)
        coeff = (-c) * (
            0.5 * geom.cfsign[l][None, :] * sn_l - upw * jnp.abs(sn_l)
        ) * w_l * int_l[None, :]
        pen_l = c * alpha * hfi_l * flen_l  # (nc,)
        nn_l = n_l[:, None, :] * n_l[None, :, :]  # (2, 2, nc)
        onehot = (geom.cf_tab[l][None, :] == jnp.arange(6)[:, None]).astype(dtype)
        Ct = Ct + onehot[:, None, :] * coeff[None, :, :]
        NNt = NNt + onehot[:, None, None, :] * (pen_l[None, None, :] * nn_l)[None]
    S_own = S_own + jnp.einsum("tijq,tqc->ijc", Gt, Ct)
    pen5 = sum(
        Pt[t][None, :, None, :, None] * NNt[t][:, None, :, None, :]
        for t in range(6)
    )
    D5 = jnp.einsum("ab,ijc->aibjc", eye2, S_own) + pen5
    D_bl = D5.reshape(nu, nu, nc)
    Dinv_bl = gauss_jordan_inv_bl(D_bl)

    # ------------------------------------------------------------------
    # cross blocks Bx = -c K01 (plus rows, minus cols), Cx = -c K10
    # ------------------------------------------------------------------
    # per-facet trace tables selected by one-hot sums (static per mesh):
    onehot0 = (geom.ftab[0][None, :] == jnp.arange(6)[:, None]).astype(dtype)
    onehot1 = (geom.ftab[1][None, :] == jnp.arange(6)[:, None]).astype(dtype)
    # (nqf, d1, nf) per-facet trace tables, elementwise-built and consumed
    # only by unrolled FMA loops (lane-minor layout survives)
    U0 = sum(onehot0[t][None, None, :] * geom.tphi1[t][:, :, None] for t in range(6))
    U1 = sum(onehot1[t][None, None, :] * geom.tphi1[t][:, :, None] for t in range(6))
    msk = interior_mask(geom, 1)  # (nf,)
    wf = geom.wqf[:, None] * geom.flen[None, :]  # (nqf, nf)
    s01 = (-c) * (-0.5 * snq + upw * jnp.abs(snq)) * wf * msk[None, :]
    s10 = (-c) * (+0.5 * snq + upw * jnp.abs(snq)) * wf * msk[None, :]
    penf = (-c) * alpha * geom.hF_inv * msk  # (nf,)
    nnf = geom.normal[:, None, :] * geom.normal[None, :, :]  # (2, 2, nf)

    K01s = sum(
        U0[q, :, None, :] * (U1[q] * s01[q][None, :])[None, :, :]
        for q in range(nqf)
    )
    K01p = sum(
        U0[q, :, None, :] * (U1[q] * wf[q][None, :])[None, :, :]
        for q in range(nqf)
    ) * penf[None, None, :]
    Bx = (
        jnp.einsum("ab,ijf->aibjf", eye2, K01s)
        + K01p[None, :, None, :, :] * nnf[:, None, :, None, :]
    ).reshape(nu, nu, nf)
    K10s = sum(
        U1[q, :, None, :] * (U0[q] * s10[q][None, :])[None, :, :]
        for q in range(nqf)
    )
    K10p = sum(
        U1[q, :, None, :] * (U0[q] * wf[q][None, :])[None, :, :]
        for q in range(nqf)
    ) * penf[None, None, :]
    Cx = (
        jnp.einsum("ab,ijf->aibjf", eye2, K10s)
        + K10p[None, :, None, :, :] * nnf[:, None, :, None, :]
    ).reshape(nu, nu, nf)
    # multi-consumer tables: materialise so XLA does not refuse (= recompute)
    # their producer chains into every consumer
    Bx, Cx = jax.lax.optimization_barrier((Bx, Cx))

    # ------------------------------------------------------------------
    # patch Schur factors  S = D_minus - Cx Dinv_plus Bx
    # ------------------------------------------------------------------
    eye = jnp.eye(nu, dtype=dtype)
    store = pc_dtype or dtype
    if geom.shift is not None:
        # structured: per-color D gathers are rect slices/rolls, and Dinv0
        # need not be stored at all — the patch solve re-slices op.Dinv
        # (saves 400*nf floats of HBM and the 400-row gathers of the build)
        from ..ops import structured as st

        Dup = st.grid_halves(geom, D_bl)[1]
        Dinv_lo = st.grid_halves(geom, Dinv_bl)[0]
        Sinv_parts = []
        for k, (l, lu, i0, j0, ni, nj, off) in enumerate(geom.shift[4]):
            rect = (i0, j0, ni, nj)
            b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
            D1 = st.rect_flat(st.roll2(geom, Dup, off), rect)
            Dinv0_k = st.rect_flat(Dinv_lo, rect)
            Sc = D1 - _bmm(Cx[:, :, b0:b1], _bmm(Dinv0_k, Bx[:, :, b0:b1]))
            if geom.fint is not None:
                # slab-local layout: color rects include boundary/dummy
                # positions — give them an identity Schur block (the patch
                # solve masks their corrections out)
                Sc = jnp.where(
                    geom.fint[b0:b1][None, None, :] > 0, Sc, eye[:, :, None]
                )
            Sinv_parts.append(gauss_jordan_inv_bl(Sc).astype(store))
        nbnd = nf - geom.n_int
        if nbnd:
            Sinv_parts.append(
                jnp.broadcast_to(eye[:, :, None], (nu, nu, nbnd)).astype(store)
            )
        return TentativeOperator(
            D=D_bl,
            Bx=Bx,
            Cx=Cx,
            Dinv=Dinv_bl,
            Sinv=jnp.concatenate(Sinv_parts, axis=2),
            Dinv0=None,
        )

    # chunked over facets: the unchunked chain holds D1, two _bmm
    # temporaries, Sc and Sinv live simultaneously (~7 GB at 512^2, the
    # single-chip OOM margin); per-chunk temporaries are freed eagerly.
    # pc_dtype (bf16 on the f32 fast path) halves the STORED factors — they
    # only steer the preconditioner, convergence is judged on the f32 matvec.
    n_chunks = 4 if nf > 200000 else 1
    bounds = [round(i * nf / n_chunks) for i in range(n_chunks + 1)]
    Sinv_chunks, Dinv0_chunks = [], []
    for f0, f1 in zip(bounds[:-1], bounds[1:]):
        fsl = slice(f0, f1)
        Dinv0_c = jax.lax.optimization_barrier(
            Dinv_bl[:, :, geom.fcells[0, fsl]]
        )
        D1_c = D_bl[:, :, geom.fcells[1, fsl]]
        Sc = D1_c - _bmm(Cx[:, :, fsl], _bmm(Dinv0_c, Bx[:, :, fsl]))
        Sc = jnp.where(msk[fsl][None, None, :] > 0, Sc, eye[:, :, None])
        Sinv_chunks.append(gauss_jordan_inv_bl(Sc).astype(store))
        Dinv0_chunks.append(Dinv0_c.astype(store))
    Sinv = jnp.concatenate(Sinv_chunks, axis=2)
    Dinv0 = jnp.concatenate(Dinv0_chunks, axis=2)

    return TentativeOperator(
        D=D_bl, Bx=Bx, Cx=Cx, Dinv=Dinv_bl, Sinv=Sinv, Dinv0=Dinv0
    )


def _gather_sides_bl(geom, ub):
    """Plus/minus cell columns of a (nu, nc) field: two (nu, nf) moves.

    Structured meshes: slices/rolls (ops/structured.py); otherwise lane
    gathers (per-element DRAM speed on TPU — the 512^2 matvec ceiling)."""
    if geom.shift is not None:
        from ..ops.structured import gather_plus, gather_minus

        return gather_plus(geom, ub), gather_minus(geom, ub)
    msk = interior_mask(geom, 1)[None, :]
    u0 = ub[:, geom.fcells[0]]
    u1 = ub[:, geom.fcells[1]] * msk
    return u0, u1


def _assemble_cells_bl(geom, z0, z1):
    """Facet->cell assembly: (nu, nf) sides -> (nu, nc) sum.

    One lane gather per local facet from the side-concatenated array
    (scatters serialize on TPU; every cell has exactly three facets);
    slices/rolls on structured meshes.
    """
    if geom.shift is not None:
        from ..ops.structured import scatter_sides_sum

        return scatter_sides_sum(geom, z0, z1)
    zcat = jnp.concatenate([z0, z1], axis=1)  # (nu, 2 nf)
    out = 0.0
    for l in range(3):
        out = out + zcat[:, geom.cfassemble[l]]
    return out


def _matvec_bl(geom, op, ub):
    """Assembled-block application on a component-major (nu, nc) field."""
    r = _bm(op.D, ub)
    msk = interior_mask(geom, 1)[None, :]
    u0, u1 = _gather_sides_bl(geom, ub)
    z0 = _bm(op.Bx, u1)  # contribution to plus-cell rows
    z1 = _bm(op.Cx, u0) * msk  # minus-cell rows (zero on boundary)
    return r + _assemble_cells_bl(geom, z0, z1)


def tentative_operator_matvec(geom, op, u):
    """Assembled-block application of M - c f_impl: (2, d1, nc) -> same."""
    _, d1, nc = u.shape
    return _matvec_bl(geom, op, u.reshape(2 * d1, nc)).reshape(2, d1, nc)


def _patch_apply_bl(geom, op, rb):
    """Additive Schwarz on a component-major (nu, nc) residual."""
    msk = interior_mask(geom, 1)[None, :]
    r0, r1 = _gather_sides_bl(geom, rb)
    Dinv0 = op.Dinv0
    if Dinv0 is None:  # structured build does not store Dinv0 (diagnostic path)
        from ..ops.structured import gather_plus

        Dinv0 = gather_plus(geom, op.Dinv)
    t = r1 - _bm(op.Cx, _bm(Dinv0, r0))
    y1 = _bm(op.Sinv, t) * msk
    y0 = _bm(Dinv0, r0 - _bm(op.Bx, y1))
    return _assemble_cells_bl(geom, y0, y1) / 3.0


def tentative_patch_apply(geom, op, r):
    """Additive-Schwarz facet-patch preconditioner (batch-last tables).

    Per interior facet:  y1 = Sinv (r1 - C D0inv r0);  y0 = D0inv (r0 - B y1);
    partition-of-unity weight 1/3 (every cell sits in exactly 3 patches).
    """
    _, d1, nc = r.shape
    return _patch_apply_bl(geom, op, r.reshape(2 * d1, nc)).reshape(2, d1, nc)


def _patch_color(geom, op, k, rb):
    """Exact solves of the disjoint facet-pair patches of one color.

    :arg rb: residual (nu, nc) component-major; returns (nu, nc), zero on
        cells without a color-k facet (those are untouched by this sweep).
    """
    b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
    r0 = rb[:, geom.fcells[0, b0:b1]]  # (nu, nfk)
    r1 = rb[:, geom.fcells[1, b0:b1]]
    Dinv0 = op.Dinv0[:, :, b0:b1]
    t = r1 - _bm(op.Cx[:, :, b0:b1], _bm(Dinv0, r0))
    y1 = _bm(op.Sinv[:, :, b0:b1], t)
    y0 = _bm(Dinv0, r0 - _bm(op.Bx[:, :, b0:b1], y1))
    ycat = jnp.concatenate([y0, y1], axis=1)  # (nu, 2 nfk)
    idx = geom.fcol_pos[k] + geom.fcol_side[k] * (b1 - b0)
    return ycat[:, idx] * geom.fcol_mask[k][None, :]


def _patch_color_structured(geom, op, k, rb):
    """Structured-mesh variant of :func:`_patch_color`: the per-color
    facet<->cell moves are rect slices/rolls on the [lowers; uppers] grid
    (ops/structured.py) and the plus-cell block inverse is re-sliced from
    ``op.Dinv`` instead of a stored gathered copy."""
    from ..ops import structured as st

    l, lu, i0, j0, ni, nj, off = geom.shift[4][k]
    rect = (i0, j0, ni, nj)
    b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
    lo, up = st.grid_halves(geom, rb)
    r0 = st.rect_flat(lo, rect)
    r1 = st.rect_flat(st.roll2(geom, up, off), rect)
    Dinv0 = st.rect_flat(st.grid_halves(geom, op.Dinv)[0], rect)
    t = r1 - _bm(op.Cx[:, :, b0:b1], _bm(Dinv0, r0))
    y1 = _bm(op.Sinv[:, :, b0:b1], t)
    y0 = _bm(Dinv0, r0 - _bm(op.Bx[:, :, b0:b1], y1))
    if geom.fint is not None:
        # slab-local layout: no patch correction at the boundary/dummy
        # positions inside the full rects (matches the global layout, whose
        # colors contain interior facets only)
        m = geom.fint[b0:b1][None, :]
        y0 = y0 * m
        y1 = y1 * m
    z_lo = st.rect_pad(geom, y0, rect)
    z_up = st.roll2(geom, st.rect_pad(geom, y1, rect), (-off[0], -off[1]))
    return st.grid_join(geom, z_lo, z_up)


def _colored_apply_bl(geom, op, rb, symmetric=False):
    """Multiplicative colored sweep on a component-major (nu, nc) residual.

    ``symmetric=True`` continues the sweep back through the colors in
    reverse order (block-SSOR-like): stronger per application at the cost of
    ncol-1 extra patch solves + matvecs.
    """
    ncol = len(geom.fcol_bounds) - 1
    patch = _patch_color_structured if geom.shift is not None else _patch_color
    z = patch(geom, op, 0, rb)
    if geom.fcol_orphans:
        orphan = (jnp.sum(geom.fcol_mask, axis=0) == 0.0).astype(rb.dtype)
        z = z + _bm(op.Dinv, rb) * orphan[None, :]
    order = list(range(1, ncol))
    if symmetric:
        order += list(range(ncol - 2, -1, -1))
    for k in order:
        rk = rb - _matvec_bl(geom, op, z)
        z = z + patch(geom, op, k, rk)
    return z


def tentative_colored_apply(geom, op, r):
    """Multiplicative colored facet-pair Schwarz sweep.

    Block Gauss-Seidel over the conflict-free facet colors (interior facets
    are color-sorted in the mesh; on structured triangulations each color is
    a perfect matching of cells).  Solving the patches of one color exactly,
    updating the residual, and moving to the next color resolves the
    O(alpha/h) normal-jump penalty couplings *sequentially* — the TPU-native
    analogue of the reference's ILU sweep (hdg_imex.py:224-228), and a much
    stronger preconditioner than the additive facet-pair variant (which
    averages conflicting patch corrections with weight 1/3).
    """
    _, d1, nc = r.shape
    return _colored_apply_bl(geom, op, r.reshape(2 * d1, nc)).reshape(2, d1, nc)
