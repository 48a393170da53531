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

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fields import interior_mask
from .smallinv import gauss_jordan_inv_bl


def _fact_wanted():
    """Whether uniform meshes should store FACTORED tentative tables.

    ``IEHDG_FACT=1/0`` overrides.  Default: ON (round 4) — measured on the
    TPU v5e (tools/microbench_fact.py at 512^2 k=2 f32: matvec 8.30 vs
    8.88 ms, symmetric colored apply 51.8 vs 60.7 ms; end-to-end bench.py:
    256^2 0.886 vs 0.946 s/step, 512^2 3.44 vs 3.82 s/step) with identical
    in-timestep iteration counts and velocity L2 error vs the analytic
    vortex.  Caveat recorded in BASELINE.md: on random-rhs stress solves at
    the f32 attainable-accuracy floor the factored patch factors cost ~33%
    more iterations (tools/bisect_tent.py: 112 vs 84 at 256^2) — that
    regime never occurs inside a timestep, where the smooth right-hand
    sides converge at rtol well above the floor.
    """
    flag = os.environ.get("IEHDG_FACT")
    if flag is not None:
        return flag == "1"
    return True

_register_tentative_op = partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "D",
        "Bx",
        "Cx",
        "Dinv",
        "Sinv",
        "Dinv0",
        "Sown",
        "Pcell",
        "Ks01",
        "Ks10",
        "Bp",
        "Cp",
    ],
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
    "dense_blocks",
]


def dense_blocks(geom, op):
    """Reconstruct the dense (D, Bx, Cx) block tables of a TentativeOperator.

    Identity on dense-table operators; expands the Kronecker factors of the
    factored (uniform structured mesh) representation.  Diagnostic/test
    helper — the hot paths never materialise these.
    """
    if op.Sown is None:
        return op.D, op.Bx, op.Cx
    Sown = flat_table(op.Sown)
    Ks01 = flat_table(op.Ks01)
    Ks10 = flat_table(op.Ks10)
    d1 = Sown.shape[0]
    nu = 2 * d1
    nc = Sown.shape[2]
    nf = geom.n_facets
    if op.Ks01.ndim == 5:
        # tiled tables live in the padded color layout and drop the
        # (all-zero) boundary tail — restore the global layout
        blk = _table_block(op.Ks01)
        Ks01 = _unpad_cols(geom, Ks01, blk, tail=nf - geom.fcol_bounds[-1])
        Ks10 = _unpad_cols(geom, Ks10, blk, tail=nf - geom.fcol_bounds[-1])
    elif Ks01.shape[2] < nf:
        pad = ((0, 0), (0, 0), (0, nf - Ks01.shape[2]))
        Ks01 = jnp.pad(Ks01, pad)
        Ks10 = jnp.pad(Ks10, pad)
    eye2 = jnp.eye(2, dtype=Sown.dtype)
    nch = geom.shift[0] * geom.shift[1]
    D = jnp.einsum("ab,ijc->aibjc", eye2, Sown).reshape(nu, nu, nc)
    D = D + jnp.concatenate(
        [
            jnp.broadcast_to(op.Pcell[0][:, :, None], (nu, nu, nch)),
            jnp.broadcast_to(op.Pcell[1][:, :, None], (nu, nu, nc - nch)),
        ],
        axis=2,
    )
    b = geom.fcol_bounds
    msk = interior_mask(geom, 1)

    def expand(Ks, Pk):
        X = jnp.einsum("ab,ijf->aibjf", eye2, Ks).reshape(nu, nu, nf)
        pen = jnp.zeros((nu, nu, nf), Sown.dtype)
        for k in range(len(b) - 1):
            pen = pen.at[:, :, b[k] : b[k + 1]].set(Pk[k][:, :, None])
        return X + pen * msk[None, None, :]

    return D, expand(Ks01, op.Bp), expand(Ks10, op.Cp)


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

    D: jnp.ndarray  # (nu, nu, nc) own-cell blocks (None on the factored path)
    Bx: jnp.ndarray  # (nu, nu, nf) -c K01: plus-test rows, minus-side trial
    Cx: jnp.ndarray  # (nu, nu, nf) -c K10: minus-test rows, plus-side trial
    Dinv: jnp.ndarray  # (nu, nu, nc)
    Sinv: jnp.ndarray  # (nu, nu, nf) patch Schur inverses
    Dinv0: jnp.ndarray  # (nu, nu, nf) Dinv gathered to each facet's plus cell
    # (stored: gathering 400-element columns per application runs at
    # per-element DRAM speed — measured 183 ms per gather at 512^2)
    #
    # FACTORED tables (uniform structured meshes, geom.uniform is not None;
    # the above dense D/Bx/Cx are None then).  The 2x2-component structure
    #     D  = eye2 (x) Sown + Pcell[half]          (Pcell constant per half)
    #     Bx = eye2 (x) Ks01 + Bp[color]            (Bp constant per color)
    #     Cx = eye2 (x) Ks10 + Cp[color]
    # cuts the matvec's HBM table traffic ~4x: the varying factors are
    # (d1, d1, .) scalar blocks instead of (nu, nu, .) = (2 d1, 2 d1, .)
    # vector blocks, and the penalty parts collapse to (nu, nu) constants
    # applied as MXU GEMMs.  The 5 effective matvecs per preconditioned GMRES
    # iteration (1 Krylov + 4 inside the symmetric colored sweep) made table
    # streaming the dominant step cost at 512^2 (BASELINE.md roofline).
    Sown: jnp.ndarray = None  # (d1, d1, nc) scalar own-cell blocks
    Pcell: jnp.ndarray = None  # (2, nu, nu) per-half constant penalty block
    Ks01: jnp.ndarray = None  # (d1, d1, nf) scalar cross blocks, plus rows
    Ks10: jnp.ndarray = None  # (d1, d1, nf) scalar cross blocks, minus rows
    Bp: jnp.ndarray = None  # (ncol, nu, nu) per-color constant cross penalty
    Cp: jnp.ndarray = None  # (ncol, nu, nu)
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


def build_tentative_operator(geom, star, c, alpha=1.0, upwind=True, pc_dtype=None,
                             reuse_factors=None):
    """Assemble blocks + facet-pair Schwarz factors per stage, batch-last.

    :arg reuse_factors: a previously built :class:`TentativeOperator` whose
        PRECONDITIONER factors (Dinv/Dinv0/Sinv) are reused instead of
        refactorised — the lagged-preconditioner mode (IEHDG_LAG_PC): the
        MATVEC tables are always rebuilt fresh from ``star`` (they define
        the operator, hence the converged solutions), so lagging can only
        move iteration counts, never results.  The factorisation is the
        compute-bound part of the build (round-5 profile: ~160 of ~240 ms
        at 512^2).  CAVEAT (round-5 measurement): reuse is only effective
        between builds with the SAME implicit coefficient ``c`` — the
        dominant penalty block scales with c, so factors for a different c
        precondition poorly (SSP2(3,3,2) has a_ii = 1/4, 1/4, 1/3: lagging
        stage-1 factors into stage 2 ballooned tentative iterations
        16 -> 112 at 512^2 f32).  The composite step therefore only reuses
        between stages whose a_ii match.

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
    # factored (Kronecker-structured) tables on uniform structured meshes:
    # see the TentativeOperator docstring
    factored = (
        geom.uniform is not None
        and geom.shift is not None
        and _fact_wanted()
    )

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
        onehot = (geom.cf_tab[l][None, :] == jnp.arange(6)[:, None]).astype(dtype)
        Ct = Ct + onehot[:, None, :] * coeff[None, :, :]
        if not factored:
            pen_l = c * alpha * hfi_l * flen_l  # (nc,)
            nn_l = n_l[:, None, :] * n_l[None, :, :]  # (2, 2, nc)
            NNt = NNt + onehot[:, None, None, :] * (pen_l[None, None, :] * nn_l)[None]
    S_own = S_own + jnp.einsum("tijq,tqc->ijc", Gt, Ct)
    if factored:
        # consumed by D_bl below AND stored: materialise once
        S_own = jax.lax.optimization_barrier(S_own)
        # penalty blocks collapse to per-half CONSTANTS: every cell of a
        # half has congruent facets (slots with fixed trace table, length,
        # normal direction — mesh/triangle_mesh.py:_attach_uniform_structure)
        halves_u = geom.uniform[1]
        Pcell_parts = []
        for h in (0, 1):
            Ph = jnp.zeros((2, d1, 2, d1), dtype)
            for (t, ln, nx_, ny_) in halves_u[h]:
                pen = c * alpha  # = c * alpha * hF_inv * flen, hF_inv = 1/flen
                nvec = jnp.asarray([nx_, ny_], dtype)
                nn = nvec[:, None] * nvec[None, :]
                Ph = Ph + pen * nn[:, None, :, None] * Pt[t][None, :, None, :]
            Pcell_parts.append(Ph.reshape(nu, nu))
        Pcell = jnp.stack(Pcell_parts)  # (2, nu, nu)
        nch = geom.shift[0] * geom.shift[1]
        if reuse_factors is not None:
            D_bl = None  # factored matvec never reads D; factors reused
        else:
            pen_cells = jnp.concatenate(
                [
                    jnp.broadcast_to(Pcell[0][:, :, None], (nu, nu, nch)),
                    jnp.broadcast_to(Pcell[1][:, :, None], (nu, nu, nc - nch)),
                ],
                axis=2,
            )
            D_bl = (
                jnp.einsum("ab,ijc->aibjc", eye2, S_own).reshape(nu, nu, nc)
                + pen_cells
            )
    else:
        pen5 = sum(
            Pt[t][None, :, None, :, None] * NNt[t][:, None, :, None, :]
            for t in range(6)
        )
        D5 = jnp.einsum("ab,ijc->aibjc", eye2, S_own) + pen5
        D_bl = D5.reshape(nu, nu, nc)
    # Pallas-tiled tables only ever read LOWER-half cell inverses (the color
    # rects' plus cells; the boundary tail is dropped from the padded
    # layout), and the in-place Gauss-Jordan is the compute-bound piece of
    # the stage build — invert half the cells there.  Every other path
    # (flat structured f64 incl. its upper-cell boundary tail, unstructured)
    # keeps the full-cell inverse.
    use_pallas_early = (
        factored
        and geom.shift is not None
        and _fact_block(geom) is not None
        and dtype == jnp.float32
    )
    if reuse_factors is not None:
        Dinv_bl = None  # reused from reuse_factors (early return below)
    elif use_pallas_early:
        nch_gj = geom.shift[0] * geom.shift[1]
        Dinv_bl = None
        Dinv_lo_only = gauss_jordan_inv_bl(D_bl[:, :, :nch_gj])
    else:
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
    K10s = sum(
        U1[q, :, None, :] * (U0[q] * s10[q][None, :])[None, :, :]
        for q in range(nqf)
    )
    if factored:
        # cross penalty blocks are per-color CONSTANTS (congruent facets):
        #   Bp_k = penf_k * (sum_q wqf U0 (x) U1 * flen_k) (x) (n_k (x) n_k)
        # with penf_k * flen_k = -c * alpha exactly (hF_inv = 1/flen)
        colors_u = geom.uniform[0]
        Bp_parts, Cp_parts = [], []
        for (t0, t1, ln, nx_, ny_) in colors_u:
            PM = jnp.einsum(
                "q,qi,qj->ij", geom.wqf, geom.tphi1[t0], geom.tphi1[t1]
            )
            nvec = jnp.asarray([nx_, ny_], dtype)
            nn = nvec[:, None] * nvec[None, :]
            coef = (-c) * alpha
            Bp_parts.append(
                coef * (nn[:, None, :, None] * PM[None, :, None, :]).reshape(nu, nu)
            )
            Cp_parts.append(
                coef * (nn[:, None, :, None] * PM.T[None, :, None, :]).reshape(nu, nu)
            )
        Bp = jnp.stack(Bp_parts)  # (ncol, nu, nu)
        Cp = jnp.stack(Cp_parts)
        Bx = Cx = None
        # multi-consumer tables: materialise so XLA does not refuse
        # (= recompute) their producer chains into every consumer
        K01s, K10s = jax.lax.optimization_barrier((K01s, K10s))
    else:
        K01p = sum(
            U0[q, :, None, :] * (U1[q] * wf[q][None, :])[None, :, :]
            for q in range(nqf)
        ) * penf[None, None, :]
        Bx = (
            jnp.einsum("ab,ijf->aibjf", eye2, K01s)
            + K01p[None, :, None, :, :] * nnf[:, None, :, None, :]
        ).reshape(nu, nu, nf)
        K10p = sum(
            U1[q, :, None, :] * (U0[q] * wf[q][None, :])[None, :, :]
            for q in range(nqf)
        ) * penf[None, None, :]
        Cx = (
            jnp.einsum("ab,ijf->aibjf", eye2, K10s)
            + K10p[None, :, None, :, :] * nnf[:, None, :, None, :]
        ).reshape(nu, nu, nf)
        # multi-consumer tables: materialise so XLA does not refuse
        # (= recompute) their producer chains into every consumer
        Bx, Cx = jax.lax.optimization_barrier((Bx, Cx))

    if reuse_factors is not None:
        # lagged preconditioner: fresh matvec tables + reused factors (the
        # factor layout — tiled/flat/dense — carries over unchanged)
        rf = reuse_factors
        if factored and rf.Ks01 is not None and rf.Ks01.ndim == 5:
            blk = _table_block(rf.Ks01)
            tt = lambda T: tile_table(T, blk)
            return TentativeOperator(
                D=None, Bx=None, Cx=None,
                Dinv=rf.Dinv, Sinv=rf.Sinv, Dinv0=rf.Dinv0,
                Sown=tt(S_own), Pcell=Pcell,
                Ks01=tt(_pad_cols(geom, K01s, blk)),
                Ks10=tt(_pad_cols(geom, K10s, blk)),
                Bp=Bp, Cp=Cp,
            )
        if factored:
            return TentativeOperator(
                D=None, Bx=None, Cx=None,
                Dinv=rf.Dinv, Sinv=rf.Sinv, Dinv0=rf.Dinv0,
                Sown=S_own, Pcell=Pcell, Ks01=K01s, Ks10=K10s,
                Bp=Bp, Cp=Cp,
            )
        return TentativeOperator(
            D=D_bl, Bx=Bx, Cx=Cx,
            Dinv=rf.Dinv, Sinv=rf.Sinv, Dinv0=rf.Dinv0,
        )

    # ------------------------------------------------------------------
    # patch Schur factors  S = D_minus - Cx Dinv_plus Bx
    # ------------------------------------------------------------------
    eye = jnp.eye(nu, dtype=dtype)
    store = pc_dtype or dtype
    if geom.shift is not None:
        # structured: per-color D gathers are rect slices/rolls at BUILD
        # time; the color-sorted Dinv0 slices are STORED contiguously (like
        # Sinv) — re-slicing op.Dinv per patch solve looked free but the
        # lane-strided color rects relayout at 108 GB/s vs 440 for the
        # contiguous color slices (tools/microbench_sweep.py, 512^2: the
        # single largest cost of the fused sweep).  Costs 400*nf floats of
        # HBM, already computed here for the Schur build.
        from ..ops import structured as st

        Dup = st.grid_halves(geom, D_bl)[1]
        if Dinv_bl is None:  # tiled path: lower-half-only inverse
            Dinv_lo = Dinv_lo_only.reshape(
                nu, nu, geom.shift[0], geom.shift[1]
            )
        else:
            Dinv_lo = st.grid_halves(geom, Dinv_bl)[0]
        Sinv_parts, Dinv0_parts = [], []
        for k, (l, lu, i0, j0, ni, nj, off) in enumerate(geom.shift[4]):
            rect = (i0, j0, ni, nj)
            b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
            D1 = st.rect_flat(st.roll2(geom, Dup, off), rect)
            Dinv0_k = st.rect_flat(Dinv_lo, rect)
            Dinv0_parts.append(Dinv0_k.astype(store))
            if factored:
                # reconstruct the dense color-slice cross blocks as
                # transients (the stored tables stay factored)
                Bx_k = (
                    jnp.einsum("ab,ijf->aibjf", eye2, K01s[:, :, b0:b1])
                ).reshape(nu, nu, b1 - b0) + Bp[k][:, :, None]
                Cx_k = (
                    jnp.einsum("ab,ijf->aibjf", eye2, K10s[:, :, b0:b1])
                ).reshape(nu, nu, b1 - b0) + Cp[k][:, :, None]
            else:
                Bx_k = Bx[:, :, b0:b1]
                Cx_k = Cx[:, :, b0:b1]
            Sc = D1 - _bmm(Cx_k, _bmm(Dinv0_k, Bx_k))
            if geom.fint is not None:
                # slab-local layout: color rects include boundary/dummy
                # positions — give them an identity Schur block (the patch
                # solve masks their corrections out)
                Sc = jnp.where(
                    geom.fint[b0:b1][None, None, :] > 0, Sc, eye[:, :, None]
                )
            Sinv_parts.append(gauss_jordan_inv_bl(Sc).astype(store))
        blk = _fact_block(geom) if factored else None
        use_pallas = blk is not None and dtype == jnp.float32
        if use_pallas:
            # store the four sweep tables Pallas-tiled in the PADDED color
            # layout (_pad_bounds): full-tile blocks at every mesh size, no
            # boundary tail (identity / plus-cell blocks the color sweep
            # never reads; Ks columns there are exact zeros)
            pb = _pad_bounds(geom, blk)

            def cat_pad(parts):
                out = []
                for k, pk in enumerate(parts):
                    pad = (pb[k + 1] - pb[k]) - pk.shape[2]
                    if pad:
                        pk = jnp.pad(pk, ((0, 0), (0, 0), (0, pad)))
                    out.append(pk)
                return jnp.concatenate(out, axis=2)

            tt = lambda T: tile_table(T, blk)
            return TentativeOperator(
                D=None,
                Bx=None,
                Cx=None,
                # full-cell inverses are never read through tiled tables
                # (diagnostics reconstruct from Dinv0, _patch_apply_bl)
                Dinv=None,
                Sinv=tt(cat_pad(Sinv_parts)),
                Dinv0=tt(cat_pad(Dinv0_parts)),
                Sown=tt(S_own),
                Pcell=Pcell,
                Ks01=tt(_pad_cols(geom, K01s, blk)),
                Ks10=tt(_pad_cols(geom, K10s, blk)),
                Bp=Bp,
                Cp=Cp,
            )
        nbnd = nf - geom.n_int
        if nbnd:
            Sinv_parts.append(
                jnp.broadcast_to(eye[:, :, None], (nu, nu, nbnd)).astype(store)
            )
            # plus-cell blocks for the boundary tail, matching the
            # unstructured build's Dinv0 (one build-time gather of ~4 nx
            # facets).  Slab-local layouts carry fcells == 0 (gather path
            # unused there): the tail is then cell-0 blocks, never read —
            # the colored sweep masks every non-interior position by
            # geom.fint, exactly like Sinv's identity tail.
            Dinv0_parts.append(
                Dinv_bl[:, :, geom.fcells[0, geom.n_int :]].astype(store)
            )
        Dinv0_full = jnp.concatenate(Dinv0_parts, axis=2)
        if factored:
            # flat factored tables (f64 / CPU JAX reference path)
            return TentativeOperator(
                D=None,
                Bx=None,
                Cx=None,
                Dinv=Dinv_bl,
                Sinv=jnp.concatenate(Sinv_parts, axis=2),
                Dinv0=Dinv0_full,
                Sown=S_own,
                Pcell=Pcell,
                Ks01=K01s,
                Ks10=K10s,
                Bp=Bp,
                Cp=Cp,
            )
        return TentativeOperator(
            D=D_bl,
            Bx=Bx,
            Cx=Cx,
            Dinv=Dinv_bl,
            Sinv=jnp.concatenate(Sinv_parts, axis=2),
            Dinv0=Dinv0_full,
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


def _bm2(A, x):
    """Scalar block applied to both components: (d1, d1, n) x (nu, n) -> (nu, n).

    Unrolled over the contraction index as lane-parallel FMAs reading the A
    table ONCE for both components (the einsum form of this contraction —
    unlike _bm's — lowers through a batch-dim dot_general that relayouts the
    operands batch-major: measured 24.5 ms vs ~1 ms at (10, 10, 787k)).
    """
    d1 = A.shape[0]
    x2 = x.reshape(2, d1, -1)
    out = 0.0
    for j in range(d1):
        out = out + x2[:, None, j, :] * A[None, :, j, :]
    return out.reshape(x.shape)


# ----------------------------------------------------------------------
# Pallas factored-block apply: out = (eye2 (x) A + P) x, VMEM-resident
# ----------------------------------------------------------------------
# XLA's loop fusion of the _bm2 + constant-GEMM composition re-reads x from
# HBM once per output row (measured: the factored matvec ran SLOWER than the
# dense one despite 4x less table data).  The Pallas kernel holds the
# (d1, d1, T) table tile, the (nu, T) field tile and the (nu, nu) constant in
# VMEM and touches HBM exactly once per operand: table traffic IS the cost.


def _fact_kernel_factory(d1):
    nu = 2 * d1

    def kernel(p_ref, a_ref, x_ref, o_ref):
        # a (1, d1, d1, R, 128) VMEM; p (1, nu, nu) SMEM; x/o
        # (nu, 1, R, 128) VMEM.  Every FMA runs on a FULL (R, 128)
        # sublane x lane tile with the tiny-matrix indices unrolled as
        # SCALAR multipliers — the (rows, T)-shaped formulation burned the
        # VPU on sublane-padded row broadcasts (142 GB/s effective).
        for a in range(2):
            for i in range(d1):
                row = a * d1 + i
                acc = p_ref[0, row, 0] * x_ref[0, 0]
                for j in range(1, nu):
                    acc = acc + p_ref[0, row, j] * x_ref[j, 0]
                for j in range(d1):
                    acc = acc + a_ref[0, i, j] * x_ref[a * d1 + j, 0]
                o_ref[row, 0] = acc

    return kernel


def tile_table(A, block):
    """(d1, d1, M) scalar-block table -> Pallas-tiled (nt, d1, d1, R, 128).

    The tiled layout puts whole (R, 128) = ``block`` element tiles minor so
    BlockSpecs address them with full trailing dims (the TPU lowering
    rejects partial second-minor blocks) and color offsets land on whole
    leading-dim tiles.  One relayout per stage build; every Krylov
    application then streams it tile-linearly.

    Truncates to whole tiles: a non-multiple tail exists only on slab-local
    facet layouts, where it is entirely boundary facets whose (masked)
    table columns are exact zeros — never read by the tiled applies.
    """
    d1 = A.shape[0]
    R = block // 128
    nt = A.shape[2] // block
    return A[:, :, : nt * block].reshape(d1, d1, nt, R, 128).transpose(
        2, 0, 1, 3, 4
    )


def _table_block(T):
    """Pallas tile size encoded in a 5-D tiled table's own layout.

    Apply sites derive the block from the STORED table (block = R * 128)
    instead of re-running the :func:`_fact_block` build-time gate, whose
    backend/env-var inputs can change between build and apply (e.g.
    ``IEHDG_PALLAS_INTERPRET`` cleared after building tiled tables) — the
    gate would then return None and crash with an opaque ``% NoneType``
    instead of applying the tables it was handed.
    """
    return T.shape[3] * 128


def _interp():
    """Run the Pallas hot-path kernels in interpret mode (CPU testing).

    ``IEHDG_PALLAS_INTERPRET=1`` lets the tiled-table code paths — including
    the padded color layout — execute on the CPU backend, so the exact
    production dataflow is testable without a TPU.
    """
    return os.environ.get("IEHDG_PALLAS_INTERPRET") == "1"


def _pad_bounds(geom, block):
    """Padded color bounds: each color segment rounded up to whole tiles.

    The interior-facet colors of a NON-periodic structured mesh have sizes
    like (nx-1)*ny that are not multiples of the preferred 1024-element
    Pallas tile, which previously forced block = ny (R = block/128 < 8
    sublane-groups): every (R, 128) tile padded to 8 sublanes in HBM and on
    the VPU, costing 8/R x on ALL tiled-table kernels — measured ~2x at
    512^2 (block 512) and ~4x at 256^2 (block 256).  Storing each color
    padded to a tile multiple keeps block = 1024 at every production size;
    the pad columns of EVERY table (cross tables AND the Schur/plus-cell
    factors — cat_pad in build_tentative_operator pads with zeros) are
    zeros, safe because a pad column only ever sees zero residual input and
    its kernel output is sliced away.  Static Python ints.
    """
    b = geom.fcol_bounds
    pb = [0]
    for k in range(len(b) - 1):
        m = b[k + 1] - b[k]
        pb.append(pb[-1] + -(-m // block) * block)
    return tuple(pb)


def _cols_aligned(geom, block):
    """True when every color size is already a whole number of tiles (the
    padded layout then degenerates to the plain concatenation)."""
    b = geom.fcol_bounds
    return all((b[k + 1] - b[k]) % block == 0 for k in range(len(b) - 1))


def _pad_cols(geom, T, block, fill=0.0):
    """Concatenate per-color slices of a flat facet table/field into the
    padded layout: (..., >= b[-1]) -> (..., pb[-1]).  Drops any boundary
    tail past the colors (its tiled-table columns are never read)."""
    b = geom.fcol_bounds
    if _cols_aligned(geom, block):
        return T[..., : b[-1]]
    parts = []
    for k in range(len(b) - 1):
        seg = T[..., b[k] : b[k + 1]]
        pad = -(-(b[k + 1] - b[k]) // block) * block - (b[k + 1] - b[k])
        if pad:
            widths = [(0, 0)] * (T.ndim - 1) + [(0, pad)]
            seg = jnp.pad(seg, widths, constant_values=fill)
        parts.append(seg)
    return jnp.concatenate(parts, axis=-1)


def _unpad_cols(geom, T, block, tail=0, tail_fill=0.0):
    """Inverse of :func:`_pad_cols`: padded (..., pb[-1]) -> global color
    layout (..., b[-1] + tail), the tail filled with ``tail_fill``."""
    b = geom.fcol_bounds
    if _cols_aligned(geom, block):
        out = T[..., : b[-1]]
    else:
        pb = _pad_bounds(geom, block)
        out = jnp.concatenate(
            [
                T[..., pb[k] : pb[k] + (b[k + 1] - b[k])]
                for k in range(len(b) - 1)
            ],
            axis=-1,
        )
    if tail:
        widths = [(0, 0)] * (T.ndim - 1) + [(0, tail)]
        out = jnp.pad(out, widths, constant_values=tail_fill)
    return out


def flat_table(T):
    """Inverse view of :func:`tile_table` for diagnostics/tests."""
    if T.ndim == 3:
        return T
    nt, d1, _, R, _ = T.shape
    return T.transpose(1, 2, 0, 3, 4).reshape(d1, d1, nt * R * 128)


def _fact_pallas(A5, Ptile, x, block, offset=0, interpret=False):
    """Pallas launch of the factored block apply over x's batch range.

    :arg A5: (NT, d1, d1, R, 128) tiled scalar-block table (tile_table)
    :arg Ptile: (n_tiles, nu, nu) per-tile penalty constants for x's range
    :arg x: (nu, m) field values; the A tiles used start at tile
        ``offset // block`` — offset and m must be multiples of block
    :arg interpret: run the kernel in Pallas interpret mode (CPU testing)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _NT, d1, _, R, _ = A5.shape
    nu, m = x.shape
    ntile = m // block
    off_t = offset // block
    x4 = x.reshape(nu, ntile, R, 128)  # free: batch axis is contiguous
    mem = {} if interpret else dict(memory_space=pltpu.VMEM)
    smem = {} if interpret else dict(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _fact_kernel_factory(d1),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, nu, nu), lambda i: (i, 0, 0), **smem),
            pl.BlockSpec((1, d1, d1, R, 128),
                         lambda i: (i + off_t, 0, 0, 0, 0), **mem),
            pl.BlockSpec((nu, 1, R, 128), lambda i: (0, i, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((nu, 1, R, 128), lambda i: (0, i, 0, 0),
                               **mem),
        out_shape=jax.ShapeDtypeStruct((nu, ntile, R, 128), x.dtype),
        interpret=interpret,
    )(Ptile, A5, x4)
    return out.reshape(nu, m)


def _fact_block(geom):
    """Pallas tile size for the factored apply, or None for the JAX path.

    block = 1024: R = block/128 = 8 sublane-groups makes every (R, 128)
    tile a FULL native f32 (8, 128) VMEM tile — R < 8 pads each tile to 8
    sublanes, costing 8/R x in HBM table traffic and VPU utilisation
    (measured 2x at 512^2, 4x at 256^2 with the earlier block = ny choice).
    Only the CELL lower/upper split must land on whole blocks; color
    boundaries are handled by the padded tiled layout (:func:`_pad_bounds`),
    so non-periodic meshes — whose (nx-1)*ny color sizes misalign — get the
    full-tile block too.
    """
    if geom.shift is None:
        return None
    if jax.default_backend() not in ("tpu", "axon") and not _interp():
        return None
    nch = geom.shift[0] * geom.shift[1]
    for block in (1024, 512, 256, 128):
        if nch % block == 0 and geom.n_cells % block == 0:
            return block
    return None


def _fact_apply(geom, A, P, x, per="color"):
    """(eye2 (x) A + P-constant) x over the full batch axis.

    Dispatches on the stored table layout: 5-D tiled tables (tile_table)
    run the Pallas kernel; flat (d1, d1, M) tables run the JAX reference
    path (small meshes, f64, CPU).

    :arg P: (ncol, nu, nu) per-color constants (``per="color"``, facet
        fields: boundary facets beyond the colors get ZERO penalty) or
        (2, nu, nu) per-half constants (``per="half"``, cell fields)
    """
    nu, m = x.shape
    if A.ndim == 5:
        block = _table_block(A)
        interp = _interp()
        if per == "half":
            # cell axis: block divides both halves by the _fact_block gate
            nch = geom.shift[0] * geom.shift[1]
            reps = [nch // block, (m - nch) // block]
        else:
            # facet axis: tables live in the PADDED color layout — move x
            # into it, apply, move back (pads/boundary tail return zeros:
            # their table columns are zero by construction)
            pb = _pad_bounds(geom, block)
            reps = [
                (pb[k + 1] - pb[k]) // block for k in range(len(pb) - 1)
            ]
            x = _pad_cols(geom, x, block)
        Ptile = jnp.concatenate(
            [
                jnp.broadcast_to(P[k][None], (r, nu, nu))
                for k, r in enumerate(reps)
                if r > 0
            ]
        )
        z = _fact_pallas(A, Ptile, x, block, interpret=interp)
        if per == "half":
            return z
        return _unpad_cols(geom, z, block, tail=m - geom.fcol_bounds[-1])
    z = _bm2(A, x)
    if per == "half":
        nch = geom.shift[0] * geom.shift[1]
        return z + jnp.concatenate(
            [P[0] @ x[:, :nch], P[1] @ x[:, nch:]], axis=1
        )
    b = geom.fcol_bounds
    parts = [P[k] @ x[:, b[k] : b[k + 1]] for k in range(len(b) - 1)]
    nbnd = m - b[-1]
    if nbnd:
        parts.append(jnp.zeros((nu, nbnd), x.dtype))
    return z + jnp.concatenate(parts, axis=1)


def _fact_cross_apply(geom, Ks, Pk, u):
    """Factored cross-block application on a full (nu, nf) side field:
    (eye2 (x) Ks) u  +  per-color constant penalty blocks."""
    return _fact_apply(geom, Ks, Pk, u, per="color")


def _fact_color_apply(geom, A, Pk, x, k):
    """Single-color factored cross apply on color ``k``'s facet values:
    (eye2 (x) A[color k] + Pk) x.

    Tiled tables live in the PADDED color layout: the color starts at the
    whole-tile offset ``_pad_bounds(geom, block)[k]`` and x is zero-padded
    to whole tiles (pad outputs sliced away).  Flat tables use the plain
    ``fcol_bounds`` slice.
    """
    nu, m = x.shape
    if A.ndim == 5:
        block = _table_block(A)
        pb = _pad_bounds(geom, block)
        pm = pb[k + 1] - pb[k]
        xk = jnp.pad(x, ((0, 0), (0, pm - m))) if pm != m else x
        Ptile = jnp.broadcast_to(Pk[None], (pm // block, nu, nu))
        z = _fact_pallas(A, Ptile, xk, block, offset=pb[k],
                         interpret=_interp())
        return z[:, :m] if pm != m else z
    b0 = geom.fcol_bounds[k]
    return _bm2(A[:, :, b0 : b0 + m], x) + Pk @ x


def _cross_pair_kernel_factory(d1):
    """Fused PAIR of factored cross applies for one color, one pass:

        y0 = (eye2 (x) K01 + Bp) x1      (plus-cell rows from minus values)
        y1 = (eye2 (x) K10 + Cp) x0      (minus-cell rows from plus values)

    Replaces two separate _fact_pallas launches (and their per-launch
    operand staging) with one kernel that streams both cross tables and
    both side fields tile-linearly — built for _cross_offcolor, whose four
    separate factored applies measured 222 GB/s effective against the
    550-640 GB/s the fused patch kernel reaches (BASELINE.md round-4
    roofline; round-4 verdict next-step 1b).
    """
    nu = 2 * d1

    def kernel(pB_ref, pC_ref, k01_ref, k10_ref, x0_ref, x1_ref,
               y0_ref, y1_ref):
        # k01/k10 (1, d1, d1, R, 128) VMEM; pB/pC (1, nu, nu) SMEM;
        # x0/x1/y0/y1 (nu, 1, R, 128) VMEM
        for a in range(2):
            for i in range(d1):
                row = a * d1 + i
                acc0 = pB_ref[0, row, 0] * x1_ref[0, 0]
                acc1 = pC_ref[0, row, 0] * x0_ref[0, 0]
                for j in range(1, nu):
                    acc0 = acc0 + pB_ref[0, row, j] * x1_ref[j, 0]
                    acc1 = acc1 + pC_ref[0, row, j] * x0_ref[j, 0]
                for j in range(d1):
                    acc0 = acc0 + k01_ref[0, i, j] * x1_ref[a * d1 + j, 0]
                    acc1 = acc1 + k10_ref[0, i, j] * x0_ref[a * d1 + j, 0]
                y0_ref[row, 0] = acc0
                y1_ref[row, 0] = acc1

    return kernel


def _cross_pair_pallas(K01_5, K10_5, BpT, CpT, x0, x1, block,
                       offset=0, interpret=False):
    """Pallas launch of the fused cross pair over a facet range.

    :arg K01_5/K10_5: (NT, d1, d1, R, 128) tiled scalar cross tables
    :arg BpT/CpT: (ntile, nu, nu) PER-TILE constant penalty blocks for x's
        range (a single color broadcasts its constant; the full-field apply
        concatenates per-color broadcasts like _fact_apply's Ptile)
    :arg x0/x1: (nu, m) plus/minus side values (m, offset multiples of block)
    :returns: (y0, y1) each (nu, m)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _NT, d1, _, R, _ = K01_5.shape
    nu = 2 * d1
    m = x0.shape[1]
    ntile = m // block
    off_t = offset // block
    x04 = x0.reshape(nu, ntile, R, 128)
    x14 = x1.reshape(nu, ntile, R, 128)
    mem = {} if interpret else dict(memory_space=pltpu.VMEM)
    smem = {} if interpret else dict(memory_space=pltpu.SMEM)
    tab = lambda i: (i + off_t, 0, 0, 0, 0)
    fld = lambda i: (0, i, 0, 0)
    pen = lambda i: (i, 0, 0)
    y0, y1 = pl.pallas_call(
        _cross_pair_kernel_factory(d1),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, nu, nu), pen, **smem),
            pl.BlockSpec((1, nu, nu), pen, **smem),
            pl.BlockSpec((1, d1, d1, R, 128), tab, **mem),
            pl.BlockSpec((1, d1, d1, R, 128), tab, **mem),
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
        ],
        out_specs=(
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nu, ntile, R, 128), x0.dtype),
            jax.ShapeDtypeStruct((nu, ntile, R, 128), x0.dtype),
        ),
        interpret=interpret,
    )(BpT, CpT, K01_5, K10_5, x04, x14)
    return y0.reshape(nu, m), y1.reshape(nu, m)


def _cross_pair_color(geom, op, k, x0, x1):
    """Both factored cross applies of color ``k`` on its facet values:

        y0 = (eye2 (x) Ks01[color k] + Bp[k]) x1
        y1 = (eye2 (x) Ks10[color k] + Cp[k]) x0

    One fused Pallas pass on tiled tables; two flat applies otherwise.
    """
    if op.Ks01.ndim == 5:
        nu = x0.shape[0]
        block = _table_block(op.Ks01)
        pb = _pad_bounds(geom, block)
        m = x0.shape[1]
        pm = pb[k + 1] - pb[k]
        if pm != m:
            x0 = jnp.pad(x0, ((0, 0), (0, pm - m)))
            x1 = jnp.pad(x1, ((0, 0), (0, pm - m)))
        reps = pm // block
        y0, y1 = _cross_pair_pallas(
            op.Ks01, op.Ks10,
            jnp.broadcast_to(op.Bp[k][None], (reps, nu, nu)),
            jnp.broadcast_to(op.Cp[k][None], (reps, nu, nu)),
            x0, x1, block, offset=pb[k], interpret=_interp(),
        )
        return (y0[:, :m], y1[:, :m]) if pm != m else (y0, y1)
    return (
        _fact_color_apply(geom, op.Ks01, op.Bp[k], x1, k),
        _fact_color_apply(geom, op.Ks10, op.Cp[k], x0, k),
    )


def _cross_pair_full(geom, op, u0, u1):
    """Both FULL-FIELD factored cross applies in one fused pass:

        z0 = (eye2 (x) Ks01 + Bp[color]) u1
        z1 = (eye2 (x) Ks10 + Cp[color]) u0

    On tiled tables this replaces the two padded _fact_cross_apply launches
    of the matvec with ONE kernel sharing the operand staging (the per-color
    pad/unpad relayout of the misaligned non-periodic layout runs once per
    side instead of being re-staged per table — round-4 advisor, low #4).
    """
    if op.Ks01.ndim == 5:
        nu, m = u0.shape
        block = _table_block(op.Ks01)
        pb = _pad_bounds(geom, block)
        reps = [(pb[k + 1] - pb[k]) // block for k in range(len(pb) - 1)]
        x0 = _pad_cols(geom, u0, block)
        x1 = _pad_cols(geom, u1, block)
        BpT = jnp.concatenate(
            [
                jnp.broadcast_to(op.Bp[k][None], (r, nu, nu))
                for k, r in enumerate(reps)
                if r > 0
            ]
        )
        CpT = jnp.concatenate(
            [
                jnp.broadcast_to(op.Cp[k][None], (r, nu, nu))
                for k, r in enumerate(reps)
                if r > 0
            ]
        )
        z0, z1 = _cross_pair_pallas(
            op.Ks01, op.Ks10, BpT, CpT, x0, x1, block, interpret=_interp()
        )
        tail = m - geom.fcol_bounds[-1]
        return (
            _unpad_cols(geom, z0, block, tail=tail),
            _unpad_cols(geom, z1, block, tail=tail),
        )
    return (
        _fact_cross_apply(geom, op.Ks01, op.Bp, u1),
        _fact_cross_apply(geom, op.Ks10, op.Cp, u0),
    )


def _patch_kernel_factory(d1):
    """Fused facet-pair patch solve for one color, one pass over the tables.

    Per (R, 128) element tile computes the whole 2x2 block-Schur solve
        w  = Dinv0 r0
        t  = r1 - (eye2 (x) Ks10 + Cp) w
        y1 = Sinv t
        y0 = Dinv0 (r0 - (eye2 (x) Ks01 + Bp) y1)
    with every table read from HBM exactly once.  The XLA composition of
    the same algebra launches 5 separate block ops whose (nu, nu, .)
    operands sublane-pad 20 -> 24 and re-read the fields between them —
    measured 3.9 ms per color at 512^2 vs ~1.3 ms of irreducible table
    bytes (tools/microbench_sweep.py).  All tiny-matrix indices unroll as
    SCALAR multipliers on full (R, 128) tiles, like _fact_kernel_factory.
    """
    nu = 2 * d1

    def kernel(
        pB_ref, pC_ref, di_ref, si_ref, k01_ref, k10_ref,
        r0_ref, r1_ref, y0_ref, y1_ref,
    ):
        # di/si (1, nu, nu, R, 128) VMEM; k01/k10 (1, d1, d1, R, 128) VMEM;
        # pB/pC (1, nu, nu) SMEM; r0/r1/y0/y1 (nu, 1, R, 128) VMEM
        w = []
        for i in range(nu):
            acc = di_ref[0, i, 0] * r0_ref[0, 0]
            for j in range(1, nu):
                acc = acc + di_ref[0, i, j] * r0_ref[j, 0]
            w.append(acc)
        t = []
        for a in range(2):
            for i in range(d1):
                row = a * d1 + i
                acc = pC_ref[0, row, 0] * w[0]
                for j in range(1, nu):
                    acc = acc + pC_ref[0, row, j] * w[j]
                for j in range(d1):
                    acc = acc + k10_ref[0, i, j] * w[a * d1 + j]
                t.append(r1_ref[row, 0] - acc)
        y1 = []
        for i in range(nu):
            acc = si_ref[0, i, 0] * t[0]
            for j in range(1, nu):
                acc = acc + si_ref[0, i, j] * t[j]
            y1.append(acc)
            y1_ref[i, 0] = acc
        u = []
        for a in range(2):
            for i in range(d1):
                row = a * d1 + i
                acc = pB_ref[0, row, 0] * y1[0]
                for j in range(1, nu):
                    acc = acc + pB_ref[0, row, j] * y1[j]
                for j in range(d1):
                    acc = acc + k01_ref[0, i, j] * y1[a * d1 + j]
                u.append(r0_ref[row, 0] - acc)
        for i in range(nu):
            acc = di_ref[0, i, 0] * u[0]
            for j in range(1, nu):
                acc = acc + di_ref[0, i, j] * u[j]
            y0_ref[i, 0] = acc

    return kernel


def _patch_pallas(Di5, Si5, K01_5, K10_5, Bp_k, Cp_k, r0, r1, block,
                  offset=0, interpret=False):
    """Pallas launch of the fused color patch solve.

    :arg Di5/Si5: (NT, nu, nu, R, 128) tiled plus-cell inverse / patch Schur
        inverse tables (tile_table)
    :arg K01_5/K10_5: (NT, d1, d1, R, 128) tiled scalar cross tables
    :arg Bp_k/Cp_k: (nu, nu) per-color constant penalty cross blocks
    :arg r0/r1: (nu, m) plus/minus side residuals of the color (m, offset
        multiples of block)
    :returns: (y0, y1) each (nu, m)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _NT, nu, _, R, _ = Di5.shape
    d1 = nu // 2
    m = r0.shape[1]
    ntile = m // block
    off_t = offset // block
    r04 = r0.reshape(nu, ntile, R, 128)
    r14 = r1.reshape(nu, ntile, R, 128)
    mem = {} if interpret else dict(memory_space=pltpu.VMEM)
    smem = {} if interpret else dict(memory_space=pltpu.SMEM)
    tab = lambda i: (i + off_t, 0, 0, 0, 0)
    fld = lambda i: (0, i, 0, 0)
    y0, y1 = pl.pallas_call(
        _patch_kernel_factory(d1),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, nu, nu), lambda i: (0, 0, 0), **smem),
            pl.BlockSpec((1, nu, nu), lambda i: (0, 0, 0), **smem),
            pl.BlockSpec((1, nu, nu, R, 128), tab, **mem),
            pl.BlockSpec((1, nu, nu, R, 128), tab, **mem),
            pl.BlockSpec((1, d1, d1, R, 128), tab, **mem),
            pl.BlockSpec((1, d1, d1, R, 128), tab, **mem),
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
        ],
        out_specs=(
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
            pl.BlockSpec((nu, 1, R, 128), fld, **mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nu, ntile, R, 128), r0.dtype),
            jax.ShapeDtypeStruct((nu, ntile, R, 128), r0.dtype),
        ),
        interpret=interpret,
    )(Bp_k[None], Cp_k[None], Di5, Si5, K01_5, K10_5, r04, r14)
    return y0.reshape(nu, m), y1.reshape(nu, m)


def _matvec_bl(geom, op, ub):
    """Assembled-block application on a component-major (nu, nc) field."""
    msk = interior_mask(geom, 1)[None, :]
    u0, u1 = _gather_sides_bl(geom, ub)
    if op.Sown is not None:  # factored tables (uniform structured mesh)
        r = _fact_apply(geom, op.Sown, op.Pcell, ub, per="half")
        z0, z1 = _cross_pair_full(geom, op, u0, u1)
        # boundary positions inside slab-local color rects carry real plus
        # values in u0 but no cross coupling: mask the minus rows
        z1 = z1 * msk
    else:
        r = _bm(op.D, ub)
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
    if Dinv0 is None or Dinv0.ndim == 5:
        # diagnostic path only: reconstruct the full-facet flat layout (the
        # hot colored sweep consumes the tiled tables directly).  Tiled ops
        # carry no full-cell Dinv (lower-half-only build) — re-invert the
        # reconstructed dense own-cell blocks.
        from ..ops.structured import gather_plus

        Dinv_full = op.Dinv
        if Dinv_full is None:
            Dinv_full = gauss_jordan_inv_bl(dense_blocks(geom, op)[0])
        Dinv0 = gather_plus(geom, Dinv_full)
    Sinv = op.Sinv
    if Sinv.ndim == 5:
        nu_, nf_ = rb.shape[0], geom.n_facets
        Sflat = _unpad_cols(geom, flat_table(Sinv), _table_block(op.Sinv))
        tail = nf_ - Sflat.shape[2]
        if tail:  # dropped boundary facets: identity, matching the build
            eye_t = jnp.broadcast_to(
                jnp.eye(nu_, dtype=Sflat.dtype)[:, :, None], (nu_, nu_, tail)
            )
            Sflat = jnp.concatenate([Sflat, eye_t], axis=2)
        Sinv = Sflat
    if op.Sown is not None:  # factored cross blocks
        t = r1 - _fact_cross_apply(geom, op.Ks10, op.Cp, _bm(Dinv0, r0)) * msk
        y1 = _bm(Sinv, t) * msk
        y0 = _bm(Dinv0, r0 - _fact_cross_apply(geom, op.Ks01, op.Bp, y1))
    else:
        t = r1 - _bm(op.Cx, _bm(Dinv0, r0))
        y1 = _bm(Sinv, t) * msk
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
    (ops/structured.py) and the plus-cell block inverses stream from the
    stored color-sorted ``op.Dinv0`` — re-slicing ``op.Dinv`` per solve
    relayouts the lane-strided color rects at 1/4 bandwidth
    (tools/microbench_sweep.py)."""
    from ..ops import structured as st

    l, lu, i0, j0, ni, nj, off = geom.shift[4][k]
    rect = (i0, j0, ni, nj)
    b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
    lo, up = st.grid_halves(geom, rb)
    r0 = st.rect_flat(lo, rect)
    r1 = st.rect_flat(st.roll2(geom, up, off), rect)
    if op.Sown is not None and op.Dinv0.ndim == 5:
        # tiled tables: the whole patch solve is ONE Pallas kernel pass.
        # The tables live in the padded color layout — pad the residuals
        # to whole tiles, solve at the padded offset, slice back.
        block = _table_block(op.Dinv0)
        pb = _pad_bounds(geom, block)
        m = r0.shape[1]
        pm = pb[k + 1] - pb[k]
        if pm != m:
            r0p = jnp.pad(r0, ((0, 0), (0, pm - m)))
            r1p = jnp.pad(r1, ((0, 0), (0, pm - m)))
        else:
            r0p, r1p = r0, r1
        y0, y1 = _patch_pallas(
            op.Dinv0, op.Sinv, op.Ks01, op.Ks10, op.Bp[k], op.Cp[k],
            r0p, r1p, block, offset=pb[k], interpret=_interp(),
        )
        if pm != m:
            y0, y1 = y0[:, :m], y1[:, :m]
    elif op.Sown is not None:  # factored cross blocks (single color slice)
        Dinv0 = op.Dinv0[:, :, b0:b1]
        w = _bm(Dinv0, r0)
        t = r1 - _fact_color_apply(geom, op.Ks10, op.Cp[k], w, k)
        y1 = _bm(op.Sinv[:, :, b0:b1], t)
        y0 = _bm(Dinv0, r0 - _fact_color_apply(geom, op.Ks01, op.Bp[k], y1, k))
    else:
        Dinv0 = op.Dinv0[:, :, b0:b1]
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


def _color_cov(geom, k):
    """(nc,) mask of cells whose color-k patch is actually solved.

    Lower cells at the color rect + upper cells at rect+off, restricted to
    interior facet positions (``geom.fint`` on slab-local layouts; the
    global structured layouts color interior facets only).  Static data —
    XLA folds it to a constant inside a jitted sweep.
    """
    from ..ops import structured as st

    l, lu, i0, j0, ni, nj, off = geom.shift[4][k]
    rect = (i0, j0, ni, nj)
    b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
    if geom.fint is not None:
        fk = geom.fint[b0:b1]
    else:
        fk = jnp.ones(b1 - b0, geom.wq.dtype)
    lo = st.rect_pad(geom, fk, rect)
    up = st.roll2(geom, lo, (-off[0], -off[1]))
    return st.grid_join(geom, lo, up)


def _cross_offcolor(geom, op, k, dz):
    """Cross-coupling part of ``A dz`` via facets of colors != k.

    After an EXACT color-k pair solve, this is the only nonzero part of
    ``A dz`` on the patch cells (the own-cell + within-pair part cancels the
    residual there by construction) — the incremental-residual identity that
    lets the multiplicative sweep skip its full inter-color matvecs.
    """
    from ..ops import structured as st

    ncol = len(geom.fcol_bounds) - 1
    lo_dz, up_dz = st.grid_halves(geom, dz)
    acc_lo = 0.0
    acc_up = 0.0
    for j in range(ncol):
        if j == k:
            continue
        l, lu, i0, j0, ni, nj, off = geom.shift[4][j]
        rect = (i0, j0, ni, nj)
        b0, b1 = geom.fcol_bounds[j], geom.fcol_bounds[j + 1]
        z0 = st.rect_flat(lo_dz, rect)  # plus-side (lower-cell) values
        z1 = st.rect_flat(st.roll2(geom, up_dz, off), rect)  # minus side
        if op.Sown is not None:
            y0, y1 = _cross_pair_color(geom, op, j, z0, z1)
        else:
            y0 = _bm(op.Bx[:, :, b0:b1], z1)
            y1 = _bm(op.Cx[:, :, b0:b1], z0)
        if geom.fint is not None:
            m = geom.fint[b0:b1][None, :]
            y0 = y0 * m
            y1 = y1 * m
        acc_lo = acc_lo + st.rect_pad(geom, y0, rect)
        acc_up = acc_up + st.roll2(
            geom, st.rect_pad(geom, y1, rect), (-off[0], -off[1])
        )
    return st.grid_join(geom, acc_lo, acc_up)


def _colored_apply_fused_bl(geom, op, vb, symmetric=False, exact_Az=True):
    """Multiplicative colored sweep returning BOTH ``z = M v`` and ``A z``.

    Mathematically identical to :func:`_colored_apply_bl` + an explicit
    matvec, but tracks the residual ``r = v - A z`` INCREMENTALLY: because
    each color's pair solves are exact and each cell has at most one facet
    per color, the post-patch residual is ``-(off-color cross)(dz)`` on
    patch cells and ``r - (off-color cross)(dz)`` on uncovered ones — no
    own-cell table read, no full matvec between colors.  Consumed by the
    right-preconditioned fused GMRES (linalg/krylov.py:gmres_right) where it
    replaces the per-iteration (sweep + matvec) pair — the dominant cost of
    the tentative solves that dominate the 512^2 step (BASELINE.md
    roofline).

    :arg exact_Az: compute the returned ``A z`` with one explicit matvec
        (default — still saves the sweep's 4 internal matvecs).  ``False``
        returns the free ``A z = v - r`` instead: exact in exact arithmetic,
        but the incremental cancellations amplify f32 patch-factor rounding
        by cond(pair block) ~ alpha/h (the factored-vs-dense f32 sweeps
        already differ by ~0.7% at 256^2 for this reason), which perturbs
        the Arnoldi relation near the f32 tolerance floor.

    Structured meshes only (``geom.shift``); requires every cell to carry an
    interior facet (no ``fcol_orphans``), which holds on the structured
    square/periodic layouts (every cell's hypotenuse is interior).
    """
    ncol = len(geom.fcol_bounds) - 1
    order = list(range(ncol))
    if symmetric:
        order += list(range(ncol - 2, -1, -1))
    z = None
    r = vb
    for i, k in enumerate(order):
        dz = _patch_color_structured(geom, op, k, r)
        z = dz if z is None else z + dz
        if exact_Az and i == len(order) - 1:
            return z, _matvec_bl(geom, op, z)
        r = r * (1.0 - _color_cov(geom, k))[None, :] - _cross_offcolor(
            geom, op, k, dz
        )
    return z, vb - r


def tentative_colored_apply(geom, op, r, symmetric=False):
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
    return _colored_apply_bl(
        geom, op, r.reshape(2 * d1, nc), symmetric=symmetric
    ).reshape(2, d1, nc)
