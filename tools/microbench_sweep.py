"""Microbenchmark: where does the fused colored-Schwarz sweep spend time?

Breaks one fused GMRES iteration body (``_colored_apply_fused_bl`` — the
dominant cost of the 512^2 step, BASELINE.md roofline) into its components
and reports per-application ms plus effective table bandwidth, so kernel
work targets the actual bottleneck.  Same scan-chained timing methodology
as tools/microbench_fact.py.  Not part of the test suite.

Usage: PROF_NX=512 python tools/microbench_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

os.environ.setdefault("IEHDG_FACT", "1")

jax.config.update("jax_default_matmul_precision", "highest")
os.makedirs("/root/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from incompressibleeulerhdg_tpu.mesh.generators import unit_square_mesh
from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation
from incompressibleeulerhdg_tpu.models.problems import TaylorGreen
from incompressibleeulerhdg_tpu.ops.forms import star_fields
from incompressibleeulerhdg_tpu.ops.projection import project_bdm
from incompressibleeulerhdg_tpu.linalg import preconditioners as P
from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
    IncompressibleEulerHDGIMEXSSP2_332,
)

_fetch = jax.jit(lambda t: t.ravel()[:4].astype(jnp.float32).sum())


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(_fetch(leaf))


def timeit_scan(name, apply_fn, x0, args, n=30, reps=3, nbytes=None):
    @jax.jit
    def chained(x, a):
        def body(c, _):
            y = apply_fn(c, a)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), None

        out, _ = lax.scan(body, x, None, length=n)
        return out

    out = chained(x0, args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(x0, args)
        sync(out)
        best = min(best, (time.perf_counter() - t0))
    ms = best / n * 1e3
    bw = f"  ({nbytes / best * n / 1e9:6.0f} GB/s eff)" if nbytes else ""
    print(f"{name:>44s} : {ms:9.3f} ms/app{bw}")
    return ms


def main():
    nx = int(os.environ.get("PROF_NX", 512))
    degree = 2
    disc = HDGDiscretisation(unit_square_mesh(nx), degree, dtype=jnp.float32)
    geom = disc.geom
    dt = 1.0 / nx
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, dt)
    problem = TaylorGreen(disc)
    Q0 = jax.jit(lambda: disc.interpolate_velocity(problem.initial_condition()[0]))()
    star = jax.jit(lambda Q: star_fields(geom, project_bdm(geom, stepper._proj, Q)))(
        Q0
    )
    c = 0.5 * dt
    nu = 2 * geom.d1
    nc, nf = geom.n_cells, geom.n_facets
    print(f"nx={nx} k={degree} n_cells={nc} n_facets={nf} nu={nu}")

    op = jax.jit(lambda s: P.build_tentative_operator(geom, s, c, 1.0, True))(star)
    assert op.Sown is not None
    ub = Q0.reshape(nu, -1)
    f4 = 4  # f32 bytes

    # byte model (tables only; fields add ~3 x 42 MB per op)
    ncol = len(geom.fcol_bounds) - 1
    nfk = [geom.fcol_bounds[k + 1] - geom.fcol_bounds[k] for k in range(ncol)]
    field = nu * nc * f4
    b_sinv = [nu * nu * m * f4 for m in nfk]
    b_dinv_rect = [nu * nu * m * f4 for m in nfk]  # Dinv re-sliced per color
    b_ks = [geom.d1 ** 2 * m * f4 for m in nfk]

    # --- full fused iteration body (what gmres_right pays per iteration) ---
    total_patch = sum(
        2 * b_dinv_rect[k] + b_sinv[k] + 2 * b_ks[k] for k in range(ncol)
    ) + sum(2 * b_dinv_rect[k] + b_sinv[k] + 2 * b_ks[k] for k in range(ncol - 1))
    total_cross = 4 * sum(2 * b_ks[j] for j in range(ncol))  # rough
    b_matvec = (geom.d1 ** 2 * nc + 2 * sum(b_ks)) * f4
    timeit_scan(
        "fused sweep+matvec (sym, exact_Az)",
        lambda u, a: P._colored_apply_fused_bl(geom, a, u, symmetric=True)[1],
        ub,
        op,
        nbytes=total_patch + total_cross + b_matvec + 6 * field,
    )
    timeit_scan(
        "fused sweep+matvec (sym, incremental Az)",
        lambda u, a: P._colored_apply_fused_bl(
            geom, a, u, symmetric=True, exact_Az=False
        )[1],
        ub,
        op,
    )

    # --- components ----------------------------------------------------
    for k in range(ncol):
        timeit_scan(
            f"  patch solve color {k} (Dinv+Sinv+2 cross)",
            lambda u, a, k=k: P._patch_color_structured(geom, a, k, u),
            ub,
            op,
            nbytes=2 * b_dinv_rect[k] + b_sinv[k] + 2 * b_ks[k] + 2 * field,
        )
    timeit_scan(
        "  cross_offcolor k=0 (2x2 fact applies)",
        lambda u, a: P._cross_offcolor(geom, a, 0, u),
        ub,
        op,
        nbytes=2 * (b_ks[1] + b_ks[2]) + 3 * field,
    )
    timeit_scan(
        "  full matvec (_matvec_bl)",
        lambda u, a: P._matvec_bl(geom, a, u),
        ub,
        op,
        nbytes=b_matvec + 4 * field,
    )

    # --- isolated table streams (the irreducible bytes) ------------------
    from incompressibleeulerhdg_tpu.ops import structured as st

    # the stored tables may be Pallas-tiled (5-D); flatten once for the
    # isolated _bm probes below (the hot path consumes them tiled)
    import dataclasses

    op_flat = op
    if getattr(op.Sinv, "ndim", 3) == 5:
        op_flat = dataclasses.replace(
            op, Sinv=P.flat_table(op.Sinv), Dinv0=P.flat_table(op.Dinv0)
        )

    def sinv_only(u, a):
        out = 0.0
        for k in range(ncol):
            b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
            l, lu, i0, j0, ni, nj, off = geom.shift[4][k]
            lo, _ = st.grid_halves(geom, u)
            r0 = st.rect_flat(lo, (i0, j0, ni, nj))
            out = out + jnp.sum(P._bm(a.Sinv[:, :, b0:b1], r0))
        return jnp.full((nu, nc), out, u.dtype)

    timeit_scan(
        "  Sinv block-solves only (3 colors)",
        sinv_only,
        ub,
        op_flat,
        nbytes=sum(b_sinv) + 3 * field // 2,
    )

    def dinv_only(u, a):
        """Stored color-sorted Dinv0 stream (the round-4 layout)."""
        lo, _ = st.grid_halves(geom, u)
        out = 0.0
        for k in range(ncol):
            l, lu, i0, j0, ni, nj, off = geom.shift[4][k]
            rect = (i0, j0, ni, nj)
            b0, b1 = geom.fcol_bounds[k], geom.fcol_bounds[k + 1]
            out = out + jnp.sum(
                P._bm(a.Dinv0[:, :, b0:b1], st.rect_flat(lo, rect))
            )
        return jnp.full((nu, nc), out, u.dtype)

    timeit_scan(
        "  Dinv0 stored-slice solves (3 colors)",
        dinv_only,
        ub,
        op_flat,
        nbytes=sum(b_dinv_rect) + 3 * field // 2,
    )

    def dinv_reslice(u, a):
        """The pre-round-4 re-slice of op.Dinv (kept as a relayout probe)."""
        lo, _ = st.grid_halves(geom, u)
        out = 0.0
        for k in range(ncol):
            l, lu, i0, j0, ni, nj, off = geom.shift[4][k]
            rect = (i0, j0, ni, nj)
            Dinv0 = st.rect_flat(st.grid_halves(geom, a.Dinv)[0], rect)
            out = out + jnp.sum(P._bm(Dinv0, st.rect_flat(lo, rect)))
        return jnp.full((nu, nc), out, u.dtype)

    timeit_scan(
        "  Dinv rect-RE-slice solves (old path)",
        dinv_reslice,
        ub,
        op_flat,
        nbytes=sum(b_dinv_rect) + 3 * field // 2,
    )


if __name__ == "__main__":
    main()
