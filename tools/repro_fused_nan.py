"""Reproduce / diagnose the fused right-preconditioned GMRES failure at
512^2 k=2 float32 (VERDICT round 3, weak #1).

Builds the flagship tentative-velocity solve exactly as the first IMEX stage
does (Taylor-Green star field, c = gamma * dt, realistic rhs magnitude) and
runs it through:

  - fused mode 1 (exact A z): the shipped default that NaN'd at 512^2
  - fused mode 0 (left-preconditioned sweep+matvec): the healthy fallback

and additionally compares ONE application of the fused sweep (z, Az) against
the unfused (sweep, explicit matvec) pair, reporting relative errors — the
incremental-residual identity is exact in exact arithmetic; this measures its
f32 deterioration with mesh size.

Usage:  python tools/repro_fused_nan.py [nx] [degree]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax", exist_ok=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dtype = jnp.float32

    from incompressibleeulerhdg_tpu.mesh.generators import unit_square_mesh
    from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation
    from incompressibleeulerhdg_tpu.models.problems import TaylorGreen
    from incompressibleeulerhdg_tpu.ops.forms import star_fields, f_impl_apply
    from incompressibleeulerhdg_tpu.ops import fields as F
    from incompressibleeulerhdg_tpu.ops.projection import project_bdm, build_bdm_projection
    from incompressibleeulerhdg_tpu.linalg.preconditioners import (
        build_tentative_operator,
        _matvec_bl,
        _colored_apply_bl,
        _colored_apply_fused_bl,
    )
    from incompressibleeulerhdg_tpu.linalg.tentative import tentative_solve

    print(f"# repro: nx={nx} k={degree} f32 backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    disc = HDGDiscretisation(unit_square_mesh(nx), degree, dtype=dtype)
    geom = disc.geom
    problem = TaylorGreen(disc)
    proj = build_bdm_projection(disc)
    dt = 1.0 / nx
    gamma = 1.0 - 1.0 / np.sqrt(2.0)  # SSP2(3,3,2) implicit diagonal
    c = float(gamma * dt)

    @jax.jit
    def setup():
        Q0 = disc.interpolate_velocity(problem.initial_condition()[0])
        star = star_fields(geom, project_bdm(geom, proj, Q0))
        return Q0, star

    Q0, star = setup()
    op = build_tentative_operator(geom, star, c, 1.0, True)

    # realistic first-stage rhs: r_i - M Q_i + c f_impl(Q_i) with Q_i = Q0
    # and r_i = M Q0 collapses to c * f_impl(Q0) — the same magnitude and
    # spectral content the first Richardson sweep sees
    @jax.jit
    def make_rhs():
        return c * f_impl_apply(geom, star, Q0, 1.0, True)

    b = make_rhs()
    jax.block_until_ready(b)
    print(f"# setup {time.time()-t0:.1f}s  |b|={float(jnp.linalg.norm(b)):.3e}", flush=True)

    nu = b.shape[0] * b.shape[1]
    nc = b.shape[2]
    vb = b.reshape(nu, nc)

    # --- single-application diagnostics ---------------------------------
    # SEPARATE jits per variant with host-side deletion in between: the
    # all-in-one jit held three sweeps' worth of live intermediates and
    # RESOURCE_EXHAUSTED the 16 GB chip at 512^2.  op passed as an argument
    # (not closed over) so the tables travel as device buffers, not HLO
    # constants — the axon remote-compile endpoint rejects multi-hundred-MB
    # constant-laden payloads with HTTP 413.
    @jax.jit
    def ref_app(op, vb):
        z = _colored_apply_bl(geom, op, vb, symmetric=True)
        return z, _matvec_bl(geom, op, z)

    @partial(jax.jit, static_argnames=("exact_Az",))
    def fused_app(op, vb, exact_Az):
        return _colored_apply_fused_bl(geom, op, vb, symmetric=True, exact_Az=exact_Az)

    z_ref, Az_ref = map(np.asarray, ref_app(op, vb))
    z1, Az1 = map(np.asarray, fused_app(op, vb, exact_Az=True))

    def rel(a, b):
        d = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
        return f"{d:.3e} (finite={np.isfinite(a).all()})"

    print(f"# sweep z   fused1 vs ref: {rel(z1, z_ref)}")
    print(f"# sweep Az  fused1 vs ref: {rel(Az1, Az_ref)}")
    del z1, Az1
    z2, Az2 = map(np.asarray, fused_app(op, vb, exact_Az=False))
    print(f"# sweep z   fused2 vs ref: {rel(z2, z_ref)}")
    print(f"# sweep Az  fused2 vs ref: {rel(Az2, Az_ref)}")
    del z2, Az2
    print(f"# |z_ref|={np.linalg.norm(z_ref):.3e} |Az_ref|={np.linalg.norm(Az_ref):.3e}", flush=True)
    del z_ref, Az_ref

    # --- per-color incremental-residual trace ----------------------------
    # mirrors _colored_apply_fused_bl color by color, printing the tracked
    # residual r, the exact residual vb - A z, and their difference: shows
    # WHERE (which color of the symmetric sweep) the f32 incremental
    # identity deteriorates
    from incompressibleeulerhdg_tpu.linalg.preconditioners import (
        _patch_color_structured,
        _color_cov,
        _cross_offcolor,
    )

    @partial(jax.jit, static_argnames=("k",))
    def color_step(op, r, k):
        dz = _patch_color_structured(geom, op, k, r)
        r_new = r * (1.0 - _color_cov(geom, k))[None, :] - _cross_offcolor(
            geom, op, k, dz
        )
        return dz, r_new

    @jax.jit
    def exact_resid(op, vb, z):
        return vb - _matvec_bl(geom, op, z)

    ncol = len(geom.fcol_bounds) - 1
    order = list(range(ncol)) + list(range(ncol - 2, -1, -1))
    r = vb
    z = None
    for i, k in enumerate(order):
        dz, r = color_step(op, r, k)
        z = dz if z is None else z + dz
        re = np.asarray(exact_resid(op, vb, z))
        rn = float(jnp.linalg.norm(r))
        ren = np.linalg.norm(re)
        drift = np.linalg.norm(np.asarray(r) - re) / max(ren, 1e-30)
        print(
            f"# color[{i}]={k}: |r_inc|={rn:.3e} |r_exact|={ren:.3e} "
            f"drift={drift:.3e} |dz|={float(jnp.linalg.norm(dz)):.3e}",
            flush=True,
        )
    del r, z, dz

    # --- full solves ------------------------------------------------------
    for mode in ("1", "0"):
        t0 = time.time()
        u, it, rr = tentative_solve(
            geom, star, b, c, rtol=1e-10, op=op, restart=28, symmetric=True,
            fused=mode,
        )
        jax.block_until_ready(u)
        fin = bool(jnp.isfinite(u).all())
        print(
            f"# solve fused={mode}: iters={int(it)} relres={float(rr):.3e} "
            f"finite={fin} |u|={float(jnp.linalg.norm(u)):.3e} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
