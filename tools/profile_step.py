"""Profile the HDG IMEX step piecewise on the real TPU.

Times each component of the flagship timestep separately (operator build,
tentative solve, pressure solve, rhs builds, BDM projection) so optimisation
effort goes where the time actually is.  Not part of the test suite.

Usage: PROF_NX=256 python tools/profile_step.py
"""

import os
import sys
import time

# repo root on sys.path without PYTHONPATH (which breaks axon plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
os.makedirs("/root/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from incompressibleeulerhdg_tpu.mesh.generators import unit_square_mesh
from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation
from incompressibleeulerhdg_tpu.models.problems import TaylorGreen
from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
    IncompressibleEulerHDGIMEXSSP2_332,
)
from incompressibleeulerhdg_tpu.ops.forms import (
    star_fields,
    f_impl_apply,
    pressure_gradient_apply,
    weak_divergence_apply,
)
from incompressibleeulerhdg_tpu.ops.projection import project_bdm
from incompressibleeulerhdg_tpu.ops import fields as F
from incompressibleeulerhdg_tpu.linalg.preconditioners import (
    build_tentative_operator,
    tentative_operator_matvec,
    tentative_patch_apply,
)
from incompressibleeulerhdg_tpu.linalg.tentative import tentative_solve
from incompressibleeulerhdg_tpu.linalg.pressure import pressure_solve
from incompressibleeulerhdg_tpu.linalg.gtmg import gtmg_apply


_fetch_fn = jax.jit(lambda t: t.ravel()[:4].astype(jnp.float32).sum())


def _sync(out):
    """Force completion: jax.block_until_ready does NOT reliably block on the
    axon (tunneled TPU) backend; a device->host fetch of a tiny jitted
    reduction does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(_fetch_fn(leaf))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    # measure the per-dispatch + fetch floor so it can be subtracted; calls
    # are synced one by one (queueing N big intermediates OOMs at 512^2)
    probe = jnp.zeros(8, jnp.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        _sync(probe)
    floor = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = None  # free the previous result's device buffers first:
        # keeping two multi-GB results + workspace live OOMs at 512^2
        out = fn(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / n - floor
    print(f"{name:>42s} : {dt*1e3:9.2f} ms   (floor {floor*1e3:.1f} ms)")
    return out


def main():
    nx = int(os.environ.get("PROF_NX", 256))
    degree = int(os.environ.get("PROF_DEGREE", 2))
    dtype = jnp.float32
    dt = 1.0 / nx

    disc = HDGDiscretisation(unit_square_mesh(nx), degree, dtype=dtype)
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, dt)
    problem = TaylorGreen(disc)
    geom = disc.geom
    print(f"nx={nx} k={degree} n_cells={geom.n_cells} n_facets={geom.n_facets}")

    Q0 = disc.interpolate_velocity(problem.initial_condition()[0])
    p0 = stepper.shift_pressure(disc.interpolate_pressure(problem.initial_condition()[1]))
    lam0 = stepper._reconstruct_trace(Q0, p0)
    c = 0.5 * dt
    pen = 1.0

    proj = stepper._proj
    cs = stepper._cs
    pc = stepper._gtmg

    j_project = jax.jit(lambda g, pr, Q: project_bdm(g, pr, Q))
    Qs = timeit("project_bdm", j_project, geom, proj, Q0)

    j_star = jax.jit(lambda g, Q: star_fields(g, Q))
    star = timeit("star_fields", j_star, geom, Qs)

    j_build = jax.jit(lambda g, s: build_tentative_operator(g, s, c, pen, True))
    t_op = timeit("build_tentative_operator", j_build, geom, star, n=3)

    j_mv = jax.jit(lambda g, op, u: tentative_operator_matvec(g, op, u))
    timeit("tentative matvec (assembled)", j_mv, geom, t_op, Q0, n=20)

    j_patch = jax.jit(lambda g, op, u: tentative_patch_apply(g, op, u))
    timeit("tentative patch apply", j_patch, geom, t_op, Q0, n=20)

    from incompressibleeulerhdg_tpu.linalg.preconditioners import (
        tentative_colored_apply,
    )
    j_col = jax.jit(lambda g, op, u: tentative_colored_apply(g, op, u))
    timeit("tentative colored apply", j_col, geom, t_op, Q0, n=20)

    from incompressibleeulerhdg_tpu.linalg.condense import trace_matvec
    j_tmv = jax.jit(lambda g, c_, l: trace_matvec(g, c_, l))
    timeit("trace matvec", j_tmv, geom, cs, lam0, n=20)

    j_fimpl = jax.jit(lambda g, s, u: f_impl_apply(g, s, u, pen, True))
    timeit("f_impl_apply (weak form)", j_fimpl, geom, star, Q0)

    j_pg = jax.jit(lambda g, p, l: pressure_gradient_apply(g, p, l))
    timeit("pressure_gradient_apply", j_pg, geom, p0, lam0)

    j_wd = jax.jit(lambda g, Q: weak_divergence_apply(g, Q))
    f_p = timeit("weak_divergence_apply", j_wd, geom, Q0)

    j_mass = jax.jit(lambda g, u: F.mass_apply(g, g.m1, u))
    b_tent = timeit("mass_apply", j_mass, geom, Q0)

    j_tent = jax.jit(
        lambda g, s, b, op: tentative_solve(
            g, s, b, c, alpha=pen, upwind=True, rtol=1e-6, op=op
        )
    )
    u, its, _rr = timeit("tentative_solve (full)", j_tent, geom, star, b_tent, t_op, n=3)
    print(f"{'tentative iters':>42s} : {int(its)}")

    j_gtmg = jax.jit(lambda g, c_, p_, v: gtmg_apply(g, c_, p_, v))
    v0 = jnp.ones(geom.n_facets * cs.nt, dtype)
    timeit("gtmg_apply (one V-cycle)", j_gtmg, geom, cs, pc, v0, n=10)

    j_press = jax.jit(
        lambda g, c_, fu, fp, fl: pressure_solve(
            g, c_, fu, fp, fl, rtol=2e-6, precond=lambda v: gtmg_apply(g, c_, pc, v)
        )
    )
    out = timeit(
        "pressure_solve (full)", j_press, geom, cs, jnp.zeros_like(Q0), f_p,
        jnp.zeros_like(lam0), n=3,
    )
    print(f"{'pressure iters':>42s} : {int(out[3])}")


if __name__ == "__main__":
    main()
