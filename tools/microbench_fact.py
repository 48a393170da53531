"""Microbenchmark factored vs dense tentative matvec at 512^2 on the TPU.

Times are per application, measured by chaining N applications through
lax.scan inside ONE jitted program — no dispatch floor, no fetch noise
(jax.block_until_ready is unreliable through the axon tunnel).
Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

os.environ.setdefault("IEHDG_FACT", "1")  # measure the factored path even on TPU

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
import dataclasses

_fetch = jax.jit(lambda t: t.ravel()[:4].astype(jnp.float32).sum())


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(_fetch(leaf))


def timeit_scan(name, apply_fn, x0, args, n=30, reps=3):
    """Chain n applications in one jitted scan; report per-application ms."""

    @jax.jit
    def chained(x, a):
        def body(c, _):
            y = apply_fn(c, a)
            # renormalise so the chain cannot overflow
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
    print(f"{name:>44s} : {best/n*1e3:9.3f} ms/app")
    return out


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
    print(f"nx={nx} k={degree} n_cells={geom.n_cells} n_facets={geom.n_facets}")

    geom_dense = dataclasses.replace(geom, uniform=None)
    op_f = jax.jit(lambda s: P.build_tentative_operator(geom, s, c, 1.0, True))(star)
    op_d = jax.jit(
        lambda s: P.build_tentative_operator(geom_dense, s, c, 1.0, True)
    )(star)
    assert op_f.Sown is not None and op_d.Sown is None

    timeit_scan(
        "dense matvec", lambda u, a: P.tentative_operator_matvec(geom, a, u), Q0, op_d
    )
    timeit_scan(
        "factored matvec",
        lambda u, a: P.tentative_operator_matvec(geom, a, u),
        Q0,
        op_f,
    )
    # symmetric=True is the production config (IEHDG_TENT_SYM default);
    # the asymmetric sweep is ~half the cost and would flatter both paths
    timeit_scan(
        "dense colored apply (sym)",
        lambda u, a: P.tentative_colored_apply(geom, a, u, symmetric=True),
        Q0,
        op_d,
    )
    timeit_scan(
        "factored colored apply (sym)",
        lambda u, a: P.tentative_colored_apply(geom, a, u, symmetric=True),
        Q0,
        op_f,
    )

    # factored pieces (same shapes as inside the matvec)
    nu = 2 * geom.d1
    ub = Q0.reshape(nu, -1)
    timeit_scan(
        "  cell fact apply (Sown + Pcell)",
        lambda u, a: P._fact_apply(geom, a.Sown, a.Pcell, u, per="half"),
        ub,
        op_f,
    )
    timeit_scan("  dense cell _bm(D)", lambda u, a: P._bm(a.D, u), ub, op_d)
    from incompressibleeulerhdg_tpu.ops.structured import gather_minus

    u1 = jax.jit(lambda u: gather_minus(geom, u))(ub)
    timeit_scan(
        "  cross fact apply (Ks + colors)",
        lambda u, a: P._fact_cross_apply(geom, a.Ks01, a.Bp, u),
        u1,
        op_f,
    )
    timeit_scan(
        "  dense cross _bm", lambda u, a: P._bm(a.Bx, u), u1, op_d
    )

    # non-table parts shared by both paths: side gathers + cell assembly
    from incompressibleeulerhdg_tpu.ops.structured import gather_plus

    def sides_and_assemble(u, _a):
        from incompressibleeulerhdg_tpu.linalg.preconditioners import (
            _assemble_cells_bl,
            _gather_sides_bl,
            interior_mask,
        )

        u0, u1 = _gather_sides_bl(geom, u)
        msk = interior_mask(geom, 1)[None, :]
        return u + _assemble_cells_bl(geom, u0, u1 * msk)

    timeit_scan("  gathers + assembly only", sides_and_assemble, ub, op_f)


if __name__ == "__main__":
    main()
