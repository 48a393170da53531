"""Measure fused vs composite step at one mesh size: compile time + s/step.

VERDICT round-4 weak #4 / next-step 8: the fused 256^2 step compiled in
~232 s while the composite 512^2 step compiled in ~128 s — nothing measured
whether composite-at-256^2 trades a few percent of step time for ~4x less
cold-compile.  This runs BOTH paths at PROF_NX (default 256) and prints
compile (warmup) and per-step wall-clock so COMPOSITE_STEP_CELLS can be set
from data (decision recorded in BASELINE.md).  Not part of the test suite.

Usage: PROF_NX=256 python tools/compare_step_paths.py
"""

import os
import sys
import time

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

# block_until_ready does not reliably block on the axon backend (verify
# skill, rounds 2-3): force a device->host fetch of a small reduction
_fetch = jax.jit(lambda t: t.ravel()[:4].astype(jnp.float32).sum())


def sync(out):
    return float(_fetch(jax.tree_util.tree_leaves(out)[0]))


def run(kind, nx, degree, n_steps):
    dt = 1.0 / nx
    disc = HDGDiscretisation(unit_square_mesh(nx), degree, dtype=jnp.float32)
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, dt)
    # force the path: a threshold below/above n_cells selects composite/fused
    stepper.composite_step_cells = 1 if kind == "composite" else 10**9
    problem = TaylorGreen(disc)
    Q0 = jax.jit(
        lambda: disc.interpolate_velocity(problem.initial_condition()[0])
    )()
    p0 = jax.jit(
        lambda: stepper.shift_pressure(
            disc.interpolate_pressure(problem.initial_condition()[1])
        )
    )()
    lam0 = jax.jit(stepper._reconstruct_trace)(Q0, p0)
    s = stepper.nstages
    sQ = [Q0] + [jnp.zeros_like(Q0)] * (s - 1)
    sp = [p0] + [jnp.zeros_like(p0)] * (s - 1)
    sl = [lam0] + [jnp.zeros_like(lam0)] * (s - 1)
    dummy_q = jnp.zeros_like(p0)
    step = stepper._get_step(problem.f_rhs(), False)
    op_args = (disc.geom, stepper._proj, stepper._cs, stepper._gtmg)

    t0 = time.time()
    out = step(*op_args, sQ, sp, sl, jnp.asarray(0.0, jnp.float32), dummy_q, None)
    sync(out[0][0])
    warmup_s = time.time() - t0
    sQ, sp, sl = out[0], out[1], out[2]
    t0 = time.time()
    for k in range(n_steps):
        out = step(
            *op_args, sQ, sp, sl, jnp.asarray((k + 1) * dt, jnp.float32),
            dummy_q, None,
        )
        sQ, sp, sl = out[0], out[1], out[2]
        sync(sQ[0])
    per_step = (time.time() - t0) / n_steps
    tent = np.asarray(out[4]["tentative"]).ravel().tolist()
    print(
        f"{kind:>10s}: warmup(compile+1 step) {warmup_s:7.1f} s, "
        f"{per_step:6.3f} s/step, tentative its {tent}",
        flush=True,
    )
    return warmup_s, per_step


def main():
    nx = int(os.environ.get("PROF_NX", 256))
    degree = int(os.environ.get("PROF_DEGREE", 2))
    n_steps = int(os.environ.get("PROF_STEPS", 3))
    print(f"nx={nx} k={degree} steps={n_steps}")
    run("composite", nx, degree, n_steps)
    run("fused", nx, degree, n_steps)


if __name__ == "__main__":
    main()
