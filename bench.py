"""Benchmark: wall-clock per HDG IMEX timestep (the BASELINE.json metric).

Runs the flagship configuration — HDG IMEX SSP2(3,3,2), Richardson + projection
preconditioner, Taylor-Green vortex — on a 256^2 unit-square mesh at degree
k=2 in float32 (the TPU fast path), and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": "s/timestep", "vs_baseline": ...}

vs_baseline is the speedup factor over the reference Firedrake/PETSc CPU
implementation.  The reference publishes no numbers and Firedrake is not
installable in this image (BASELINE.md), so the baseline is an *estimate*,
documented in BASELINE.md: 60 s per implicit timestep for this configuration
(10 Krylov solves/step on ~600k trace dofs + assembly, single CPU socket).

Environment knobs: BENCH_NX (default 256), BENCH_DEGREE (2), BENCH_STEPS (3),
BENCH_DTYPE (float32).
"""

import json
import os
import sys
import time

import numpy as np

# estimated reference cost at the canonical 256^2 k=2 configuration (see
# BASELINE.md); scaled by cell count for other mesh sizes (the reference's
# per-step work is at least linear in cells)
REFERENCE_BASELINE_SECONDS_256 = 60.0


def main():
    import jax
    import jax.numpy as jnp

    # TPU matmuls default to bfloat16 passes; Krylov orthogonalisation and
    # the dense patch solves need true float32 accumulation
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compilation cache: repeat benchmark runs skip the multi-minute
    # XLA compile of the fused timestep
    os.makedirs("/root/.cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # a dead remote-TPU tunnel makes jax.devices() hang FOREVER inside
    # make_c_api_client (observed: multi-hour axon outages); convert that
    # into a fast, diagnosable failure so the bench capture is never a hang
    import threading

    _backend_ready = threading.Event()

    def _watchdog():
        if not _backend_ready.wait(300):
            print(
                "# bench: JAX backend failed to initialize within 300 s "
                "(remote TPU tunnel down?) — aborting",
                file=sys.stderr,
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    nx = int(os.environ.get("BENCH_NX", 256))
    degree = int(os.environ.get("BENCH_DEGREE", 2))
    n_steps = int(os.environ.get("BENCH_STEPS", 3))
    dtype = (
        jnp.float64 if os.environ.get("BENCH_DTYPE", "float32") == "float64" else jnp.float32
    )
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    from incompressibleeulerhdg_tpu.mesh.generators import unit_square_mesh
    from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation
    from incompressibleeulerhdg_tpu.models.problems import TaylorGreen
    from incompressibleeulerhdg_tpu.timesteppers.hdg_imex import (
        IncompressibleEulerHDGIMEXSSP2_332,
    )

    dt = 1.0 / nx  # CFL-reasonable timestep for the decaying vortex
    print(
        f"# bench: nx={nx} degree={degree} dtype={np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name} "
        f"steps={n_steps} devices={jax.devices()}",
        file=sys.stderr,
    )
    _backend_ready.set()

    t0 = time.time()
    disc = HDGDiscretisation(unit_square_mesh(nx), degree, dtype=dtype)
    stepper = IncompressibleEulerHDGIMEXSSP2_332(disc, dt)
    problem = TaylorGreen(disc)
    print(f"# setup: {time.time()-t0:.1f}s", file=sys.stderr)

    @jax.jit
    def _init():
        Q0 = disc.interpolate_velocity(problem.initial_condition()[0])
        p0 = stepper.shift_pressure(
            disc.interpolate_pressure(problem.initial_condition()[1])
        )
        lam0 = stepper._reconstruct_trace(Q0, p0)
        return Q0, p0, lam0

    Q0, p0, lam0 = _init()
    s = stepper.nstages
    sQ = [Q0] + [jnp.zeros_like(Q0)] * (s - 1)
    sp = [p0] + [jnp.zeros_like(p0)] * (s - 1)
    sl = [lam0] + [jnp.zeros_like(lam0)] * (s - 1)
    dummy_q = jnp.zeros_like(p0)

    step = stepper._get_step(problem.f_rhs(), False)

    op_args = (disc.geom, stepper._proj, stepper._cs, stepper._gtmg)

    # warm-up: compile + one step
    t0 = time.time()
    out = step(*op_args, sQ, sp, sl, jnp.asarray(0.0, dtype=dtype), dummy_q, None)
    jax.block_until_ready(out)
    print(f"# warmup (compile + 1 step): {time.time()-t0:.1f}s", file=sys.stderr)
    sQ, sp, sl = out[0], out[1], out[2]

    t0 = time.time()
    for k in range(n_steps):
        out = step(*op_args, sQ, sp, sl, jnp.asarray((k + 1) * dt, dtype=dtype), dummy_q, None)
        sQ, sp, sl = out[0], out[1], out[2]
        # synchronise every step: queueing a second step while one is in
        # flight doubles the live workspace (device fault at 512^2), and
        # async dispatch makes per-step timing unreliable anyway
        jax.block_until_ready(sQ[0])
    per_step = (time.time() - t0) / n_steps

    counts = out[4]
    print(
        f"# iters: tentative={np.asarray(counts['tentative'])} "
        f"pressure={np.asarray(counts['pressure'])} final={int(counts['final_pressure'])} "
        f"recon={int(counts['reconstruction'])}",
        file=sys.stderr,
    )

    baseline = REFERENCE_BASELINE_SECONDS_256 * (nx / 256.0) ** 2
    print(
        json.dumps(
            {
                "metric": f"wall-clock per HDG IMEX SSP2 timestep, {nx}x{nx} mesh, k={degree}",
                "value": per_step,
                "unit": "s/timestep",
                "vs_baseline": baseline / per_step,
            }
        )
    )


if __name__ == "__main__":
    main()
