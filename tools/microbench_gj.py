"""A/B the Gauss-Jordan Pallas kernel formulations on TPU.

Round 5 replaced the masked-select pivot fix-ups (3 full (n,n,B) passes per
pivot) with static indexed stores (~1.2 passes) — but Mosaic's lowering of
the strided column store is unproven.  This times both on the production
shape (20, 20, nc at 512^2) plus the Schur-product formulations
(dense _bmm vs the eye2-kron-structured split with MXU constant GEMMs).

Usage: PROF_NX=512 python tools/microbench_gj.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")
os.makedirs("/root/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fetch = jax.jit(lambda t: t.ravel()[:4].astype(jnp.float32).sum())


def sync(out):
    return float(_fetch(jax.tree_util.tree_leaves(out)[0]))


def timeit_scan(name, apply_fn, x0, n=20, reps=3, nbytes=None):
    @jax.jit
    def chained(x):
        def body(c, _):
            y = apply_fn(c)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), None

        out, _ = lax.scan(body, x, None, length=n)
        return out

    out = chained(x0)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(x0)
        sync(out)
        best = min(best, (time.perf_counter() - t0))
    ms = best / n * 1e3
    bw = f"  ({nbytes / best * n / 1e9:6.0f} GB/s eff)" if nbytes else ""
    print(f"{name:>44s} : {ms:9.3f} ms/app{bw}", flush=True)
    return ms


def _gj_old_kernel_factory(n):
    """Round-4 masked-select formulation (for the A/B)."""

    def kernel(a_ref, o_ref):
        A = a_ref[:]
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        for k in range(n):
            mk = idx == k
            pivot = A[k]
            inv_p = 1.0 / pivot[k]
            row_k = jnp.where(mk, inv_p[None, :], pivot * inv_p[None, :])
            f = jnp.where(mk, 0.0, A[:, k, :])
            A = A - f[:, None, :] * row_k[None, :, :]
            A = jnp.where(mk[None, :, :], (-f * inv_p[None, :])[:, None, :], A)
            A = jnp.where(mk[:, :, None], row_k[None, :, :], A)
        o_ref[:] = A

    return kernel


def _gj_old(A, block=1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, _, m = A.shape
    out = pl.pallas_call(
        _gj_old_kernel_factory(n),
        grid=(m // block,),
        in_specs=[
            pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, m), A.dtype),
    )(A)
    return out


def main():
    from incompressibleeulerhdg_tpu.linalg.smallinv import _gj_pallas
    from incompressibleeulerhdg_tpu.linalg.preconditioners import _bmm

    nx = int(os.environ.get("PROF_NX", 512))
    nc = 2 * nx * nx
    m = nc // 2  # one color's worth
    n, d1 = 20, 10
    rng = np.random.default_rng(7)
    A = jnp.asarray(
        rng.standard_normal((n, n, nc)) + 6.0 * np.eye(n)[:, :, None],
        jnp.float32,
    )
    nb = 2 * n * n * nc * 4
    print(f"nx={nx} shape=({n},{n},{nc})")
    timeit_scan("GJ new (indexed stores)", lambda a: _gj_pallas(a), A, nbytes=nb)
    timeit_scan("GJ old (masked selects)", lambda a: _gj_old(a), A, nbytes=nb)

    # Schur-product formulations on one color's shapes
    X = jnp.asarray(rng.standard_normal((n, n, m)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((d1, d1, m)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    nb2 = (2 * n * n * m + d1 * d1 * m) * 4

    def dense_pair(x):
        # the current build: two dense _bmm with a reconstructed E
        E = jnp.concatenate(
            [
                jnp.concatenate([K, jnp.zeros_like(K)], axis=1),
                jnp.concatenate([jnp.zeros_like(K), K], axis=1),
            ],
            axis=0,
        ) + C[:, :, None]
        return _bmm(E, _bmm(x, E))

    def kron_split(x):
        # structured: elementwise d1-blocks + constant GEMMs over axis 0
        def kron_apply(xx):
            # (eye2 (x) K) @ xx : block-rows
            top = 0.0
            bot = 0.0
            for jj in range(d1):
                top = top + K[:, jj, None, :] * xx[jj][None, :, :]
                bot = bot + K[:, jj, None, :] * xx[d1 + jj][None, :, :]
            return jnp.concatenate([top, bot], axis=0)

        def const_apply(xx):
            # C @ xx over axis 0: (n, n*m) GEMM — MXU with free reshapes
            return (C @ xx.reshape(n, -1)).reshape(n, n, m)

        T = kron_apply(x) + const_apply(x)
        return kron_apply(T) + const_apply(T)

    timeit_scan("Schur product: dense _bmm pair", dense_pair, X, nbytes=nb2)
    timeit_scan("Schur product: kron-split + MXU", kron_split, X, nbytes=nb2)


if __name__ == "__main__":
    main()
