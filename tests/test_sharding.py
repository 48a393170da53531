"""Multi-device SPMD tests on the 8-way virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8), the JAX analogue of multi-node
testing (SURVEY.md section 4d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from incompressibleeulerhdg_tpu.mesh.generators import unit_square_mesh
from incompressibleeulerhdg_tpu.fem.discretisation import HDGDiscretisation
from incompressibleeulerhdg_tpu.ops import fields as F
from incompressibleeulerhdg_tpu.ops.forms import weak_divergence_apply
from incompressibleeulerhdg_tpu.linalg.condense import build_condensed_system, trace_matvec
from incompressibleeulerhdg_tpu.parallel.sharding import (
    make_device_mesh,
    shard_discretisation,
    shard_pytree,
)

needs_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_multidevice
def test_sharded_operators_match_single_device():
    """Cell-sharded weak-form kernels produce bitwise-comparable results."""
    disc = HDGDiscretisation(unit_square_mesh(6), 1)
    g = disc.geom
    cs = build_condensed_system(disc)
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((2, g.d1, g.n_cells)))
    lam = jnp.asarray(rng.standard_normal((g.nt, g.n_facets)))

    ref_div = weak_divergence_apply(g, Q)
    ref_tm = trace_matvec(g, cs, lam)

    mesh = make_device_mesh(8)
    g_sh, cs_sh = shard_discretisation(disc, mesh, cs)
    Q_sh = shard_pytree(Q, mesh, g.n_cells, g.n_facets)
    lam_sh = shard_pytree(lam, mesh, g.n_cells, g.n_facets)

    with mesh:
        div_sh = jax.jit(weak_divergence_apply)(g_sh, Q_sh)
        tm_sh = jax.jit(trace_matvec)(g_sh, cs_sh, lam_sh)
    assert float(jnp.abs(div_sh - ref_div).max()) < 1e-12
    assert float(jnp.abs(tm_sh - ref_tm).max()) < 1e-12


@needs_multidevice
def test_dryrun_multichip():
    """The full IMEX step compiles and runs over an 8-device mesh."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
