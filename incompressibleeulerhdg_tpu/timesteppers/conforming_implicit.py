"""Conforming RT1 x DG0 implicit solver.

TPU-native rebuild of ``IncompressibleEulerConformingImplicit``
(/root/reference/src/timesteppers/conforming_implicit.py) — scheme 1 of the
reference README (Guzman et al. 2016, section 2.1).

The velocity lives in the lowest-order Raviart-Thomas space (one global dof
per facet: the normal flux through it); the pressure in DG0.  Element kernels
are batched over cells exactly like the DG machinery, with facet-indexed
gather/scatter for the global H(div) dofs.

Implementation lands later in this round; the class signature and dispatch
are final.
"""

from .common import IncompressibleEuler

__all__ = ["IncompressibleEulerConformingImplicit"]


class IncompressibleEulerConformingImplicit(IncompressibleEuler):
    """Conforming implicit scheme (RT1 velocity, DG0 pressure)."""

    def __init__(self, disc, dt, flux="upwind", use_projection_method=True, callbacks=None):
        super().__init__(disc, dt, label="Conforming Implicit")
        self.flux = flux
        assert self.flux in ["upwind", "centered"]
        self._use_projection_method = use_projection_method
        self.callbacks = [] if callbacks is None else callbacks

    def solve(self, Q_initial, p_initial, q_initial, f_rhs, T_final, warmup=False):
        raise NotImplementedError(
            "conforming RT1xDG0 scheme: implementation in progress this round"
        )
