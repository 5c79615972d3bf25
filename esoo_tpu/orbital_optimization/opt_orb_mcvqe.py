"""OptOrbMCVQE — excited-state orbital optimization over MCVQE.

Reference: opt_orb_mcvqe.py:15-119.  Unique among the variants: the MCVQE
eigensolver needs the *transformed* integral tensors internally (its CIS/
CISD initial states are built from them), so the constructor pre-rotates
the integrals with the initial partial unitary and injects them into every
solver copy (ref :90-103).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..solvers.vqe import AlgorithmError
from .eigensolver import OptOrbEigensolver, OptOrbEigensolverResult
from .kernels import (expand_spin, expand_spin_tensors, rotate_one_body,
                      rotate_two_body, rotated_integrals_spatial)


class OptOrbMCVQE(OptOrbEigensolver):
    def __init__(self, *args,
                 eigensolver_random_perturbation: Optional[float] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        solver = self._excited_states_solver_list[0]
        if solver.__class__.__name__ != "MCVQE":
            raise AlgorithmError(
                "The excited states solver needs to be of type MCVQE, not "
                f"{solver.__class__.__name__}")
        self.eigensolver_random_perturbation = eigensolver_random_perturbation

        u0 = jnp.asarray(self.initial_partial_unitary)
        if self._spatial_path:
            h_act, g_act = rotated_integrals_spatial(u0, self._h_sp,
                                                     self._g_sp)
            h_so, g_so = expand_spin_tensors(h_act, g_act)
        else:
            U = expand_spin(u0)
            h_so = rotate_one_body(self._h_so, U)
            g_so = rotate_two_body(self._g_so, U)
        h_so = np.asarray(h_so)
        g_so = np.asarray(g_so)
        for s in self._excited_states_solver_list:
            s.one_body_integrals = h_so
            s.two_body_integrals = g_so

    def parameter_update_rule(self, result, iteration: int):
        point = np.asarray(result.optimal_point)
        scale = self.eigensolver_random_perturbation
        if scale:
            point = point + self._rng.normal(0.0, scale, size=point.size)
        self._excited_states_solver_list[iteration].initial_point = point


class OptOrbMCVQEResult(OptOrbEigensolverResult):
    pass
