from .base import BaseOptOrbResult, BaseOptOrbSolver
from .checkpoint import load_checkpoint, save_checkpoint
from .eigensolver import OptOrbEigensolver, OptOrbEigensolverResult
from .fused import (FusedOptOrbAdaptVQE, FusedOptOrbEigensolverResult,
                    FusedOptOrbMCVQE, FusedOptOrbResult, FusedOptOrbSSVQE,
                    FusedOptOrbVQD, FusedOptOrbVQE)
from .casscf import (FusedOptOrbCASSCF, FusedOptOrbSACASSCF,
                     spin_squared_from_rdms)
from .kernels import (
    expand_spin,
    rotate_one_body,
    rotate_two_body,
    rotated_energy_so,
    rotated_energy_spatial,
    spin_reduce_rdms,
)
from .minimum_eigensolver import (
    OptOrbMinimumEigensolver,
    OptOrbMinimumEigensolverResult,
)
from .opt_orb_adapt_vqe import OptOrbAdaptVQE, OptOrbAdaptVQEResult
from .opt_orb_mcvqe import OptOrbMCVQE, OptOrbMCVQEResult
from .opt_orb_ssvqe import OptOrbSSVQE, OptOrbSSVQEResult
from .opt_orb_vqd import OptOrbVQD, OptOrbVQDResult
from .opt_orb_vqe import OptOrbVQE, OptOrbVQEResult
from .stiefel import PartialUnitaryProjectionOptimizer, StiefelOptResult, orth

__all__ = [
    "BaseOptOrbResult", "BaseOptOrbSolver",
    "load_checkpoint", "save_checkpoint",
    "OptOrbEigensolver", "OptOrbEigensolverResult",
    "FusedOptOrbResult", "FusedOptOrbVQE", "FusedOptOrbAdaptVQE",
    "FusedOptOrbCASSCF", "FusedOptOrbSACASSCF",
    "spin_squared_from_rdms",
    "FusedOptOrbEigensolverResult", "FusedOptOrbMCVQE", "FusedOptOrbSSVQE",
    "FusedOptOrbVQD",
    "OptOrbMinimumEigensolver", "OptOrbMinimumEigensolverResult",
    "OptOrbAdaptVQE", "OptOrbAdaptVQEResult",
    "OptOrbMCVQE", "OptOrbMCVQEResult",
    "OptOrbSSVQE", "OptOrbSSVQEResult",
    "OptOrbVQD", "OptOrbVQDResult",
    "OptOrbVQE", "OptOrbVQEResult",
    "PartialUnitaryProjectionOptimizer", "StiefelOptResult", "orth",
    "expand_spin", "rotate_one_body", "rotate_two_body",
    "rotated_energy_so", "rotated_energy_spatial", "spin_reduce_rdms",
]
