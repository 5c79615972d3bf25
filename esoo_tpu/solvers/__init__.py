from .adapt_vqe import AdaptVQE, AdaptVQEResult, TerminationCriterion
from .mcvqe import MCVQE, MCVQEResult
from .optimizers import (
    ADAM,
    CG,
    COBYLA,
    L_BFGS_B,
    NELDER_MEAD,
    POWELL,
    SLSQP,
    SPSA,
    GradientDescent,
    JaxBFGS,
    Minimizer,
    Optimizer,
    OptimizerResult,
)
from .davidson import (BlockDavidsonResult, DavidsonResult,
                       davidson_block, davidson_block_advance,
                       davidson_block_finish, davidson_block_init,
                       davidson_ground)
from .ssvqe import SSVQE, SSVQEResult
from .vqd import VQD, VQDResult
from .vqe import (VQE, AlgorithmError, NumPyEigensolver,
                  NumPyEigensolverResult, NumPyMinimumEigensolver, VQEResult)

__all__ = [
    "AdaptVQE", "AdaptVQEResult", "TerminationCriterion",
    "MCVQE", "MCVQEResult",
    "ADAM", "CG", "COBYLA", "L_BFGS_B", "NELDER_MEAD", "POWELL", "SLSQP",
    "SPSA", "GradientDescent", "JaxBFGS", "Minimizer", "Optimizer", "OptimizerResult",
    "DavidsonResult", "BlockDavidsonResult", "davidson_ground",
    "davidson_block", "davidson_block_init", "davidson_block_advance",
    "davidson_block_finish",
    "SSVQE", "SSVQEResult",
    "VQD", "VQDResult",
    "VQE", "AlgorithmError", "NumPyEigensolver", "NumPyEigensolverResult",
    "NumPyMinimumEigensolver", "VQEResult",
]
