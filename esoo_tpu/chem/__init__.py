from .basis import BASIS_SETS, Shell, build_shells
from .driver import ElectronicStructureProblem, MoleculeDriver
from .integrals import IntegralEngine
from .scf import rhf

__all__ = [
    "BASIS_SETS",
    "Shell",
    "build_shells",
    "ElectronicStructureProblem",
    "MoleculeDriver",
    "IntegralEngine",
    "rhf",
]
