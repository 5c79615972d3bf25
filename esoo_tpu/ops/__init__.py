from .fermion import FermionicOp
from .hamiltonian import ActiveSpaceHamiltonianBuilder, hamiltonian_matrix
from .jw import JordanWignerMapper
from .mappers import BravyiKitaevMapper, LinearFermionicMapper, ParityMapper
from .pauli import SparsePauliOp

__all__ = [
    "FermionicOp",
    "ActiveSpaceHamiltonianBuilder",
    "hamiltonian_matrix",
    "JordanWignerMapper",
    "BravyiKitaevMapper",
    "LinearFermionicMapper",
    "ParityMapper",
    "SparsePauliOp",
]
