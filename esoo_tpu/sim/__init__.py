from .ansatz import (
    UCC,
    UCCSD,
    EfficientSU2,
    HartreeFock,
    RealAmplitudes,
    TwoLocal,
    generate_excitations,
    hartree_fock_bitmask,
)
from .circuit import Parameter, ParamExpr, QuantumCircuit
from .estimator import ComputeUncompute, Estimator, Sampler
from .rdm import one_rdm, rdm_energy, two_rdm
from .statevector import CompiledCircuit, compile_circuit, statevector

__all__ = [
    "UCC", "UCCSD", "EfficientSU2", "HartreeFock", "RealAmplitudes",
    "TwoLocal", "generate_excitations", "hartree_fock_bitmask",
    "Parameter", "ParamExpr", "QuantumCircuit",
    "ComputeUncompute", "Estimator", "Sampler",
    "one_rdm", "rdm_energy", "two_rdm",
    "CompiledCircuit", "compile_circuit", "statevector",
]
