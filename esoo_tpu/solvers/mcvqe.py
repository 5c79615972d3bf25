"""Multistate-Contracted VQE (MCVQE).

Re-implementation of the reference's mcvqe.py (class MCVQE(SSVQE) :48-487):
initial states come from a classical CIS/CISD diagonalization, the ansatz is
optimized SSVQE-style over those states, and the final eigenvalues are
obtained by diagonalizing the k x k contracted Hamiltonian whose
off-diagonal elements are measured through (|i> +/- |j>)/sqrt(2)
superposition states:  H_ij = (E_plus - E_minus) / 2
(reference mcvqe.py:435-465), diagonals H_ii = E_i.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..initializations.ci import get_CIS_states, get_CISD_states
from ..ops.pauli import SparsePauliOp
from ..sim.circuit import QuantumCircuit
from ..sim.estimator import Estimator
from ..sim.statevector import compile_circuit
from .energy import make_evaluators
from .optimizers import Optimizer
from .ssvqe import SSVQE, SSVQEResult
from .vqe import AlgorithmError


class MCVQEResult(SSVQEResult):
    def __init__(self):
        super().__init__()
        self.contracted_hamiltonian: Optional[np.ndarray] = None


class MCVQE(SSVQE):
    def __init__(self,
                 estimator: Optional[Estimator] = None,
                 num_particles: Optional[Tuple[int, int]] = None,
                 one_body_integrals: Optional[np.ndarray] = None,
                 two_body_integrals: Optional[np.ndarray] = None,
                 k: Optional[int] = 2,
                 weight_vector: Optional[Sequence[float]] = None,
                 ansatz: Optional[QuantumCircuit] = None,
                 optimizer: Optional[Union[Optimizer, Callable]] = None,
                 initial_point: Optional[Sequence[float]] = None,
                 gradient=None,
                 callback: Optional[Callable] = None,
                 check_input_states_orthogonality: bool = True,
                 excitations: str = None,
                 initial_states: Optional[List[QuantumCircuit]] = None,
                 max_evals_grouped: int = 1):
        super().__init__(estimator=estimator, k=k, ansatz=ansatz,
                         optimizer=optimizer, initial_point=initial_point,
                         initial_states=initial_states,
                         weight_vector=weight_vector, gradient=gradient,
                         callback=callback,
                         check_input_states_orthogonality=check_input_states_orthogonality,
                         max_evals_grouped=max_evals_grouped)
        self.num_particles = num_particles
        self.one_body_integrals = (None if one_body_integrals is None
                                   else np.asarray(one_body_integrals))
        self.two_body_integrals = (None if two_body_integrals is None
                                   else np.asarray(two_body_integrals))
        # None (+ no initial_states) falls back to computational-basis
        # initial states, like the reference (mcvqe.py:256-290 runs the CI
        # branches only for 's'/'sd'; _check_operator_initial_states
        # supplies the defaults otherwise)
        self.excitations = excitations
        self._ci_vectors: Optional[List[np.ndarray]] = None

    # -- CI-state preparation ---------------------------------------------
    def initialize_mcvqe(self):
        """Classically diagonalize CIS/CISD and store the k lowest states."""
        if self.initial_states is not None:
            self._ci_vectors = [
                np.asarray(compile_circuit(st).state())
                for st in self.initial_states
            ]
            return
        if self.excitations is None:
            # computational-basis defaults (SSVQE default states)
            states = self._resolved_initial_states(self._num_qubits_hint)
            self._ci_vectors = [
                np.asarray(compile_circuit(st).state()) for st in states]
            self.initial_states = states
            return
        if self.one_body_integrals is None or self.two_body_integrals is None:
            raise AlgorithmError(
                "MCVQE needs integrals (or explicit initial_states)")
        if self.excitations == "s":
            states = get_CIS_states(self.one_body_integrals,
                                    self.two_body_integrals,
                                    self.num_particles,
                                    state_representation="dense")
        elif self.excitations in ("sd", "d"):
            states = get_CISD_states(self.one_body_integrals,
                                     self.two_body_integrals,
                                     self.num_particles,
                                     state_representation="dense")
        else:
            raise AlgorithmError(f"unknown excitations {self.excitations!r}")
        if len(states) < self.k:
            raise AlgorithmError(
                f"CI produced {len(states)} states < k={self.k}")
        self._ci_vectors = [np.asarray(s) for s in states[: self.k]]
        circs = []
        for vec in self._ci_vectors:
            qc = QuantumCircuit(self._num_qubits_hint)
            qc.initialize_statevector(vec)
            circs.append(qc)
        self.initial_states = circs

    def compute_eigenvalues(self, operator: SparsePauliOp,
                            aux_operators=None) -> MCVQEResult:
        self._num_qubits_hint = operator.num_qubits
        self.initialize_mcvqe()

        base = super().compute_eigenvalues(operator, aux_operators)

        # contracted Hamiltonian post-processing
        k = self.k
        theta = base.optimal_point
        Hc = np.zeros((k, k))
        per_state = base.eigenvalues
        for i in range(k):
            Hc[i, i] = per_state[i]
        # superposition-state energies through the ALREADY-compiled shared
        # ansatz (apply_fn on (|i> +/- |j>)/sqrt(2)) — no per-pair circuit
        # construction or recompilation
        import jax.numpy as jnp
        from ..sim.rdm import rdm_energy
        from ..sim.statevector import expectation_pauli
        compiled = compile_circuit(self.ansatz)
        theta_j = jnp.asarray(np.asarray(theta, dtype=np.float64))

        def energy_of(vec):
            vec = np.asarray(vec)
            if compiled.is_real and np.allclose(np.imag(vec), 0.0):
                vec = np.real(vec)
            else:
                vec = vec.astype(np.complex128)
            state = compiled.apply_fn(jnp.asarray(vec), theta_j)
            if getattr(operator, "fermionic", None) is not None:
                h, g = operator.fermionic
                return float(rdm_energy(state, jnp.asarray(h),
                                        jnp.asarray(g)))
            xs, zs, ys, coeffs = operator.mask_arrays()
            return float(np.real(
                expectation_pauli(state, xs, zs, ys, coeffs)))

        for i in range(k):
            for j in range(i + 1, k):
                plus = (self._ci_vectors[i] + self._ci_vectors[j]) / np.sqrt(2.0)
                minus = (self._ci_vectors[i] - self._ci_vectors[j]) / np.sqrt(2.0)
                Hc[i, j] = Hc[j, i] = 0.5 * (energy_of(plus)
                                             - energy_of(minus))

        w, _ = np.linalg.eigh(Hc)

        result = MCVQEResult()
        result.__dict__.update(base.__dict__)
        result.eigenvalues = w
        result.contracted_hamiltonian = Hc
        return result
