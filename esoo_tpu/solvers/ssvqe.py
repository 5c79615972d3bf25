"""Subspace-Search VQE (SSVQE), arXiv:1810.09434.

Re-implementation of the reference's ssvqe.py (class SSVQE :48-576): k
mutually orthogonal initial states share one ansatz; the optimizer minimizes
the weighted energy sum  sum_i w_i <psi_i(theta)|H|psi_i(theta)>.

TPU-native redesign: each initial-state/ansatz composition compiles once to
a jitted theta -> E_i evaluator (direct-RDM path for chemistry operators);
the weighted sum and its exact gradient are evaluated per optimizer iterate
in k device calls — versus the reference's per-evaluation batch of estimator
circuits crossing into Aer (ssvqe.py:352-365).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence, Union

import numpy as np

from ..ops.pauli import SparsePauliOp
from ..sim.circuit import QuantumCircuit
from ..sim.estimator import Estimator
from ..sim.statevector import compile_circuit
from .energy import make_evaluators
from .optimizers import Optimizer, OptimizerResult
from .vqe import AlgorithmError, _eval_aux_ops


class SSVQEResult:
    def __init__(self):
        self.eigenvalues: Optional[np.ndarray] = None
        self.optimal_point: Optional[np.ndarray] = None
        self.optimal_parameters: Optional[np.ndarray] = None
        self.optimal_value: Optional[float] = None
        self.optimal_circuits: Optional[List[QuantumCircuit]] = None
        self.cost_function_evals: int = 0
        self.optimizer_time: float = 0.0
        self.optimizer_result: Optional[OptimizerResult] = None
        self.aux_operators_evaluated = None


class SSVQE:
    """Weighted-subspace eigensolver over k orthogonal initial states."""

    def __init__(self,
                 estimator: Optional[Estimator] = None,
                 k: Optional[int] = 2,
                 ansatz: Optional[QuantumCircuit] = None,
                 optimizer: Optional[Union[Optimizer, Callable]] = None,
                 initial_point: Optional[Sequence[float]] = None,
                 initial_states: Optional[List[QuantumCircuit]] = None,
                 weight_vector: Optional[Sequence[float]] = None,
                 gradient=None,
                 callback: Optional[Callable] = None,
                 check_input_states_orthogonality: bool = True):
        self.estimator = estimator
        self.k = k
        self.ansatz = ansatz
        self.optimizer = optimizer
        self.initial_point = initial_point
        self.initial_states = initial_states
        self.weight_vector = weight_vector
        self.gradient = gradient
        self.callback = callback
        self.check_initial_states_orthogonal = check_input_states_orthogonality

    # -- setup helpers ---------------------------------------------------
    def _resolved_weights(self) -> np.ndarray:
        if self.weight_vector is not None:
            w = np.asarray(self.weight_vector, dtype=np.float64)
            if w.shape[0] != self.k:
                raise AlgorithmError(
                    f"weight_vector has {w.shape[0]} entries, expected k={self.k}")
            if np.any(w <= 0):
                raise AlgorithmError("weight_vector entries must be positive")
            return w
        return np.arange(self.k, 0, -1, dtype=np.float64)

    def _resolved_initial_states(self, num_qubits: int) -> List[QuantumCircuit]:
        if self.initial_states is None:
            states = []
            for i in range(self.k):
                qc = QuantumCircuit(num_qubits)
                for q in range(num_qubits):
                    if (i >> q) & 1:
                        qc.x(q)
                states.append(qc)
            return states
        states = list(self.initial_states)
        if len(states) != self.k:
            raise AlgorithmError(
                f"{len(states)} initial states provided, expected k={self.k}")
        for st in states:
            if st.num_qubits != num_qubits:
                raise AlgorithmError(
                    "initial state qubit count does not match the operator")
        if self.check_initial_states_orthogonal:
            vecs = [np.asarray(compile_circuit(s).state()) for s in states]
            for i in range(len(vecs)):
                for j in range(i + 1, len(vecs)):
                    if abs(np.vdot(vecs[i], vecs[j])) > 1e-8:
                        raise AlgorithmError(
                            f"initial states {i} and {j} are not orthogonal")
        return states

    # -- main ------------------------------------------------------------
    def compute_eigenvalues(self, operator: SparsePauliOp,
                            aux_operators=None) -> SSVQEResult:
        ansatz = self.ansatz
        if ansatz is None:
            raise AlgorithmError("SSVQE requires an ansatz")
        if ansatz.num_parameters == 0:
            raise AlgorithmError("ansatz has no free parameters")
        if ansatz.num_qubits != operator.num_qubits:
            raise AlgorithmError(
                f"ansatz qubits ({ansatz.num_qubits}) != operator qubits "
                f"({operator.num_qubits})")

        weights = self._resolved_weights()
        init_states = self._resolved_initial_states(ansatz.num_qubits)
        circuits = [st.compose(ansatz) for st in init_states]
        evaluators = [make_evaluators(c, operator) for c in circuits]

        x0 = self.initial_point
        if x0 is None:
            x0 = np.random.default_rng(0).uniform(
                -np.pi, np.pi, ansatz.num_parameters)
        x0 = np.asarray(x0, dtype=np.float64)
        if x0.shape[0] != ansatz.num_parameters:
            raise AlgorithmError(
                f"initial point has {x0.shape[0]} entries, ansatz expects "
                f"{ansatz.num_parameters}")

        evals = {"n": 0}

        def fun(theta):
            evals["n"] += 1
            energies = np.array([ev[0](theta) for ev in evaluators])
            if self.callback is not None:
                self.callback(evals["n"], np.asarray(theta), energies, {})
            return float(weights @ energies)

        def jac(theta):
            g = np.zeros_like(np.asarray(theta, dtype=np.float64))
            for w, ev in zip(weights, evaluators):
                g += w * ev[1](theta)[1]
            return g

        t0 = time.perf_counter()
        if callable(self.optimizer) and not isinstance(self.optimizer, Optimizer):
            opt_result = self.optimizer(fun=fun, x0=x0, jac=jac, bounds=None)
        else:
            opt_result = self.optimizer.minimize(fun, x0, jac=jac)
        t1 = time.perf_counter()

        final_energies = np.array([ev[0](opt_result.x) for ev in evaluators])

        result = SSVQEResult()
        result.eigenvalues = final_energies
        result.optimal_point = np.asarray(opt_result.x)
        result.optimal_parameters = np.asarray(opt_result.x)
        result.optimal_value = float(opt_result.fun)
        result.optimal_circuits = circuits
        result.cost_function_evals = evals["n"]
        result.optimizer_time = t1 - t0
        result.optimizer_result = opt_result
        if aux_operators is not None:
            result.aux_operators_evaluated = [
                _eval_aux_ops(compile_circuit(c).state(opt_result.x),
                              aux_operators)
                for c in circuits
            ]
        return result
