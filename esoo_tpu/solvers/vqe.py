"""Variational Quantum Eigensolver.

Native replacement for qiskit_algorithms.minimum_eigensolvers.VQE (the one
eigensolver the reference imports rather than implements; used at
tests/test_optorbvqe.py:81).  The cost function is a single jitted
theta -> E(theta) with exact jax.grad gradients, evaluated through the
direct-RDM contraction path for chemistry Hamiltonians.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import numpy as np

from ..ops.pauli import SparsePauliOp
from ..sim.circuit import QuantumCircuit
from ..sim.estimator import Estimator
from ..sim.statevector import compile_circuit, expectation_pauli
from .energy import make_evaluators
from .optimizers import Optimizer, OptimizerResult


class AlgorithmError(Exception):
    pass


class VQEResult:
    def __init__(self):
        self.eigenvalue: Optional[float] = None
        self.optimal_point: Optional[np.ndarray] = None
        self.optimal_parameters: Optional[np.ndarray] = None
        self.optimal_value: Optional[float] = None
        self.optimal_circuit: Optional[QuantumCircuit] = None
        self.cost_function_evals: int = 0
        self.optimizer_time: float = 0.0
        self.optimizer_result: Optional[OptimizerResult] = None
        self.aux_operators_evaluated = None


class VQE:
    """Minimizes <psi(theta)|H|psi(theta)> over ansatz parameters."""

    def __init__(self,
                 estimator: Optional[Estimator] = None,
                 ansatz: Optional[QuantumCircuit] = None,
                 optimizer: Optional[Optimizer] = None,
                 *,
                 gradient=None,
                 initial_point: Optional[Sequence[float]] = None,
                 callback: Optional[Callable] = None):
        self.estimator = estimator
        self.ansatz = ansatz
        self.optimizer = optimizer
        self.gradient = gradient
        self.initial_point = initial_point
        self.callback = callback

    def compute_minimum_eigenvalue(self, operator: SparsePauliOp,
                                   aux_operators=None) -> VQEResult:
        ansatz = self.ansatz
        if ansatz is None:
            raise AlgorithmError("VQE requires an ansatz")
        if ansatz.num_parameters == 0:
            raise AlgorithmError("ansatz has no free parameters")
        if ansatz.num_qubits != operator.num_qubits:
            raise AlgorithmError(
                f"ansatz qubits ({ansatz.num_qubits}) != operator qubits "
                f"({operator.num_qubits})")

        x0 = self.initial_point
        if x0 is None:
            x0 = np.random.default_rng(0).uniform(
                -np.pi, np.pi, ansatz.num_parameters)
        x0 = np.asarray(x0, dtype=np.float64)

        energy_fn, vag_fn = make_evaluators(ansatz, operator)

        evals = {"n": 0}

        def fun(theta):
            evals["n"] += 1
            v = energy_fn(theta)
            if self.callback is not None:
                self.callback(evals["n"], np.asarray(theta), v, {})
            return v

        def jac(theta):
            return vag_fn(theta)[1]

        t0 = time.perf_counter()
        if getattr(self.optimizer, "is_jax_native", False):
            # one-dispatch path: hand the optimizer the jittable energy
            # (per-iterate callbacks are not observable on this path)
            import jax.numpy as jnp
            from ..sim.statevector import compile_circuit as _cc
            from .energy import fermionic_evaluators, pauli_evaluators
            compiled = _cc(ansatz)
            if getattr(operator, "fermionic", None) is not None:
                h, g = operator.fermionic
                e_jit, _ = fermionic_evaluators(compiled,
                                                ansatz.fingerprint())
                opt_result = self.optimizer.minimize_jittable(
                    e_jit, x0, args=(jnp.asarray(h), jnp.asarray(g)))
            else:
                e_jit, _ = pauli_evaluators(compiled, operator)
                opt_result = self.optimizer.minimize_jittable(e_jit, x0)
            evals["n"] = opt_result.nfev
        elif callable(self.optimizer) and not isinstance(self.optimizer,
                                                         Optimizer):
            opt_result = self.optimizer(fun=fun, x0=x0, jac=jac, bounds=None)
        else:
            opt_result = self.optimizer.minimize(fun, x0, jac=jac)
        t1 = time.perf_counter()

        result = VQEResult()
        result.eigenvalue = float(opt_result.fun)
        result.optimal_point = np.asarray(opt_result.x)
        result.optimal_parameters = np.asarray(opt_result.x)
        result.optimal_value = float(opt_result.fun)
        result.optimal_circuit = ansatz
        result.cost_function_evals = evals["n"]
        result.optimizer_time = t1 - t0
        result.optimizer_result = opt_result

        if aux_operators:  # empty list/dict -> None (reference semantics)
            state = compile_circuit(ansatz).state(opt_result.x)
            result.aux_operators_evaluated = _eval_aux_ops(state, aux_operators)
        return result


def _eval_aux_ops(state, aux_operators):
    """Evaluate auxiliary operators (list or dict) on a statevector.

    Reference semantics (qiskit_algorithms estimate_observables, exercised
    by /root/reference/tests/test_ssvqe.py:264-371): list entries that are
    None evaluate to (0.0, dict) in place; dict entries that are None are
    dropped; numeric zero operators evaluate to (0.0, dict)."""
    def ev(op):
        if op is None or (isinstance(op, (int, float)) and op == 0):
            return (0.0, {})
        xs, zs, ys, coeffs = op.mask_arrays()
        val = expectation_pauli(state, xs, zs, ys, coeffs)
        return (np.real(val), {"variance": 0.0})

    if isinstance(aux_operators, dict):
        return {k: ev(op) for k, op in aux_operators.items() if op is not None}
    return [ev(op) for op in aux_operators]


class NumPyMinimumEigensolver:
    """Dense exact diagonalization (test oracle, parity with qiskit's)."""

    def compute_minimum_eigenvalue(self, operator: SparsePauliOp,
                                   aux_operators=None):
        H = operator.to_matrix()
        w, v = np.linalg.eigh(H)
        result = VQEResult()
        result.eigenvalue = float(w[0])
        result.optimal_value = float(w[0])
        return result


class NumPyEigensolverResult:
    def __init__(self):
        self.eigenvalues: Optional[np.ndarray] = None
        self.eigenstates: Optional[np.ndarray] = None


class NumPyEigensolver:
    """Dense exact k-eigenvalue solver (excited-state test oracle, parity
    with qiskit_algorithms.NumPyEigensolver).

    `filter_criterion(state, value, aux) -> bool` restricts the spectrum
    (e.g. to a particle-number sector).
    """

    def __init__(self, k: int = 2, filter_criterion=None):
        self.k = k
        self.filter_criterion = filter_criterion

    def compute_eigenvalues(self, operator: SparsePauliOp,
                            aux_operators=None) -> "NumPyEigensolverResult":
        H = operator.to_matrix()
        w, v = np.linalg.eigh(H)
        if self.filter_criterion is not None:
            keep = [i for i in range(len(w))
                    if self.filter_criterion(v[:, i], w[i], None)]
            w, v = w[keep], v[:, keep]
        result = NumPyEigensolverResult()
        result.eigenvalues = w[: self.k]
        result.eigenstates = v[:, : self.k].T
        return result
