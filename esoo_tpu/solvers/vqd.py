"""Variational Quantum Deflation (VQD), arXiv:1805.08138.

Re-implementation of the reference's vqd.py (:47-453), including its
extension allowing a different ansatz per state (vqd.py:17-18).  State k
minimizes

  <psi_k(theta)|H|psi_k(theta)> + sum_{j<k} beta_j |<psi_k(theta)|psi_j>|^2

sequentially over k.  The overlap penalties are computed directly from
statevectors inside one jitted cost (exact ComputeUncompute semantics), and
the whole cost is differentiated with jax.grad — no separate fidelity
primitive round-trips per evaluation (reference vqd.py:405-414).

Design decision: the reference's automatic-beta path is dead code (NameError
at vqd.py:215,235-245 — PauliSumOp import removed); here `betas=None`
resolves to the documented intent: beta_j = 10 + sum_k |coeff_k| of the
observable, matching qiskit's VQD fallback.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pauli import SparsePauliOp
from ..sim.circuit import QuantumCircuit
from ..sim.estimator import ComputeUncompute, Estimator
from ..sim.statevector import compile_circuit
from .energy import make_evaluators
from .optimizers import Optimizer, OptimizerResult
from .vqe import AlgorithmError


class VQDResult:
    def __init__(self):
        self.eigenvalues: Optional[np.ndarray] = None
        self.optimal_points: Optional[List[np.ndarray]] = None
        self.optimal_parameters: Optional[List[np.ndarray]] = None
        self.optimal_values: Optional[List[float]] = None
        self.optimal_circuits: Optional[List[QuantumCircuit]] = None
        self.cost_function_evals: Optional[List[int]] = None
        self.optimizer_times: Optional[List[float]] = None
        self.optimizer_results: Optional[List[OptimizerResult]] = None
        self.aux_operators_evaluated: Optional[List] = None


def _deflated_cost_vag(compiled, operator, prev_states, betas):
    """Jitted value_and_grad of the FULLY fused deflated cost

        C(theta) = <psi(theta)|H|psi(theta)>
                   + sum_j beta_j |<psi(theta)|psi_j>|^2

    — energy, penalties, and the gradient of their sum in one XLA
    executable (reference semantics: vqd.py:353-426 recombines estimator
    and fidelity primitive results per evaluation on the host).
    """
    state_fn = compiled.state_fn

    if getattr(operator, "fermionic", None) is not None:
        from ..sim.rdm import rdm_energy
        h, g = operator.fermionic
        h_j, g_j = jnp.asarray(h), jnp.asarray(g)

        def energy_of(s):
            return rdm_energy(s, h_j, g_j)
    else:
        xs, zs, ys, coeffs = operator.mask_arrays()
        if compiled.is_real:
            keep = ys % 2 == 0
            w_j = jnp.asarray(
                np.real(coeffs[keep] * np.power(1j, ys[keep] % 4)))
            xs_j, zs_j = jnp.asarray(xs[keep]), jnp.asarray(zs[keep])

            def energy_of(s):
                idx = jnp.arange(s.shape[0])

                def one(x, z):
                    perm = idx ^ x
                    par = jax.lax.population_count(perm & z) & 1
                    sign = (1 - 2 * par).astype(s.dtype)
                    return jnp.sum(s * sign * s[perm])

                return jnp.sum(w_j * jax.vmap(one)(xs_j, zs_j))
        else:
            c_j = jnp.asarray(coeffs * np.power(1j, ys % 4))
            xs_j, zs_j = jnp.asarray(xs), jnp.asarray(zs)

            def energy_of(s):
                idx = jnp.arange(s.shape[0])

                def one(x, z):
                    perm = idx ^ x
                    par = jax.lax.population_count(perm & z) & 1
                    sign = (1 - 2 * par).astype(s.dtype)
                    return jnp.sum(jnp.conj(s) * sign * s[perm])

                return jnp.real(jnp.sum(c_j * jax.vmap(one)(xs_j, zs_j)))

    if prev_states:
        all_real = all(np.allclose(np.imag(s), 0.0) for s in prev_states)
        if all_real:
            prev_mat = jnp.asarray(np.real(np.stack(prev_states)))
        else:
            prev_mat = jnp.asarray(np.stack(prev_states),
                                   dtype=jnp.complex128)
        b_j = jnp.asarray(np.asarray(betas, dtype=np.float64))

        def cost(theta):
            s = state_fn(theta)
            if jnp.issubdtype(s.dtype, jnp.floating) and \
                    jnp.issubdtype(prev_mat.dtype, jnp.floating):
                ov = prev_mat @ s
                pen = jnp.sum(b_j * ov * ov)
            else:
                ov = jnp.conj(prev_mat.astype(jnp.complex128)) @ \
                    s.astype(jnp.complex128)
                pen = jnp.sum(b_j * jnp.abs(ov) ** 2)
            return energy_of(s) + pen
    else:
        def cost(theta):
            return energy_of(state_fn(theta))

    return jax.jit(jax.value_and_grad(cost))


class VQD:
    def __init__(self,
                 estimator: Optional[Estimator] = None,
                 fidelity: Optional[ComputeUncompute] = None,
                 ansatz: Union[QuantumCircuit, List[QuantumCircuit], None] = None,
                 optimizer: Union[Optimizer, Sequence[Optimizer], None] = None,
                 *,
                 k: int = 2,
                 betas: Optional[Sequence[float]] = None,
                 initial_point=None,
                 callback: Optional[Callable] = None):
        self.estimator = estimator
        self.fidelity = fidelity
        self.ansatz = ansatz
        self.optimizer = optimizer
        self.k = k
        self.betas = betas
        self.initial_point = initial_point
        self.callback = callback

    def compute_eigenvalues(self, operator: SparsePauliOp,
                            aux_operators=None) -> VQDResult:
        k = self.k
        ansatze = self.ansatz if isinstance(self.ansatz, (list, tuple)) \
            else [self.ansatz] * k
        ansatze = list(ansatze)
        if len(ansatze) != k:
            raise AlgorithmError(f"need {k} ansatze, got {len(ansatze)}")
        for a in ansatze:
            if a.num_qubits != operator.num_qubits:
                raise AlgorithmError("ansatz/operator qubit mismatch")

        optimizers = self.optimizer if isinstance(self.optimizer, (list, tuple)) \
            else [self.optimizer] * k

        if self.betas is None:
            bound = float(np.sum(np.abs(operator.coeffs))) + 10.0
            betas = [bound] * (k - 1)
        else:
            betas = list(self.betas)
            if len(betas) < k - 1:
                raise AlgorithmError("betas must have length k-1")

        initial_points = self.initial_point
        if initial_points is None:
            rng = np.random.default_rng(0)
            initial_points = [
                rng.uniform(-np.pi, np.pi, a.num_parameters) for a in ansatze
            ]
        elif not isinstance(initial_points[0], (list, tuple, np.ndarray)):
            initial_points = [np.asarray(initial_points)] * k

        eigenvalues = []
        prev_states: List[np.ndarray] = []
        result = VQDResult()
        result.optimal_points = []
        result.optimal_parameters = []
        result.optimal_values = []
        result.optimal_circuits = []
        result.cost_function_evals = []
        result.optimizer_times = []
        result.optimizer_results = []

        for step in range(k):
            ansatz = ansatze[step]
            compiled = compile_circuit(ansatz)
            e_fn, _ = make_evaluators(ansatz, operator)

            # ONE jitted deflated cost: energy + beta-weighted overlap
            # penalties evaluated and differentiated in a single device
            # dispatch per optimizer iterate (the round-1 path recombined
            # two jitted calls on the host per iterate)
            cost_vag = _deflated_cost_vag(
                compiled, operator, prev_states, betas[: len(prev_states)])

            evals = {"n": 0}

            def fun(theta):
                evals["n"] += 1
                v, _ = vag(theta)
                if self.callback is not None:
                    self.callback(evals["n"], np.asarray(theta), v, {}, step + 1)
                return v

            def vag(theta):
                v, g = cost_vag(jnp.asarray(theta, dtype=jnp.float64))
                return float(v), np.asarray(g)

            def jac(theta):
                return vag(theta)[1]

            t0 = time.perf_counter()
            opt = optimizers[step]
            x0 = np.asarray(initial_points[step], dtype=np.float64)
            if callable(opt) and not isinstance(opt, Optimizer):
                opt_result = opt(fun=fun, x0=x0, jac=jac, bounds=None)
            else:
                opt_result = opt.minimize(fun, x0, jac=jac)
            t1 = time.perf_counter()

            energy = e_fn(opt_result.x)   # deflation-free eigenvalue estimate
            eigenvalues.append(energy)
            prev_states.append(np.asarray(compiled.state(opt_result.x)))

            if aux_operators:  # empty list/dict -> None (reference semantics)
                from .vqe import _eval_aux_ops
                if result.aux_operators_evaluated is None:
                    result.aux_operators_evaluated = []
                result.aux_operators_evaluated.append(_eval_aux_ops(
                    compiled.state(opt_result.x), aux_operators))

            result.optimal_points.append(np.asarray(opt_result.x))
            result.optimal_parameters.append(np.asarray(opt_result.x))
            result.optimal_values.append(float(opt_result.fun))
            result.optimal_circuits.append(ansatz)
            result.cost_function_evals.append(evals["n"])
            result.optimizer_times.append(t1 - t0)
            result.optimizer_results.append(opt_result)

        result.eigenvalues = np.asarray(eigenvalues)
        return result
