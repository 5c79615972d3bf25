"""ADAPT-VQE: adaptive derivative-assembled ansatz growth.

The reference imports AdaptVQE from qiskit_algorithms (the only eigensolver
it does not implement itself; used by OptOrbAdaptVQE, opt_orb_adapt_vqe.py).
This is a from-scratch implementation.

Pool-gradient screening is done with a single jitted value_and_grad: ALL
candidate excitation rotations are appended to the current ansatz at
theta = 0, where dE/dtheta_k = <psi| [H, A_k] |psi> independently of the
append order — one backward pass scores the whole pool (instead of one
commutator estimation per pool element).
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np

from ..ops.pauli import SparsePauliOp
from ..sim.circuit import QuantumCircuit
from .energy import make_evaluators
from .vqe import VQE, VQEResult, AlgorithmError, _eval_aux_ops


class TerminationCriterion(enum.Enum):
    CONVERGED = "converged"
    CYCLICITY = "aborted due to a cyclic selection of evolution operators"
    MAXIMUM = "maximum number of iterations reached"


class AdaptVQEResult(VQEResult):
    def __init__(self):
        super().__init__()
        self.num_iterations: int = 0
        self.final_maximum_gradient: float = 0.0
        self.termination_criterion: Optional[TerminationCriterion] = None
        self.eigenvalue_history: List[float] = []


def _append_group(circuit: QuantumCircuit, group) -> QuantumCircuit:
    """Append one excitation rotation group with a fresh parameter."""
    theta = circuit.parameter()
    for x, z, w in group:
        circuit.pauli_rot(theta * (-2.0 * w), x, z)
    return circuit


def _make_pool_screener(pool, operator: SparsePauliOp, num_qubits: int):
    """Jitted state -> pool gradients via the commutator identity.

    Our rotations are exp(-i theta/2 * (-2w) P) = exp(i theta w P); with
    G_k = i sum_j w_j P_j (anti-Hermitian, the JW image of T_k - T_k^+),
    dE/dtheta_k at 0 is <psi|[H, G_k]|psi> = 2 Re <H psi|G_k|psi>.
    Pool Pauli terms are padded to a fixed (P, T) block so the whole
    screening is one compile regardless of the ansatz's current size.
    """
    import jax
    import jax.numpy as jnp

    hxs, hzs, hys, hcoeffs = operator.mask_arrays()
    hphase = np.power(1j, hys % 4) * hcoeffs
    T = max(len(g) for g in pool)
    P = len(pool)
    gx = np.zeros((P, T), dtype=np.int64)
    gz = np.zeros((P, T), dtype=np.int64)
    gw = np.zeros((P, T))
    gy = np.zeros((P, T), dtype=np.int64)
    for k, group in enumerate(pool):
        for j, (x, z, w) in enumerate(group):
            gx[k, j], gz[k, j], gw[k, j] = x, z, w
            gy[k, j] = bin(x & z).count("1")
    gphase = (1j) ** (gy % 4) * 1j * gw          # i * w_j * (Y phases)

    hxs_j, hzs_j = jnp.asarray(hxs), jnp.asarray(hzs)
    hph_j = jnp.asarray(hphase)
    gx_j, gz_j = jnp.asarray(gx), jnp.asarray(gz)
    gph_j = jnp.asarray(gphase)

    @jax.jit
    def screen(state):
        s = state.astype(jnp.complex128)
        idx = jnp.arange(s.shape[0])

        def pauli(x, z, v):
            perm = idx ^ x
            par = jax.lax.population_count(perm & z) & 1
            sign = (1 - 2 * par).astype(v.dtype)
            return sign * v[perm]

        phi = jnp.zeros_like(s)
        phi = jax.lax.fori_loop(
            0, hxs_j.shape[0],
            lambda k, acc: acc + hph_j[k] * pauli(hxs_j[k], hzs_j[k], s),
            phi)

        def one_group(xs, zs, phs):
            gpsi = jnp.zeros_like(s)
            gpsi = jax.lax.fori_loop(
                0, xs.shape[0],
                lambda j, acc: acc + phs[j] * pauli(xs[j], zs[j], s),
                gpsi)
            return 2.0 * jnp.real(jnp.vdot(phi, gpsi))

        return jax.vmap(one_group)(gx_j, gz_j, gph_j)

    return screen


class AdaptVQE:
    """Iteratively grows a UCC-style ansatz from an operator pool.

    Args:
        solver: a VQE whose `ansatz` was built by sim.ansatz.UCC/UCCSD —
            the excitation pool and initial state are taken from it.
        gradient_threshold: stop when max |pool gradient| falls below this.
        eigenvalue_threshold: stop when the energy improvement of the last
            growth step falls below this.
        max_iterations: cap on growth steps (None = pool size).
    """

    def __init__(self, solver: VQE, *,
                 gradient_threshold: float = 1e-5,
                 eigenvalue_threshold: float = 1e-5,
                 max_iterations: Optional[int] = None,
                 static_shapes: bool = True):
        self.solver = solver
        self.gradient_threshold = gradient_threshold
        self.eigenvalue_threshold = eigenvalue_threshold
        self.max_iterations = max_iterations
        # static_shapes: evaluate through ONE padded-pool circuit (R slots x
        # full pool, unselected angles pinned to zero) so ansatz growth
        # never changes array shapes -> a single XLA compile for the whole
        # run.  False restores the grow-and-recompile structure (one
        # compile per growth step), kept as the cross-check path.
        self.static_shapes = static_shapes

    def compute_minimum_eigenvalue(self, operator: SparsePauliOp,
                                   aux_operators=None) -> AdaptVQEResult:
        if self.static_shapes:
            pool = getattr(self.solver.ansatz, "_ucc_pool", None)
            if pool is not None:
                P = len(pool)
                R = self.max_iterations or P
                # Measured (CPU, H-chain Hamiltonians): at R*P = 676 the
                # padded circuit costs ~34x more per evaluation than a
                # half-grown circuit (29.5 ms vs 0.86 ms) while a growth
                # recompile costs ~1 s, so grow-and-recompile wins beyond a
                # few hundred blocks ON CPU.  Over a remote-TPU tunnel the
                # economics invert: every growth step's recompile is a
                # minutes-scale server-side compile, so the single-compile
                # padded path wins until far larger R*P.
                import jax as _jax
                local = _jax.default_backend() == "cpu"
                if R * P <= (256 if local else 4096):
                    return self._compute_static(operator, aux_operators)
        return self._compute_growing(operator, aux_operators)

    # -- static-shape path -------------------------------------------------
    def _compute_static(self, operator: SparsePauliOp,
                        aux_operators=None) -> AdaptVQEResult:
        """Recompile-free ADAPT: a fixed circuit of R pool blocks, growth =
        unmasking one parameter per block."""
        template = self.solver.ansatz
        pool = getattr(template, "_ucc_pool", None)
        if pool is None:
            raise AlgorithmError(
                "AdaptVQE requires an ansatz built by sim.ansatz.UCC/UCCSD "
                "(carrying its excitation pool)")
        initial = getattr(template, "_ucc_initial_state", None)
        nq = operator.num_qubits
        P = len(pool)
        R = self.max_iterations or P

        padded = initial.copy() if initial is not None else QuantumCircuit(nq)
        if padded.num_parameters:
            raise AlgorithmError("AdaptVQE initial state must be parameter-free")
        for _ in range(R):
            for group in pool:
                _append_group(padded, group)
        # the padded circuit is itself UCC-family (pool groups repeated R
        # times) — carry the excitation metadata so make_evaluators can
        # auto-dispatch it through the particle-number sector
        excs = getattr(template, "_ucc_excitations", None)
        if excs is not None and len(excs) == P:
            padded._ucc_excitations = list(excs) * R
            padded._ucc_initial_state = initial
        efn, vag = make_evaluators(padded, operator)   # the ONE compile

        theta_full = np.zeros(R * P)
        selected: List[int] = []
        history: List[float] = []
        criterion = TerminationCriterion.MAXIMUM
        max_grad_val = 0.0
        prev_energy = None
        n_evals = 0

        for it in range(1, R + 1):
            # pool screening: gradient of slot `it-1` (angles all zero there)
            _, grad = vag(theta_full)
            n_evals += 1
            slot = (it - 1) * P
            pool_grads = np.abs(np.asarray(grad)[slot: slot + P])
            best = int(np.argmax(pool_grads))
            max_grad_val = float(pool_grads[best])
            if max_grad_val < self.gradient_threshold:
                criterion = TerminationCriterion.CONVERGED
                break
            if selected and selected[-1] == best:
                # first immediate repeat terminates (upstream AdaptVQE's
                # consecutive-repeat semantics; ADVICE r1)
                criterion = TerminationCriterion.CYCLICITY
                break
            selected.append(best)
            active = np.array([r * P + s for r, s in enumerate(selected)])

            # optimize the active angles through the fixed circuit
            def fun(alpha):
                th = theta_full.copy()
                th[active] = alpha
                v, _ = vag(th)
                return float(v)

            def jac(alpha):
                th = theta_full.copy()
                th[active] = alpha
                _, g = vag(th)
                return np.asarray(g)[active]

            from scipy.optimize import minimize as scipy_minimize
            x0 = theta_full[active]
            res = scipy_minimize(fun, x0, jac=jac, method="L-BFGS-B")
            n_evals += int(res.nfev)
            theta_full[active] = res.x
            history.append(float(res.fun))
            if prev_energy is not None and \
                    abs(history[-1] - prev_energy) < self.eigenvalue_threshold:
                criterion = TerminationCriterion.CONVERGED
                break
            prev_energy = history[-1]

        result = AdaptVQEResult()
        if history:
            result.eigenvalue = history[-1]
        else:
            result.eigenvalue = float(efn(theta_full))
        # emit the equivalent compact grown circuit + its parameters
        compact = initial.copy() if initial is not None else QuantumCircuit(nq)
        for s in selected:
            _append_group(compact, pool[s])
        alpha = theta_full[[r * P + s for r, s in enumerate(selected)]] \
            if selected else np.zeros(0)
        result.optimal_point = alpha
        result.optimal_parameters = alpha
        result.optimal_value = result.eigenvalue
        result.optimal_circuit = compact
        result.cost_function_evals = n_evals
        result.num_iterations = len(history) if history else 1
        result.final_maximum_gradient = max_grad_val
        result.termination_criterion = criterion
        result.eigenvalue_history = history
        if aux_operators:  # empty list/dict -> None (reference semantics)
            from ..sim.statevector import compile_circuit
            state = compile_circuit(compact).state(alpha)
            result.aux_operators_evaluated = _eval_aux_ops(state,
                                                           aux_operators)
        return result

    # -- grow-and-recompile path (cross-check) -----------------------------
    def _compute_growing(self, operator: SparsePauliOp,
                         aux_operators=None) -> AdaptVQEResult:
        template = self.solver.ansatz
        pool = getattr(template, "_ucc_pool", None)
        if pool is None:
            raise AlgorithmError(
                "AdaptVQE requires an ansatz built by sim.ansatz.UCC/UCCSD "
                "(carrying its excitation pool)")
        initial = getattr(template, "_ucc_initial_state", None)
        nq = operator.num_qubits

        base = initial.copy() if initial is not None else QuantumCircuit(nq)
        if base.num_parameters:
            raise AlgorithmError("AdaptVQE initial state must be parameter-free")

        max_iter = self.max_iterations or len(pool)
        theta: List[float] = []
        selected: List[int] = []
        history: List[float] = []
        result = AdaptVQEResult()
        criterion = TerminationCriterion.MAXIMUM
        max_grad_val = 0.0
        prev_energy = None
        current = base.copy()
        last_vqe: Optional[VQEResult] = None

        if not pool:
            efn, _ = make_evaluators(base if base.gates else current, operator)
            result.eigenvalue = float(efn(np.zeros(0)))
            result.optimal_point = np.zeros(0)
            result.optimal_parameters = np.zeros(0)
            result.optimal_value = result.eigenvalue
            result.optimal_circuit = current
            result.num_iterations = 0
            result.termination_criterion = TerminationCriterion.CONVERGED
            return result

        screen = _make_pool_screener(pool, operator, nq)

        for it in range(1, max_iter + 1):
            # --- pool screening: dE/dtheta_k at theta_k=0 equals
            # <psi|[H, G_k]|psi> = 2 Re<H psi|G_k psi> — computed directly
            # from the current statevector, so screening needs NO probe
            # circuit and NO per-iteration recompile.
            from ..sim.statevector import compile_circuit
            state = compile_circuit(current).state(np.asarray(theta))
            pool_grads = np.abs(screen(state))
            best = int(np.argmax(pool_grads))
            max_grad_val = float(pool_grads[best])
            if max_grad_val < self.gradient_threshold:
                criterion = TerminationCriterion.CONVERGED
                break
            if len(selected) >= 2 and selected[-1] == best and selected[-2] == best:
                criterion = TerminationCriterion.CYCLICITY
                break

            # --- grow and re-optimize ---------------------------------------
            selected.append(best)
            current = _append_group(current, pool[best])
            vqe = VQE(estimator=self.solver.estimator, ansatz=current,
                      optimizer=self.solver.optimizer,
                      initial_point=np.concatenate([np.asarray(theta), [0.0]]),
                      callback=self.solver.callback)
            last_vqe = vqe.compute_minimum_eigenvalue(operator)
            theta = list(np.asarray(last_vqe.optimal_point))
            history.append(float(last_vqe.eigenvalue))
            if prev_energy is not None and \
                    abs(history[-1] - prev_energy) < self.eigenvalue_threshold:
                criterion = TerminationCriterion.CONVERGED
                break
            prev_energy = history[-1]

        if last_vqe is None:
            # pool converged immediately: evaluate the bare reference state
            efn, _ = make_evaluators(
                current if current.gates else base, operator)
            result.eigenvalue = float(efn(np.zeros(0)))
            result.optimal_point = np.zeros(0)
            result.optimal_parameters = np.zeros(0)
            result.optimal_value = result.eigenvalue
            result.optimal_circuit = current
        else:
            result.eigenvalue = last_vqe.eigenvalue
            result.optimal_point = last_vqe.optimal_point
            result.optimal_parameters = last_vqe.optimal_parameters
            result.optimal_value = last_vqe.optimal_value
            result.optimal_circuit = current
            result.cost_function_evals = last_vqe.cost_function_evals
            result.optimizer_time = last_vqe.optimizer_time
        result.num_iterations = it
        result.final_maximum_gradient = max_grad_val
        result.termination_criterion = criterion
        result.eigenvalue_history = history
        return result
