"""Projected-gradient optimization over partial unitaries (Stiefel manifold).

Native re-design of the reference's PartialUnitaryProjectionOptimizer
(partial_unitary_projection_optimizer.py:161-350): projected gradient
descent with alternating Barzilai-Borwein step sizes
(https://epubs.siam.org/doi/10.1137/16M1098759) and the EMA stopping
criterion  S_t = (1 - d)*|dE_t| + d*S_{t-1}  (ref :31-32).

Instead of a Python loop calling torch autograd per iterate (ref
:304-331), the ENTIRE optimization is one `jax.lax.while_loop` compiled
into a single XLA executable: value-and-grad of the energy functional, BB
step-size update, and the polar retraction all fuse on device.  One host
round-trip per inner optimization instead of O(10^4).

Compilation caching: the objective is passed as a static callable and the
problem data (RDMs, integrals) as traced operands, so successive outer-loop
iterations (new RDMs, same shapes) reuse one compiled executable.

The per-iteration callback contract `callback(iteration, energy)` (ref
:29-30) is preserved by recording the on-device energy trace and replaying
it to the callback after the loop completes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def orth(V: jnp.ndarray) -> jnp.ndarray:
    """Project onto the Stiefel manifold: the orthogonal polar factor.

    orth(V) = V Q diag(lam^-1/2) Q^T with (lam, Q) = eigh(V^T V)
    (reference: partial_unitary_projection_optimizer.py:70-83, duplicated
    at base_opt_orb_solver.py:614-626).  The n x n eigendecomposition is
    tiny (active-space sized); the M-scale work is the two GEMMs.
    """
    lam, Q = jnp.linalg.eigh(V.T @ V)
    lam = jnp.maximum(lam, 1e-14)
    return V @ (Q * jax.lax.rsqrt(lam)) @ Q.T


@dataclasses.dataclass
class StiefelOptResult:
    partial_unitary: np.ndarray
    energy: float
    iterations: int
    converged: bool
    final_S: float
    energy_trace: np.ndarray        # energies of iterates 0..iterations


@partial(jax.jit, static_argnums=(0, 1, 6))
def _bb_projected_descent(vag_fn: Callable,
                          n_data: int,
                          operands: tuple,
                          initial_stepsize: jnp.ndarray,
                          stopping_tolerance: jnp.ndarray,
                          decay_factor: jnp.ndarray,
                          maxiter: int):
    """One fused while_loop of BB projected gradient descent.

    vag_fn(U, *data) -> (energy, grad_U); operands = (U0, *data).  `data`
    rides through as traced jit operands (NOT trace-time constants) so a
    new set of RDMs does not trigger recompilation.
    Returns (U_opt, E_opt, iterations, S_final, trace).
    """
    U0, data = operands[0], operands[1:1 + n_data]
    dtype = U0.dtype
    U0 = orth(U0)
    E0, G0 = vag_fn(U0, *data)
    U1 = orth(U0 - initial_stepsize.astype(dtype) * G0)

    trace = jnp.zeros(maxiter + 2, dtype=E0.dtype).at[0].set(E0)
    S0 = 1.5 * stopping_tolerance  # ref :178

    def cond(carry):
        k, U, U_prev, G_prev, E_prev, S, tr = carry
        return jnp.logical_and(S > stopping_tolerance, k <= maxiter)

    def body(carry):
        k, U, U_prev, G_prev, E_prev, S, tr = carry
        E, G = vag_fn(U, *data)
        tr = tr.at[k].set(E)
        S_new = (1.0 - decay_factor) * jnp.abs(E - E_prev) + decay_factor * S

        dU = U - U_prev
        dG = G - G_prev
        uu = jnp.sum(dU * dU)
        ug = jnp.abs(jnp.sum(dU * dG))
        gg = jnp.sum(dG * dG)
        eps = jnp.asarray(1e-30, dtype)
        # alternating BB step sizes (ref :141-155): odd iters BB1, even BB2
        tau = jnp.where((k % 2) == 1, uu / (ug + eps), ug / (gg + eps))

        U_next = orth(U - tau * G)
        return (k + 1, U_next, U, G, E, S_new, tr)

    carry = (jnp.asarray(1), U1, U0, G0, E0, S0, trace)
    k, U, U_prev, G_prev, E_prev, S, tr = jax.lax.while_loop(cond, body, carry)
    # energy of the final iterate (not yet recorded by the loop body)
    E_final, _ = vag_fn(U, *data)
    tr = tr.at[k].set(E_final)
    return U, E_final, k, S, tr


class PartialUnitaryProjectionOptimizer:
    """API-parity wrapper for the fused BB/Stiefel descent.

    Mirrors the reference constructor
    (partial_unitary_projection_optimizer.py:15-48).  `device` and
    `gradient_method` are accepted for drop-in compatibility: placement is
    managed by JAX, and gradients are always exact reverse-mode
    (`gradient_method='finite_difference'` enables a finite-difference
    debug mode used by tests to cross-check the autodiff path).
    """

    def __init__(self,
                 initial_BBstepsize: float = 1e-3,
                 stopping_tolerance: float = 1e-5,
                 maxiter: int = 10000,
                 callback: Optional[Callable] = None,
                 decay_factor: float = 0.8,
                 gradient_method: Optional[str] = "autograd",
                 device: Optional[str] = None):
        self.callback = callback
        self.stopping_tolerance = stopping_tolerance
        self.maxiter = maxiter
        self.BBstepsize = initial_BBstepsize
        self.decay_factor = decay_factor
        self.gradient_method = gradient_method
        self.device = device
        self.last_result: Optional[StiefelOptResult] = None
        self._vag_cache: dict = {}

    def _vag_for(self, fun: Callable) -> Callable:
        """value-and-grad transform of `fun`, cached by objective identity
        so repeated outer-loop calls hit one compiled executable."""
        key = (id(fun), self.gradient_method)
        vag = self._vag_cache.get(key)
        if vag is None:
            if self.gradient_method == "finite_difference":
                vag = _finite_difference_vag(fun)
            else:
                vag = jax.value_and_grad(fun)
            self._vag_cache[key] = (vag, fun)   # keep fun alive for id()
        else:
            vag = vag[0]
        return vag

    def compute_optimal_rotation(self,
                                 fun: Callable,
                                 initial_partial_unitary,
                                 *data) -> Tuple[np.ndarray, float]:
        """Minimize `fun(U, *data)` over partial unitaries from the initial U.

        `fun` must be jax-traceable; `data` (RDMs, integral tensors, ...)
        are passed as device operands.  Returns (U_opt, E_opt), matching
        the reference's result tuple (:161).
        """
        vag_fn = self._vag_for(fun)
        U0 = jnp.asarray(initial_partial_unitary)
        data = tuple(jnp.asarray(d) for d in data)
        U, E, k, S, tr = _bb_projected_descent(
            vag_fn, len(data), (U0,) + data,
            jnp.asarray(self.BBstepsize, U0.dtype),
            jnp.asarray(self.stopping_tolerance, U0.dtype),
            jnp.asarray(self.decay_factor, U0.dtype),
            int(self.maxiter),
        )
        k = int(k)
        trace = np.asarray(tr)[: k + 1]
        if self.callback is not None:
            for it, e in enumerate(trace):
                self.callback(it, float(e))
        self.last_result = StiefelOptResult(
            partial_unitary=np.asarray(U),
            energy=float(E),
            iterations=k,
            converged=bool(float(S) <= self.stopping_tolerance),
            final_S=float(S),
            energy_trace=trace,
        )
        return np.asarray(U), float(E)


def _finite_difference_vag(energy_fn: Callable, eps: float = 1e-6):
    """Central finite-difference value-and-grad (debug mode, ref :105-127).

    Implemented with jax.vmap over one-hot perturbations so it still runs
    as a single device computation.
    """
    def vag(U, *data):
        E = energy_fn(U, *data)
        shape = U.shape
        size = U.size
        eye = jnp.eye(size, dtype=U.dtype).reshape((size,) + shape)

        def one(direction):
            return (energy_fn(U + eps * direction, *data)
                    - energy_fn(U - eps * direction, *data)) / (2.0 * eps)

        grad = jax.vmap(one)(eye).reshape(shape)
        return E, grad

    return vag
