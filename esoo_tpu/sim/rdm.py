"""Direct reduced-density-matrix extraction from statevectors.

This is THE key architectural departure from the reference: instead of
estimating O(N^4) individual Pauli operators with sequential estimator calls
(opt_orb_minimum_eigensolver.py:187-202 — thousands of Python->Aer crossings
per outer iteration), the RDMs are computed by building annihilated states

    Phi[p]      = a_p |psi>                    (N x 2^n)
    B[(r<s)]    = a_s a_r |psi>                (N(N-1)/2 x 2^n)

and contracting two GEMMs:

    gamma[p,q]        = (Phi* Phi^T)[p,q]       =  <a+_p a_q>
    C[(p,q),(r,s)]    = (B* B^T)                =  <a+_p a+_q a_s a_r>, p<q, r<s

followed by the antisymmetric unpacking Gamma = T C T^T.  These are exactly
MXU-shaped operations; the mathematical result is identical to the
per-Pauli-operator path (kept in sim/estimator.py for parity checks).

Fermionic convention: JW little-endian, a_p |b> =
  delta(b_p = 1) * (-1)^{popcount(b & (2^p - 1))} |b ^ 2^p>.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def annihilate(state: jnp.ndarray, p) -> jnp.ndarray:
    """Apply a_p to a statevector (p may be a traced int32 scalar)."""
    dim = state.shape[0]
    idx = jnp.arange(dim)
    bit = jnp.left_shift(1, p)
    lower = bit - 1
    parity = jax.lax.population_count(idx & lower) & 1
    sign = (1 - 2 * parity).astype(state.dtype)
    src = state[idx | bit]
    empty = (idx & bit) == 0
    return jnp.where(empty, sign * src, 0.0)


def annihilation_states(state: jnp.ndarray, num_modes: int) -> jnp.ndarray:
    """Phi[p] = a_p |state> for p = 0..num_modes-1, shape (N, dim)."""
    ps = jnp.arange(num_modes)
    return jax.vmap(lambda p: annihilate(state, p))(ps)


@lru_cache(maxsize=None)
def _pair_indices(num_modes: int):
    pairs = [(r, s) for r in range(num_modes) for s in range(num_modes) if r < s]
    return np.array(pairs, dtype=np.int64)


@lru_cache(maxsize=None)
def pair_unpack_matrix(num_modes: int) -> np.ndarray:
    """T[(p*N+q), k] with +1 for (p<q) pairs and -1 for the swapped entry.

    Unpacks packed pair-indexed matrices to the full antisymmetric tensor:
      Gamma.reshape(N^2, N^2) = T @ C @ T.T
    """
    N = num_modes
    pairs = _pair_indices(N)
    P = len(pairs)
    T = np.zeros((N * N, P))
    for k, (r, s) in enumerate(pairs):
        T[r * N + s, k] = 1.0
        T[s * N + r, k] = -1.0
    return T


def pair_annihilation_states(state: jnp.ndarray, num_modes: int) -> jnp.ndarray:
    """B[k] = a_s a_r |state> for the k-th pair (r<s), shape (P, dim)."""
    pairs = jnp.asarray(_pair_indices(num_modes))

    def one(pair):
        r, s = pair[0], pair[1]
        return annihilate(annihilate(state, r), s)

    return jax.vmap(one)(pairs)


def one_rdm(state: jnp.ndarray, num_modes: int) -> jnp.ndarray:
    """gamma[p,q] = <psi| a+_p a_q |psi>."""
    phi = annihilation_states(state, num_modes)
    return jnp.conj(phi) @ phi.T


def two_rdm(state: jnp.ndarray, num_modes: int) -> jnp.ndarray:
    """Gamma[p,q,r,s] = <psi| a+_p a+_q a_s a_r |psi>."""
    N = num_modes
    B = pair_annihilation_states(state, N)
    C = jnp.conj(B) @ B.T
    T = jnp.asarray(pair_unpack_matrix(N), dtype=C.dtype)
    full = T @ C @ T.T
    return full.reshape(N, N, N, N)


def rdm_energy(state: jnp.ndarray, h: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """E = sum h*gamma + sum g*Gamma, computed without materializing Gamma.

    Contracts the packed pair matrix against the pair-packed g tensor:
      E2 = sum_{(p<q),(r<s)} [g_pqrs - g_qprs - g_pqsr + g_qpsr] * C[(pq),(rs)]
    """
    N = h.shape[0]
    gamma = one_rdm(state, N)
    B = pair_annihilation_states(state, N)
    C = jnp.conj(B) @ B.T
    T = jnp.asarray(pair_unpack_matrix(N), dtype=C.dtype)
    g_packed = T.T @ g.reshape(N * N, N * N).astype(C.dtype) @ T
    e1 = jnp.sum(h.astype(C.dtype) * gamma)
    e2 = jnp.sum(g_packed * C)
    return jnp.real(e1 + e2)
