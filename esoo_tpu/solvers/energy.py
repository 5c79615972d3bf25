"""Jit-compiled energy / gradient evaluators shared by the eigensolvers.

The hot path: theta -> statevector -> RDM-contraction energy, as a single
XLA executable with (h, g) as runtime arguments so that outer-loop
Hamiltonian rebuilds (new rotated integrals every iteration,
opt_orb_minimum_eigensolver.py:237 in the reference) do NOT trigger
recompilation — the circuit structure is the only compile-time key.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pauli import SparsePauliOp
from ..sim.circuit import QuantumCircuit
from ..sim.rdm import rdm_energy
from ..sim.statevector import CompiledCircuit, compile_circuit

_FERMI_CACHE: Dict[tuple, tuple] = {}
_SECTOR_CACHE: Dict[tuple, object] = {}


def _sector_for(circuit: QuantumCircuit):
    """SectorUCC for a UCC-family circuit with its own occupation-basis
    initial state, or None when the circuit is not sector-eligible.
    Cached on the circuit fingerprint."""
    key = circuit.fingerprint()
    if key in _SECTOR_CACHE:
        return _SECTOR_CACHE[key]
    sec = None
    try:
        from ..sim.sector import SectorUCC
        sec = SectorUCC(circuit, circuit.num_qubits)
        if sec.init_index is None:
            sec = None
    except (ValueError, AssertionError):
        sec = None
    _SECTOR_CACHE[key] = sec
    return sec


def _sector_jits(sec) -> tuple:
    """(build_h, energy, value_and_grad) jitted once per SectorUCC."""
    jits = getattr(sec, "_jits", None)
    if jits is None:
        build = jax.jit(sec.build_values)
        e = jax.jit(sec.energy_values)
        vag = jax.jit(jax.value_and_grad(sec.energy_values))
        jits = sec._jits = (build, e, vag)
    return jits


def fermionic_evaluators(compiled: CompiledCircuit, fingerprint) -> tuple:
    """(energy, value_and_grad) jitted functions of (theta, h, g)."""
    key = (fingerprint, compiled.is_real)
    hit = _FERMI_CACHE.get(key)
    if hit is not None:
        return hit
    state_fn = compiled.state_fn

    def energy(theta, h, g):
        return rdm_energy(state_fn(theta), h, g)

    e_jit = jax.jit(energy)
    vag_jit = jax.jit(jax.value_and_grad(energy))
    _FERMI_CACHE[key] = (e_jit, vag_jit)
    return e_jit, vag_jit


def pauli_evaluators(compiled: CompiledCircuit, op: SparsePauliOp) -> tuple:
    """(energy, value_and_grad) jitted for a fixed Hermitian Pauli sum."""
    xs, zs, ys, coeffs = op.mask_arrays()
    state_fn = compiled.state_fn
    if compiled.is_real:
        # real states: only even-Y strings contribute; weights are real
        keep = ys % 2 == 0
        xs, zs, ys = xs[keep], zs[keep], ys[keep]
        w = np.real(coeffs[keep] * np.power(1j, ys % 4))
        xs_j, zs_j = jnp.asarray(xs), jnp.asarray(zs)
        w_j = jnp.asarray(w)

        def energy(theta):
            s = state_fn(theta)
            idx = jnp.arange(s.shape[0])

            def one(x, z):
                perm = idx ^ x
                par = jax.lax.population_count(perm & z) & 1
                sign = (1 - 2 * par).astype(s.dtype)
                return jnp.sum(s * sign * s[perm])

            q = jax.vmap(one)(xs_j, zs_j)
            return jnp.sum(w_j * q)

    else:
        phases = np.power(1j, ys % 4)
        c_j = jnp.asarray(coeffs * phases)
        xs_j, zs_j = jnp.asarray(xs), jnp.asarray(zs)

        def energy(theta):
            s = state_fn(theta)
            idx = jnp.arange(s.shape[0])

            def one(x, z):
                perm = idx ^ x
                par = jax.lax.population_count(perm & z) & 1
                sign = (1 - 2 * par).astype(s.dtype)
                return jnp.sum(jnp.conj(s) * sign * s[perm])

            q = jax.vmap(one)(xs_j, zs_j)
            return jnp.real(jnp.sum(c_j * q))

    return jax.jit(energy), jax.jit(jax.value_and_grad(energy))


def make_evaluators(circuit: QuantumCircuit, operator: SparsePauliOp):
    """Dispatch to the fermionic fast path when the operator carries (h, g).

    Returns (energy_fn(theta) -> float, vag_fn(theta) -> (float, grad)).
    """
    compiled = compile_circuit(circuit)
    # the fermionic fast path contracts RDMs from occupation-basis
    # amplitudes, which only the Jordan-Wigner encoding preserves;
    # parity/BK-encoded circuits take the per-Pauli path (the operator's
    # Pauli terms already carry the right encoding)
    occupation_basis = getattr(circuit, "_encoding", "jw") == "jw"
    if getattr(operator, "fermionic", None) is not None and occupation_basis:
        h, g = operator.fermionic
        h_j = jnp.asarray(h)
        g_j = jnp.asarray(g)

        sec = _sector_for(circuit)
        if sec is not None:
            # particle-number-sector fast path (sim/sector.py): the dense
            # sector Hamiltonian is built once per operator (i.e. once per
            # OptOrb outer iteration) and every optimizer iterate is
            # Givens gates + one GEMV in the C(n,na)*C(n,nb)-dim sector
            build, e_jit_s, vag_jit_s = _sector_jits(sec)
            Hs = build(h_j, g_j)

            def energy(theta):
                return float(e_jit_s(jnp.asarray(theta), Hs))

            def vag(theta):
                v, gr = vag_jit_s(jnp.asarray(theta), Hs)
                return float(v), np.asarray(gr)

            return energy, vag

        e_jit, vag_jit = fermionic_evaluators(compiled, circuit.fingerprint())

        def energy(theta):
            return float(e_jit(jnp.asarray(theta), h_j, g_j))

        def vag(theta):
            v, gr = vag_jit(jnp.asarray(theta), h_j, g_j)
            return float(v), np.asarray(gr)

        return energy, vag

    e_jit, vag_jit = pauli_evaluators(compiled, operator)

    def energy(theta):
        return float(e_jit(jnp.asarray(theta)))

    def vag(theta):
        v, gr = vag_jit(jnp.asarray(theta))
        return float(v), np.asarray(gr)

    return energy, vag
