"""Estimator / Sampler / fidelity primitives backed by the JAX simulator.

API-compatible surface for the qiskit primitives the reference consumes:
  - Estimator.run(circuits, observables, parameter_values) -> job.result().values
    (reference usage: ssvqe.py:356-360, opt_orb_minimum_eigensolver.py:187-202)
  - ComputeUncompute(sampler).run(circs1, circs2, vals1, vals2)
    -> job.result().fidelities    (vqd.py:405-411)

Exact expectation values (the reference always runs Aer with
approximation=True / shots=None in its tests and examples); a `shots` option
adds Gaussian sampling noise for parity experiments.

Observables carrying a `.fermionic = (h, g)` tag (produced by
ActiveSpaceHamiltonianBuilder) are evaluated through the direct RDM
contraction path (sim/rdm.py) instead of per-Pauli reduction.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pauli import SparsePauliOp
from .circuit import QuantumCircuit
from .rdm import rdm_energy
from .statevector import compile_circuit, expectation_pauli


@dataclasses.dataclass
class EstimatorResult:
    values: np.ndarray
    metadata: List[dict]


@dataclasses.dataclass
class SamplerResult:
    quasi_dists: List[dict]
    metadata: List[dict]


class _Job:
    def __init__(self, result):
        self._result = result

    def result(self):
        return self._result


def _expectation(circuit: QuantumCircuit, observable: SparsePauliOp,
                 params) -> complex:
    compiled = compile_circuit(circuit)
    if params is None:
        params = np.zeros(compiled.num_parameters)
    state = compiled.state(jnp.asarray(params, dtype=jnp.float64))
    if getattr(observable, "fermionic", None) is not None:
        h, g = observable.fermionic
        return complex(rdm_energy(state, jnp.asarray(h), jnp.asarray(g)))
    xs, zs, ys, coeffs = observable.mask_arrays()
    return complex(expectation_pauli(state, xs, zs, ys, coeffs))


def _variance(circuit: QuantumCircuit, observable: SparsePauliOp,
              params, mean: float) -> float:
    """<H^2> - <H>^2 via |phi> = H|psi> (per-term Pauli action)."""
    compiled = compile_circuit(circuit)
    if params is None:
        params = np.zeros(compiled.num_parameters)
    state = np.asarray(compiled.state(jnp.asarray(params))).astype(complex)
    if getattr(observable, "fermionic", None) is not None:
        from ..ops.hamiltonian import ActiveSpaceHamiltonianBuilder
        # materialize the Pauli form once for variance purposes
        h, g = observable.fermionic
        observable = ActiveSpaceHamiltonianBuilder(
            observable.num_qubits).build(h, g)
    xs, zs, ys, coeffs = observable.mask_arrays()
    idx = np.arange(state.shape[0])
    phi = np.zeros_like(state)
    for x, z, y, cf in zip(xs, zs, ys, coeffs):
        perm = idx ^ x
        sign = 1.0 - 2.0 * (np.bitwise_count(
            np.bitwise_and(perm, z)).astype(np.int64) & 1)
        phi += cf * ((1j) ** (y % 4)) * sign * state[perm]
    return float(np.real(np.vdot(phi, phi)) - mean * mean)


class Estimator:
    """Exact-statevector expectation-value primitive.

    Accepts and ignores Aer-style kwargs (approximation=..., etc.) so that
    reference scripts run unchanged.
    """

    def __init__(self, approximation: bool = True, shots: Optional[int] = None,
                 seed: Optional[int] = None, **_ignored):
        self.shots = shots
        self._rng = np.random.default_rng(seed)

    def run(self, circuits, observables, parameter_values=None, **_ignored):
        if isinstance(circuits, QuantumCircuit):
            circuits = [circuits]
        if isinstance(observables, SparsePauliOp):
            observables = [observables]
        n = max(len(circuits), len(observables))
        if len(circuits) == 1:
            circuits = list(circuits) * n
        if len(observables) == 1:
            observables = list(observables) * n
        if len(circuits) != len(observables):
            raise ValueError(
                f"cannot broadcast {len(circuits)} circuits against "
                f"{len(observables)} observables")
        if parameter_values is None:
            parameter_values = [None] * n
        elif len(parameter_values) and not isinstance(
                parameter_values[0], (list, tuple, np.ndarray, jnp.ndarray)):
            # a single flat parameter set
            parameter_values = [parameter_values] * n
        values = np.empty(n, dtype=np.float64)
        meta: List[dict] = []
        for i, (c, o, p) in enumerate(zip(circuits, observables, parameter_values)):
            v = _expectation(c, o, p).real
            variance = 0.0
            if self.shots is not None:
                # exact shot noise: var(H) = <H^2> - <H>^2 from the
                # statevector, sampled as Gaussian of width sqrt(var/shots)
                variance = max(0.0, _variance(c, o, p, v))
                v = v + self._rng.normal(0.0, np.sqrt(variance / self.shots))
            values[i] = v
            meta.append({"shots": self.shots, "variance": variance})
        return _Job(EstimatorResult(values=values, metadata=meta))


class Sampler:
    """Exact quasi-probability sampler (API parity for ComputeUncompute)."""

    def __init__(self, shots: Optional[int] = None, seed: Optional[int] = None,
                 **_ignored):
        self.shots = shots

    def run(self, circuits, parameter_values=None, **_ignored):
        if isinstance(circuits, QuantumCircuit):
            circuits = [circuits]
        if parameter_values is None:
            parameter_values = [None] * len(circuits)
        dists, meta = [], []
        for c, p in zip(circuits, parameter_values):
            compiled = compile_circuit(c)
            if p is None:
                p = np.zeros(compiled.num_parameters)
            probs = np.abs(np.asarray(compiled.state(jnp.asarray(p)))) ** 2
            dists.append({i: float(pr) for i, pr in enumerate(probs) if pr > 1e-16})
            meta.append({"shots": self.shots})
        return _Job(SamplerResult(quasi_dists=dists, metadata=meta))


@dataclasses.dataclass
class FidelityResult:
    fidelities: np.ndarray
    metadata: List[dict]


class ComputeUncompute:
    """State fidelity |<psi_1|psi_2>|^2 computed directly from statevectors."""

    def __init__(self, sampler: Optional[Sampler] = None, **_ignored):
        self.sampler = sampler

    def run(self, circuits_1, circuits_2, values_1=None, values_2=None,
            **_ignored):
        if isinstance(circuits_1, QuantumCircuit):
            circuits_1 = [circuits_1]
        if isinstance(circuits_2, QuantumCircuit):
            circuits_2 = [circuits_2]
        n = max(len(circuits_1), len(circuits_2))
        if len(circuits_1) == 1:
            circuits_1 = list(circuits_1) * n
        if len(circuits_2) == 1:
            circuits_2 = list(circuits_2) * n
        if len(circuits_1) != len(circuits_2):
            raise ValueError(
                f"cannot broadcast {len(circuits_1)} against "
                f"{len(circuits_2)} circuits")
        if values_1 is None:
            values_1 = [None] * n
        if values_2 is None:
            values_2 = [None] * n
        fids = np.empty(n)
        for i, (c1, c2, v1, v2) in enumerate(
                zip(circuits_1, circuits_2, values_1, values_2)):
            s1 = compile_circuit(c1).state(
                jnp.asarray(v1 if v1 is not None else np.zeros(c1.num_parameters)))
            s2 = compile_circuit(c2).state(
                jnp.asarray(v2 if v2 is not None else np.zeros(c2.num_parameters)))
            fids[i] = float(np.abs(np.vdot(np.asarray(s1), np.asarray(s2))) ** 2)
        return _Job(FidelityResult(fidelities=fids, metadata=[{}] * n))
