"""Complex-RDM inner objective (reference base_opt_orb_solver.py:575-580).

When `wavefuntion_real=False` and the measured RDMs are complex, the
complex128 tensors are kept through the inner orbital objective.  The
reference branch subtracts the two-body term (a sign quirk exercised by no
reference test); ours uses the physically correct E1 + E2 and these tests
pin that against a direct expectation value of a GENUINELY complex state.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from esoo_tpu.orbital_optimization.base import (BaseOptOrbSolver,
                                                _so_objective_complex,
                                                _spatial_objective_complex)
from esoo_tpu.orbital_optimization.stiefel import (
    PartialUnitaryProjectionOptimizer)
from esoo_tpu.sim import QuantumCircuit
from esoo_tpu.sim.rdm import rdm_energy
from esoo_tpu.sim.statevector import compile_circuit


@pytest.fixture(scope="module")
def complex_state():
    """A 4-qubit state with genuinely complex amplitudes in the (1, 1)
    particle sector: superposition of HF and a double excitation with a
    relative phase."""
    qc = QuantumCircuit(4)
    qc.x(0)
    qc.x(2)
    # create a superposition |0011> + |1100>-type pair, then a relative
    # phase via rz
    qc.ry(0.7, 1)
    qc.cx(1, 3)
    qc.cx(1, 0)
    qc.cx(3, 2)
    qc.rz(0.9, 1)
    sv = np.asarray(compile_circuit(qc).state())
    assert np.abs(np.imag(sv)).max() > 0.05   # genuinely complex
    return sv


def test_complex_rdms_have_imaginary_parts(h2_631g, complex_state):
    solver = BaseOptOrbSolver(num_spin_orbitals=4,
                              integral_tensors=h2_631g.integral_tensors())
    gamma, Gamma = solver.measure_rdms_direct(complex_state)
    assert np.iscomplexobj(gamma)
    assert np.abs(np.imag(Gamma)).max() > 1e-3
    # Hermiticity: gamma^dagger == gamma
    np.testing.assert_allclose(gamma, gamma.conj().T, atol=1e-12)


def test_complex_objective_matches_direct_expectation(h2_631g, complex_state):
    """E(U) from the complex-RDM objective == <psi|H(U)|psi> computed
    directly from the statevector and the rotated Hamiltonian."""
    solver = BaseOptOrbSolver(num_spin_orbitals=4,
                              integral_tensors=h2_631g.integral_tensors())
    gamma, Gamma = solver.measure_rdms_direct(complex_state)

    objective, data = solver._inner_objective_and_data([gamma], [Gamma])
    assert objective in (_spatial_objective_complex, _so_objective_complex)
    assert np.iscomplexobj(np.asarray(data[0]))

    U0 = np.asarray(solver.initial_partial_unitary)
    e_obj = float(objective(jnp.asarray(U0), *data))

    H = solver.get_rotated_hamiltonian(U0)
    h_so, g_so = H.fermionic
    e_direct = float(rdm_energy(jnp.asarray(complex_state),
                                jnp.asarray(h_so), jnp.asarray(g_so)))
    np.testing.assert_allclose(e_obj, e_direct, atol=1e-10)

    # and at a non-trivial rotation
    rng = np.random.default_rng(3)
    U1 = solver.orth(U0 + 0.1 * rng.normal(size=U0.shape))
    e_obj1 = float(objective(jnp.asarray(U1), *data))
    H1 = solver.get_rotated_hamiltonian(U1)
    h1, g1 = H1.fermionic
    e_direct1 = float(rdm_energy(jnp.asarray(complex_state),
                                 jnp.asarray(h1), jnp.asarray(g1)))
    np.testing.assert_allclose(e_obj1, e_direct1, atol=1e-10)


def test_inner_optimization_with_complex_rdms(h2_631g, complex_state):
    """The Stiefel/BB descent runs end-to-end on complex RDM data: energy
    decreases and U stays on the manifold."""
    solver = BaseOptOrbSolver(num_spin_orbitals=4,
                              integral_tensors=h2_631g.integral_tensors())
    gamma, Gamma = solver.measure_rdms_direct(complex_state)
    pupo = PartialUnitaryProjectionOptimizer(1e-3, 1e-6, 5000)
    objective, data = solver._inner_objective_and_data([gamma], [Gamma])
    U0 = jnp.asarray(solver.initial_partial_unitary)
    e0 = float(objective(U0, *data))
    U_opt, e_opt = solver._run_inner_optimization(pupo, U0, [gamma], [Gamma])
    assert e_opt <= e0 + 1e-12
    U_opt = np.asarray(U_opt)
    np.testing.assert_allclose(U_opt.T @ U_opt, np.eye(U_opt.shape[1]),
                               atol=1e-8)


def test_wavefunction_real_flag_forces_real_path(h2_631g, complex_state):
    """wavefuntion_real=True keeps the real inner objective even for
    complex-dtype RDM input (reference flag semantics)."""
    solver = BaseOptOrbSolver(num_spin_orbitals=4,
                              integral_tensors=h2_631g.integral_tensors(),
                              wavefuntion_real=True)
    gamma, Gamma = solver.measure_rdms_direct(complex_state)
    objective, data = solver._inner_objective_and_data([gamma], [Gamma])
    assert not np.iscomplexobj(np.asarray(data[0]))
