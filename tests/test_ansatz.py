"""Unit tests: ansatz library (sim/ansatz.py)."""

import numpy as np

from esoo_tpu.sim import (HartreeFock, RealAmplitudes, TwoLocal, UCCSD,
                          compile_circuit, generate_excitations,
                          hartree_fock_bitmask)


def test_hf_bitmask_and_state():
    assert hartree_fock_bitmask(2, (1, 1)) == 0b0101
    sv = np.asarray(compile_circuit(HartreeFock(2, (1, 1))).state())
    assert np.argmax(np.abs(sv)) == 0b0101
    np.testing.assert_allclose(np.abs(sv[0b0101]), 1.0)


def test_excitation_counts():
    # (1,1) in 2 spatial orbitals: 2 singles, 1 double
    excs = generate_excitations(2, (1, 1), "sd")
    singles = [e for e in excs if len(e[0]) == 1]
    doubles = [e for e in excs if len(e[0]) == 2]
    assert len(singles) == 2 and len(doubles) == 1
    # (2,2) in 4 spatial: 8 singles; doubles conserving Sz
    excs = generate_excitations(4, (2, 2), "sd")
    singles = [e for e in excs if len(e[0]) == 1]
    assert len(singles) == 8


def num_particles_of(sv, n_qubits):
    probs = np.abs(sv) ** 2
    counts = np.array([bin(i).count("1") for i in range(1 << n_qubits)])
    return probs @ counts


def test_uccsd_conserves_particle_number():
    qc = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    rng = np.random.default_rng(5)
    for _ in range(3):
        sv = np.asarray(compile_circuit(qc).state(
            rng.normal(size=qc.num_parameters)))
        np.testing.assert_allclose(np.linalg.norm(sv), 1.0, atol=1e-12)
        np.testing.assert_allclose(num_particles_of(sv, 4), 2.0, atol=1e-12)


def test_uccsd_unitarity_exactness():
    """Product of commuting rotations == matrix exponential of the summed
    generator (the exactness claim in sim/ansatz.py docstring)."""
    from scipy.linalg import expm
    from esoo_tpu.ops import SparsePauliOp
    from esoo_tpu.sim.ansatz import excitation_rotation_group
    theta = 0.4321
    group = ((0, 1), (2, 3))  # double excitation 0,1 -> 2,3 on 4 modes
    terms = excitation_rotation_group(group[0], group[1], 4)
    gen = np.zeros((16, 16), dtype=complex)
    for x, z, w in terms:
        from esoo_tpu.ops.pauli import masks_to_label
        gen += 1j * w * SparsePauliOp(
            ([x], [z]), [1.0], num_qubits=4).to_matrix()
    U_exact = expm(theta * gen)
    # product of individual rotations
    U_prod = np.eye(16, dtype=complex)
    for x, z, w in terms:
        P = SparsePauliOp(([x], [z]), [1.0], num_qubits=4).to_matrix()
        U_prod = expm(1j * theta * w * P) @ U_prod
    np.testing.assert_allclose(U_prod, U_exact, atol=1e-12)


def test_two_local_param_count():
    qc = TwoLocal(4, "ry", "cx", "full", reps=2)
    assert qc.num_parameters == 4 * 3   # (reps+1) rotation layers
    qc = RealAmplitudes(3, reps=1)
    assert qc.num_parameters == 6
