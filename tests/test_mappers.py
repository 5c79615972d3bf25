"""Parity / Bravyi-Kitaev mapper tests.

The reference accepts any qiskit-nature QubitMapper (base_opt_orb_solver.py:
22,115); these tests validate our native parity and BK encodings against
exact algebraic oracles (CAR algebra, encoded number operators, spectrum
equality with JW) and through the full VQE / OptOrbVQE stack.
"""

import numpy as np
import pytest

from esoo_tpu.ops import (ActiveSpaceHamiltonianBuilder, BravyiKitaevMapper,
                          FermionicOp, JordanWignerMapper, ParityMapper)
from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
from esoo_tpu.solvers import L_BFGS_B, VQE

GROUND_STO3G = -1.85727503

MAPPERS = [ParityMapper, BravyiKitaevMapper]


def _ladders(mapper, n):
    a = [mapper.map(FermionicOp({f"-_{p}": 1.0}, n)).to_matrix()
         for p in range(n)]
    return a, [m.conj().T for m in a]


@pytest.mark.parametrize("mapper_cls", MAPPERS)
@pytest.mark.parametrize("n", [4, 6])  # 6: non-power-of-2 Fenwick tree
def test_car_algebra(mapper_cls, n):
    """{a_p, a+_q} = delta_pq, {a_p, a_q} = 0 as dense matrices."""
    a, ad = _ladders(mapper_cls(), n)
    eye = np.eye(2 ** n)
    for p in range(n):
        for q in range(n):
            anti = a[p] @ ad[q] + ad[q] @ a[p]
            np.testing.assert_allclose(anti, eye if p == q else 0 * eye,
                                       atol=1e-12)
            np.testing.assert_allclose(a[p] @ a[q] + a[q] @ a[p], 0 * eye,
                                       atol=1e-12)


@pytest.mark.parametrize("mapper_cls", MAPPERS)
def test_number_operator_on_encoded_basis(mapper_cls):
    """<A b| a+_p a_p |A b> = b_p for every occupation bitmask b, and
    decode_mask inverts encode_mask."""
    n = 4
    m = mapper_cls()
    a, ad = _ladders(m, n)
    for b in range(2 ** n):
        eb = m.encode_mask(b, n)
        assert m.decode_mask(eb, n) == b
        v = np.zeros(2 ** n)
        v[eb] = 1.0
        for p in range(n):
            occ = v @ (ad[p] @ a[p]) @ v
            np.testing.assert_allclose(occ, (b >> p) & 1, atol=1e-12)


def test_hamiltonian_spectrum_equality():
    """The same (h, g) active-space tensors give isospectral qubit
    Hamiltonians under JW, parity, and BK."""
    from conftest import random_hermitian_tensors
    n = 4
    h, g = random_hermitian_tensors(n, seed=3)
    ref = None
    for mapper in (JordanWignerMapper(), ParityMapper(),
                   BravyiKitaevMapper()):
        H = ActiveSpaceHamiltonianBuilder(n, mapper).build(h, g).to_matrix()
        np.testing.assert_allclose(H, H.conj().T, atol=1e-12)
        ev = np.linalg.eigvalsh(H)
        if ref is None:
            ref = ev
        else:
            np.testing.assert_allclose(ev, ref, atol=1e-10)


@pytest.mark.parametrize("mapper_cls", MAPPERS)
def test_encoded_hf_energy_matches_jw(h2_sto3g, mapper_cls):
    """<HF|H|HF> is encoding-invariant when both the Hamiltonian and the
    HF preparation use the same mapper."""
    h, g = h2_sto3g.integral_tensors()
    e_ref = None
    for mapper in (JordanWignerMapper(), mapper_cls()):
        H = ActiveSpaceHamiltonianBuilder(4, mapper).build(h, g)
        hf = HartreeFock(2, (1, 1), qubit_mapper=mapper)
        e = Estimator().run([hf], [H], [[]]).result().values[0]
        if e_ref is None:
            e_ref = e
        else:
            np.testing.assert_allclose(e, e_ref, atol=1e-10)


@pytest.mark.parametrize("mapper_cls", MAPPERS)
def test_vqe_uccsd_under_encoding(h2_sto3g, mapper_cls):
    """Full VQE through the encoded stack (mapper-aware HartreeFock + UCCSD
    rotation groups + generic Pauli evaluators) reaches the exact H2/STO-3G
    ground state."""
    mapper = mapper_cls()
    h, g = h2_sto3g.integral_tensors()
    H = ActiveSpaceHamiltonianBuilder(4, mapper).build(h, g)
    assert H.fermionic is None  # direct contraction path must NOT engage
    ansatz = UCCSD(2, (1, 1), qubit_mapper=mapper,
                   initial_state=HartreeFock(2, (1, 1), qubit_mapper=mapper))
    vqe = VQE(Estimator(), ansatz, L_BFGS_B(),
              initial_point=np.zeros(ansatz.num_parameters))
    res = vqe.compute_minimum_eigenvalue(H)
    np.testing.assert_allclose(res.eigenvalue, GROUND_STO3G, atol=1e-5)


def test_optorbvqe_parity_mapper_e2e(h2_631g):
    """OptOrbVQE with a non-JW mapper: the per-Pauli RDM path engages
    (direct auto-switches with a warning) and the outer loop reaches the
    reference optimum (tests/test_optorbvqe.py:67) at decimal=3."""
    from esoo_tpu.orbital_optimization import (
        OptOrbVQE, PartialUnitaryProjectionOptimizer)

    mapper = ParityMapper()
    ansatz = UCCSD(2, (1, 1), qubit_mapper=mapper,
                   initial_state=HartreeFock(2, (1, 1), qubit_mapper=mapper))
    vqe = VQE(Estimator(), ansatz, L_BFGS_B(),
              initial_point=np.zeros(ansatz.num_parameters))
    with pytest.warns(UserWarning, match="requires the Jordan-Wigner"):
        solver = OptOrbVQE(
            num_spin_orbitals=4, ground_state_solver=vqe, mapper=mapper,
            partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
                initial_BBstepsize=1e-3, stopping_tolerance=1e-5,
                maxiter=10000),
            problem=h2_631g, maxiter=20, spin_conserving=True,
            wavefuntion_real=True)
    assert solver.rdm_measurement == "pauli"
    result = solver.compute_minimum_energy()
    np.testing.assert_array_almost_equal(result.eigenvalue,
                                         -1.8661038079694765, decimal=3)


def test_sector_rejects_non_jw_ansatz():
    """SectorUCC reads the initial-state X mask as occupations — only valid
    under JW; non-JW circuits must raise ValueError (so eligibility probes
    fall back to the full simulator instead of silently mis-simulating)."""
    from esoo_tpu.sim.sector import SectorUCC

    mapper = ParityMapper()
    ansatz = UCCSD(2, (1, 1), qubit_mapper=mapper,
                   initial_state=HartreeFock(2, (1, 1), qubit_mapper=mapper))
    with pytest.raises(ValueError, match="Jordan-Wigner"):
        SectorUCC(ansatz, 4)


def test_sector_probe_none_for_non_jw():
    from esoo_tpu.solvers.energy import _sector_for

    mapper = BravyiKitaevMapper()
    ansatz = UCCSD(2, (1, 1), qubit_mapper=mapper,
                   initial_state=HartreeFock(2, (1, 1), qubit_mapper=mapper))
    assert _sector_for(ansatz) is None


def test_ucc_rejects_mismatched_initial_state_encoding():
    with pytest.raises(ValueError, match="encoding"):
        UCCSD(2, (1, 1), qubit_mapper=ParityMapper(),
              initial_state=HartreeFock(2, (1, 1)))  # JW-encoded HF
