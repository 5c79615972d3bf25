"""Tier-2 tests: VQE / SSVQE / MCVQE / VQD / AdaptVQE on H2 STO-3G.

Expected energies are the reference's hard-coded values
(tests/test_ssvqe.py:88, tests/test_ci_initializations.py:43-45).
"""

import numpy as np
import pytest

from esoo_tpu.sim import (ComputeUncompute, Estimator, HartreeFock,
                          QuantumCircuit, Sampler, UCCSD)
from esoo_tpu.solvers import (SSVQE, VQD, VQE, AdaptVQE, AlgorithmError,
                              L_BFGS_B, MCVQE, NumPyMinimumEigensolver)

GROUND = -1.85727503
EXCITED_1 = -1.24458455


@pytest.fixture(scope="module")
def H(h2_sto3g_hamiltonian):
    return h2_sto3g_hamiltonian


@pytest.fixture()
def uccsd_ansatz():
    return UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))


def test_exact_solver(H):
    res = NumPyMinimumEigensolver().compute_minimum_eigenvalue(H)
    np.testing.assert_allclose(res.eigenvalue, GROUND, atol=1e-7)


class TestVQE:
    def test_ground_state(self, H, uccsd_ansatz):
        vqe = VQE(Estimator(), uccsd_ansatz, L_BFGS_B(),
                  initial_point=np.zeros(uccsd_ansatz.num_parameters))
        res = vqe.compute_minimum_eigenvalue(H)
        np.testing.assert_allclose(res.eigenvalue, GROUND, atol=1e-5)

    def test_callback_invoked(self, H, uccsd_ansatz):
        seen = []
        vqe = VQE(Estimator(), uccsd_ansatz, L_BFGS_B(),
                  initial_point=np.zeros(uccsd_ansatz.num_parameters),
                  callback=lambda n, p, e, m: seen.append((n, e)))
        vqe.compute_minimum_eigenvalue(H)
        assert len(seen) > 0
        assert seen[0][0] == 1

    def test_qubit_mismatch_raises(self, H):
        bad = UCCSD(3, (1, 1), initial_state=HartreeFock(3, (1, 1)))
        with pytest.raises(AlgorithmError):
            VQE(Estimator(), bad, L_BFGS_B()).compute_minimum_eigenvalue(H)

    def test_unparameterized_ansatz_raises(self, H):
        with pytest.raises(AlgorithmError):
            VQE(Estimator(), HartreeFock(2, (1, 1)),
                L_BFGS_B()).compute_minimum_eigenvalue(H)

    def test_aux_operators(self, H, uccsd_ansatz):
        from esoo_tpu.ops import SparsePauliOp
        num_op = SparsePauliOp.from_list(
            [("IIII", 2.0), ("IIIZ", -0.5), ("IIZI", -0.5),
             ("IZII", -0.5), ("ZIII", -0.5)])  # total particle number
        vqe = VQE(Estimator(), uccsd_ansatz, L_BFGS_B(),
                  initial_point=np.zeros(uccsd_ansatz.num_parameters))
        res = vqe.compute_minimum_eigenvalue(H, aux_operators=[num_op])
        np.testing.assert_allclose(res.aux_operators_evaluated[0][0], 2.0,
                                   atol=1e-8)


class TestSSVQE:
    def _solver(self, **kw):
        ansatz = UCCSD(2, (1, 1), reps=2)
        init0 = HartreeFock(2, (1, 1))
        init1 = QuantumCircuit(4)
        init1.x(1)
        init1.x(2)
        # NOTE: a zero initial point is a symmetric saddle for the second
        # state (|0110> is an equal singlet/triplet superposition that
        # spin-conserving UCCSD cannot split at theta=0; the weighted cost
        # stalls at the -1.0637 average).  A small random start breaks it.
        x0 = np.random.default_rng(2).normal(
            0, 0.1, ansatz.num_parameters)
        defaults = dict(k=2, ansatz=ansatz, optimizer=L_BFGS_B(),
                        initial_states=[init0, init1], weight_vector=[2, 1],
                        initial_point=x0)
        defaults.update(kw)
        return SSVQE(**defaults)

    def test_two_lowest_states(self, H):
        res = self._solver().compute_eigenvalues(H)
        np.testing.assert_allclose(res.eigenvalues[0], GROUND, atol=1e-5)
        np.testing.assert_allclose(res.eigenvalues[1], EXCITED_1, atol=1e-5)

    def test_wrong_weight_count_raises(self, H):
        with pytest.raises(AlgorithmError):
            self._solver(weight_vector=[1, 2, 3]).compute_eigenvalues(H)

    def test_non_orthogonal_initial_states_raise(self, H):
        same = HartreeFock(2, (1, 1))
        with pytest.raises(AlgorithmError):
            self._solver(
                initial_states=[same, same.copy()]).compute_eigenvalues(H)

    def test_wrong_initial_state_count_raises(self, H):
        with pytest.raises(AlgorithmError):
            self._solver(
                initial_states=[HartreeFock(2, (1, 1))]).compute_eigenvalues(H)

    def test_callback(self, H):
        seen = []
        res = self._solver(
            callback=lambda n, p, e, m: seen.append(e)).compute_eigenvalues(H)
        assert len(seen) == res.cost_function_evals
        assert all(len(e) == 2 for e in seen)


class TestMCVQE:
    def test_cis_initialized(self, H, h2_sto3g):
        h, g = h2_sto3g.integral_tensors()
        ansatz = UCCSD(2, (1, 1), reps=1)
        mc = MCVQE(k=2, ansatz=ansatz, optimizer=L_BFGS_B(),
                   num_particles=(1, 1), one_body_integrals=h,
                   two_body_integrals=g, excitations="s",
                   initial_point=np.zeros(ansatz.num_parameters))
        res = mc.compute_eigenvalues(H)
        # CIS-quality eigenvalues, refined by the contracted Hamiltonian
        np.testing.assert_allclose(res.eigenvalues[0], GROUND, atol=2e-2)
        np.testing.assert_allclose(res.eigenvalues[1], EXCITED_1, atol=2e-2)
        assert res.contracted_hamiltonian.shape == (2, 2)


class TestVQD:
    def test_deflation(self, H):
        ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)),
                       reps=2)
        vqd = VQD(Estimator(), ComputeUncompute(Sampler()), ansatz,
                  L_BFGS_B(), k=2, betas=[2, 2],
                  initial_point=np.zeros(ansatz.num_parameters))
        res = vqd.compute_eigenvalues(H)
        np.testing.assert_allclose(res.eigenvalues[0], GROUND, atol=1e-5)
        # second state: lowest state orthogonal to ground reachable from HF
        assert res.eigenvalues[1] > res.eigenvalues[0] + 0.1

    def test_auto_betas(self, H):
        ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
        vqd = VQD(Estimator(), ComputeUncompute(Sampler()), ansatz,
                  L_BFGS_B(), k=2, betas=None,
                  initial_point=np.zeros(ansatz.num_parameters))
        res = vqd.compute_eigenvalues(H)
        np.testing.assert_allclose(res.eigenvalues[0], GROUND, atol=1e-5)


class TestAdaptVQE:
    def test_ground_state(self, H):
        pool_ansatz = UCCSD(2, (1, 1),
                            initial_state=HartreeFock(2, (1, 1)))
        solver = VQE(Estimator(), pool_ansatz, L_BFGS_B())
        adapt = AdaptVQE(solver)
        res = adapt.compute_minimum_eigenvalue(H)
        np.testing.assert_allclose(res.eigenvalue, GROUND, atol=1e-5)
        assert res.num_iterations >= 1
        assert res.termination_criterion is not None

    def test_requires_ucc_ansatz(self, H):
        from esoo_tpu.sim import RealAmplitudes
        solver = VQE(Estimator(), RealAmplitudes(4), L_BFGS_B())
        with pytest.raises(AlgorithmError):
            AdaptVQE(solver).compute_minimum_eigenvalue(H)


class TestJaxBFGS:
    def test_vqe_one_dispatch(self, H, uccsd_ansatz):
        from esoo_tpu.solvers import JaxBFGS
        vqe = VQE(Estimator(), uccsd_ansatz, JaxBFGS(),
                  initial_point=np.zeros(uccsd_ansatz.num_parameters))
        res = vqe.compute_minimum_eigenvalue(H)
        np.testing.assert_allclose(res.eigenvalue, GROUND, atol=1e-6)
        assert res.cost_function_evals > 0

    def test_optorb_with_jax_bfgs(self, h2_sto3g):
        """Full OptOrb loop driven by the on-device optimizer."""
        from esoo_tpu.chem import MoleculeDriver
        from esoo_tpu.solvers import JaxBFGS
        from esoo_tpu.orbital_optimization import (
            OptOrbVQE, PartialUnitaryProjectionOptimizer)
        p = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="6-31g").run()
        ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
        vqe = VQE(Estimator(), ansatz, JaxBFGS(),
                  initial_point=np.zeros(ansatz.num_parameters))
        r = OptOrbVQE(num_spin_orbitals=4, ground_state_solver=vqe,
                      partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
                          1e-3, 1e-5, 10000),
                      problem=p, maxiter=20).compute_minimum_energy()
        np.testing.assert_array_almost_equal(r.eigenvalue,
                                             -1.8661038079694765, decimal=3)

    def test_static_and_growing_agree(self, H):
        pool_ansatz = UCCSD(2, (1, 1),
                            initial_state=HartreeFock(2, (1, 1)))
        static = AdaptVQE(VQE(Estimator(), pool_ansatz, L_BFGS_B()),
                          static_shapes=True).compute_minimum_eigenvalue(H)
        growing = AdaptVQE(VQE(Estimator(), pool_ansatz, L_BFGS_B()),
                           static_shapes=False).compute_minimum_eigenvalue(H)
        np.testing.assert_allclose(static.eigenvalue, growing.eigenvalue,
                                   atol=1e-7)
