"""qiskit-nature drop-in interop (round-2 verdict item 6).

qiskit is not installed in this environment, so the adapter is exercised
through structurally-faithful fakes of the qiskit-nature attribute
surface (problem.hamiltonian.electronic_integrals.second_q_coeffs() and
QubitMapper classes); tests that need the real packages skip when absent.
"""

import numpy as np
import pytest

from esoo_tpu.interop import (adapt, from_qiskit_nature,
                              is_qiskit_nature_problem, wrap_qiskit_mapper)

HAVE_QISKIT = False
try:  # pragma: no cover - not installed here
    import qiskit_nature  # noqa: F401
    HAVE_QISKIT = True
except ImportError:
    pass


def _fake_qn_problem(h_so, g_phys_signed, num_particles, e_nn=0.0):
    """Duck-typed qiskit-nature ElectronicStructureProblem: second_q_coeffs
    returns {"+-": h, "++--": c} with g = -1 * to_physicist(c) the
    reference's ingestion identity (base_opt_orb_solver.py:89-90).  We
    store c in CHEMIST index order so the adapter's transpose runs."""

    class Integrals:
        def second_q_coeffs(self):
            # chemist (pr|qs) such that phys transpose recovers the target
            chem = (-1.0 * g_phys_signed).transpose(0, 2, 1, 3)
            return {"+-": h_so, "++--": chem}

    class Hamiltonian:
        electronic_integrals = Integrals()
        nuclear_repulsion_energy = e_nn

    class Problem:
        hamiltonian = Hamiltonian()

    Problem.num_particles = num_particles
    return Problem()


@pytest.fixture(scope="module")
def native_h2(h2_631g):
    return h2_631g


def test_detection_and_tensor_identity(h2_631g):
    h, g = h2_631g.integral_tensors()
    fake = _fake_qn_problem(h, g, h2_631g.num_particles,
                            h2_631g.nuclear_repulsion_energy)
    assert is_qiskit_nature_problem(fake)
    assert not is_qiskit_nature_problem(h2_631g)
    adapted = from_qiskit_nature(fake)
    h2, g2 = adapted.integral_tensors()
    np.testing.assert_allclose(h2, h, atol=1e-14)
    np.testing.assert_allclose(g2, g, atol=1e-14)
    assert adapted.num_particles == h2_631g.num_particles
    assert adapted.num_spin_orbitals == h2_631g.num_spin_orbitals


def test_optorbvqe_runs_on_qiskit_nature_problem(h2_631g):
    """The reference example shape: hand the (fake) qiskit-nature problem
    straight to OptOrbVQE — ingestion converts transparently and the run
    reproduces the reference energy (tests/test_optorbvqe.py:67)."""
    from esoo_tpu.orbital_optimization import (
        OptOrbVQE, PartialUnitaryProjectionOptimizer)
    from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
    from esoo_tpu.solvers import VQE, L_BFGS_B

    h, g = h2_631g.integral_tensors()
    fake = _fake_qn_problem(h, g, h2_631g.num_particles)
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    vqe = VQE(Estimator(), ansatz, L_BFGS_B(),
              initial_point=np.zeros(ansatz.num_parameters))
    solver = OptOrbVQE(
        num_spin_orbitals=4, ground_state_solver=vqe,
        partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
            1e-3, 1e-5, 10000),
        problem=fake, maxiter=20)
    r = solver.compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue,
                                         -1.8661038079694765, decimal=3)


def test_fused_runs_on_qiskit_nature_problem(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE
    from esoo_tpu.sim import HartreeFock, UCCSD

    h, g = h2_631g.integral_tensors()
    fake = _fake_qn_problem(h, g, h2_631g.num_particles)
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    r = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                       problem=fake, maxiter=20).compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue,
                                         -1.8661038079694765, decimal=3)


def test_wrap_qiskit_mapper_by_provenance():
    """Mapper wrapping keys on class name + qiskit_nature module
    provenance; fakes with the right provenance convert, natives pass
    through untouched."""
    jw_fake = type("JordanWignerMapper", (), {})
    jw_fake.__module__ = "qiskit_nature.second_q.mappers"
    pm_fake = type("ParityMapper", (), {"num_particles": None})
    pm_fake.__module__ = "qiskit_nature.second_q.mappers"
    bk_fake = type("BravyiKitaevMapper", (), {})
    bk_fake.__module__ = "qiskit_nature.second_q.mappers"
    unknown = type("SomeMapper", (), {})
    unknown.__module__ = "qiskit_nature.second_q.mappers"

    from esoo_tpu.ops import (BravyiKitaevMapper, JordanWignerMapper,
                              ParityMapper)
    assert isinstance(wrap_qiskit_mapper(jw_fake()), JordanWignerMapper)
    assert isinstance(wrap_qiskit_mapper(pm_fake()), ParityMapper)
    assert isinstance(wrap_qiskit_mapper(bk_fake()), BravyiKitaevMapper)
    with pytest.raises(ValueError, match="no native equivalent"):
        wrap_qiskit_mapper(unknown())

    native = JordanWignerMapper()
    p, m = adapt(None, native)
    assert m is native


def test_adapt_in_solver_ctor_with_fake_mapper(h2_631g):
    """A provenance-faked qiskit JW mapper passed to the solver ctor is
    transparently replaced by the native JW mapper."""
    from esoo_tpu.orbital_optimization import OptOrbVQE
    from esoo_tpu.ops import JordanWignerMapper
    from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
    from esoo_tpu.solvers import VQE, L_BFGS_B

    jw_fake = type("JordanWignerMapper", (), {})
    jw_fake.__module__ = "qiskit_nature.second_q.mappers"
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    vqe = VQE(Estimator(), ansatz, L_BFGS_B(),
              initial_point=np.zeros(ansatz.num_parameters))
    solver = OptOrbVQE(num_spin_orbitals=4, ground_state_solver=vqe,
                       mapper=jw_fake(), problem=h2_631g, maxiter=2)
    assert isinstance(solver.mapper, JordanWignerMapper)


@pytest.mark.skipif(not HAVE_QISKIT, reason="qiskit-nature not installed")
def test_real_qiskit_nature_problem():  # pragma: no cover
    from qiskit_nature.second_q.drivers import PySCFDriver
    driver = PySCFDriver(atom="H 0 0 0; H 0 0 0.735", basis="6-31g")
    problem = driver.run()
    adapted = from_qiskit_nature(problem)
    assert adapted.num_spin_orbitals == 8


def test_fused_mcvqe_runs_on_qiskit_nature_problem(h2_631g):
    """Regression (round-3 review): FusedOptOrbMCVQE reads the problem in
    its OWN ctor (CIS initialization) before super().__init__'s adapter
    seam, so it must apply the interop adapter itself."""
    from esoo_tpu.orbital_optimization import FusedOptOrbMCVQE
    from esoo_tpu.sim import UCCSD

    h, g = h2_631g.integral_tensors()
    fake = _fake_qn_problem(h, g, h2_631g.num_particles)
    ansatz = UCCSD(2, (1, 1), reps=2)
    r = FusedOptOrbMCVQE(num_spin_orbitals=4, ansatz=ansatz,
                         num_particles=(1, 1), k=2, excitations="s",
                         weight_vector=[2, 1], problem=fake,
                         maxiter=20).compute_energies()
    np.testing.assert_array_almost_equal(
        r.eigenvalues, [-1.85703467, -1.46615986], decimal=3)
