"""Tests: fully-fused one-dispatch OptOrbVQE vs the class-based path."""

import numpy as np
import pytest

from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.orbital_optimization import FusedOptOrbVQE


def test_fused_matches_reference_energy(h2_631g):
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    sol = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                         problem=h2_631g, maxiter=20,
                         stopping_tolerance=1e-5)
    r = sol.compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue, -1.8661038079694765,
                                         decimal=3)
    assert r.outer_iterations >= 2
    assert len(r.energy_convergence_list) == r.outer_iterations
    U = r.optimal_partial_unitary
    np.testing.assert_allclose(U.T @ U, np.eye(2), atol=1e-8)


def test_fused_matches_class_path(h2_631g):
    """Fused and class-based solvers converge to the same optimum."""
    from esoo_tpu.sim import Estimator
    from esoo_tpu.solvers import VQE, L_BFGS_B
    from esoo_tpu.orbital_optimization import (
        OptOrbVQE, PartialUnitaryProjectionOptimizer)
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    fused = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                           problem=h2_631g, maxiter=30,
                           stopping_tolerance=1e-8).compute_minimum_energy()
    vqe = VQE(Estimator(), ansatz, L_BFGS_B(),
              initial_point=np.zeros(ansatz.num_parameters))
    classic = OptOrbVQE(
        num_spin_orbitals=4, ground_state_solver=vqe,
        partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
            1e-3, 1e-8, 10000),
        problem=h2_631g, maxiter=30,
        stopping_tolerance=1e-8).compute_minimum_energy()
    np.testing.assert_allclose(fused.eigenvalue, classic.eigenvalue,
                               atol=1e-6)


def test_fused_rejects_nonblock_integrals(h2_631g):
    h, g = h2_631g.integral_tensors()
    g = g.copy()
    g[0, 4, 0, 0] += 0.1   # break the spin-block structure
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    with pytest.raises(ValueError):
        FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                       integral_tensors=(h, g))


def test_fused_ssvqe_matches_reference(h2_631g):
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbSSVQE
    ansatz = UCCSD(2, (1, 1), reps=2)
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)
    r = FusedOptOrbSSVQE(num_spin_orbitals=4, ansatz=ansatz,
                         initial_states=[init0, init1],
                         weight_vector=[2, 1], problem=h2_631g,
                         maxiter=20).compute_energies()
    np.testing.assert_array_almost_equal(
        r.eigenvalues, [-1.85403538, -1.37044354], decimal=3)
    assert r.outer_iterations >= 2


def test_fused_mcvqe_matches_reference(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbMCVQE
    ansatz = UCCSD(2, (1, 1), reps=2)
    r = FusedOptOrbMCVQE(num_spin_orbitals=4, ansatz=ansatz,
                         num_particles=(1, 1), k=2, excitations="s",
                         weight_vector=[2, 1], problem=h2_631g,
                         maxiter=20).compute_energies()
    np.testing.assert_array_almost_equal(
        r.eigenvalues, [-1.85703467, -1.46615986], decimal=3)


def test_fused_vqd_matches_reference(h2_631g):
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    ansatz = UCCSD(2, (1, 1), reps=2)
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)
    r = FusedOptOrbVQD(num_spin_orbitals=4, ansatz=ansatz,
                       initial_states=[init0, init1], betas=[2.0],
                       weight_vector=[2, 1], problem=h2_631g,
                       maxiter=20).compute_energies()
    np.testing.assert_array_almost_equal(
        r.eigenvalues, [-1.8540352, -1.37044389], decimal=3)


def test_fused_vqd_deflation_actually_deflates(h2_sto3g):
    """Regression: with identical initial states the beta penalty is the
    ONLY thing keeping state 1 off the ground state (a beta-index
    misalignment once zeroed the penalty for state 1 silently)."""
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    ansatz = UCCSD(2, (1, 1), reps=2)
    r = FusedOptOrbVQD(num_spin_orbitals=4, ansatz=ansatz,
                       initial_states=[HartreeFock(2, (1, 1)),
                                       HartreeFock(2, (1, 1))],
                       betas=[3.0], problem=h2_sto3g, maxiter=1,
                       vqe_maxiter=400).compute_energies()
    np.testing.assert_allclose(r.eigenvalues[0], -1.85727503, atol=1e-5)
    assert r.eigenvalues[1] > r.eigenvalues[0] + 0.05


@pytest.mark.slow   # ~24 s; duplicate coverage of
# test_parallel.py::test_optorbvqe_with_mesh at a bigger shape
def test_fused_vqe_mesh_matches_single_device(h2_631g):
    """GSPMD-sharded g through the entire fused program == single-device."""
    import jax
    from esoo_tpu.parallel import make_orbital_mesh
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    ref = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                         problem=h2_631g, maxiter=20).compute_minimum_energy()
    mesh = make_orbital_mesh(4)
    sharded = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                             problem=h2_631g, maxiter=20,
                             mesh=mesh).compute_minimum_energy()
    np.testing.assert_allclose(sharded.eigenvalue, ref.eigenvalue, atol=1e-9)


def test_fused_mesh_divisibility_error(h2_631g):
    from esoo_tpu.parallel import make_orbital_mesh
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    with pytest.raises(ValueError):
        # m=4 spatial not divisible by 3 devices
        FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                       mesh=make_orbital_mesh(3))


def test_fused_adapt_vqe_matches_reference(h2_631g):
    """FusedOptOrbAdaptVQE reproduces the reference OptOrbAdaptVQE energy
    (-1.866104213792463 at decimal 3, tests/test_optorbadaptvqe.py:64) and
    agrees with the class-based AdaptVQE OptOrb path."""
    from esoo_tpu.orbital_optimization import FusedOptOrbAdaptVQE

    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    r = FusedOptOrbAdaptVQE(num_spin_orbitals=4, ansatz=ansatz,
                            problem=h2_631g,
                            maxiter=20).compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue, -1.866104213792463,
                                         decimal=3)
    # H2 singlet ground state needs exactly the double excitation
    assert int(r.selection_mask.sum()) >= 1
    U = r.optimal_partial_unitary
    np.testing.assert_allclose(U.T @ U, np.eye(2), atol=1e-6)


def test_fused_outer_loop_callback(h2_631g):
    """outer_loop_callback fires live per outer iteration from inside the
    compiled program (jax.debug.callback) with (iteration, energy) that
    replays the returned convergence trace."""
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE

    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    hist = []
    r = FusedOptOrbVQE(
        num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g, maxiter=20,
        outer_loop_callback=lambda it, e: hist.append((int(it), float(e))),
    ).compute_minimum_energy()
    assert [it for it, _ in hist] == list(range(1, r.outer_iterations + 1))
    np.testing.assert_allclose([e for _, e in hist],
                               r.energy_convergence_list, atol=1e-7)


def test_fused_checkpoint_resume(h2_631g, tmp_path):
    """checkpoint_dir= writes one resumable .npz per outer iteration from
    inside the compiled program; resume_from= warm-starts (U, theta) so
    the continuation converges at least as low in no more iterations."""
    import glob
    import os
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE

    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    d = str(tmp_path)
    r = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                       maxiter=20, checkpoint_dir=d).compute_minimum_energy()
    cks = sorted(glob.glob(os.path.join(d, "fused_iter_*.npz")))
    assert len(cks) == r.outer_iterations
    r2 = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                        maxiter=20,
                        resume_from=cks[-1]).compute_minimum_energy()
    assert r2.eigenvalue <= r.eigenvalue + 1e-6
    assert r2.outer_iterations <= r.outer_iterations


def test_fused_checkpoint_full_energy_history(h2_631g, tmp_path):
    """Per-iteration checkpoints carry the FULL running energy history
    (checkpoint.py contract), not just the current iteration's energy."""
    import glob
    import os
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE
    from esoo_tpu.orbital_optimization.checkpoint import load_checkpoint

    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    d = str(tmp_path)
    r = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                       maxiter=20, checkpoint_dir=d).compute_minimum_energy()
    cks = sorted(glob.glob(os.path.join(d, "fused_iter_*.npz")))
    last = load_checkpoint(cks[-1])
    hist = np.asarray(last["energy_convergence_list"]).reshape(-1)
    assert len(hist) == int(last["iteration"])
    np.testing.assert_allclose(hist[: len(r.energy_convergence_list)],
                               r.energy_convergence_list, atol=1e-7)


def test_fused_rejects_non_jw_ansatz(h2_631g):
    """A parity/BK-mapped UCC ansatz must be rejected (the fused direct-RDM
    contraction reads occupation-basis amplitudes; advisor round-2 high)."""
    from esoo_tpu.ops import ParityMapper
    from esoo_tpu.orbital_optimization import FusedOptOrbSSVQE

    mapper = ParityMapper()
    ansatz = UCCSD(2, (1, 1), qubit_mapper=mapper,
                   initial_state=HartreeFock(2, (1, 1), qubit_mapper=mapper))
    with pytest.raises(ValueError, match="Jordan-Wigner"):
        FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g)
    with pytest.raises(ValueError, match="Jordan-Wigner"):
        FusedOptOrbSSVQE(num_spin_orbitals=4, ansatz=ansatz,
                         initial_states=[HartreeFock(2, (1, 1))],
                         weight_vector=[1.0], problem=h2_631g)


def test_fused_callback_resolution_is_memoized(h2_631g):
    """`callback` is a jit static argname: repeat runs of one solver must
    reuse the identical resolved callback (else every run re-traces the
    whole one-dispatch program; advisor round-2 low)."""
    from esoo_tpu.orbital_optimization.fused import _cached_callbacks

    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    sol = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                         outer_loop_callback=lambda it, e: None)
    first = _cached_callbacks(sol)
    second = _cached_callbacks(sol)
    assert first[0] is second[0] and first[1] is second[1]


@pytest.mark.parametrize("simulation", ["full", "sector"])
def test_fused_two_dispatch_matches_one_dispatch(h2_631g, simulation):
    """dispatch='two' (eigensolver program + orbital program per outer
    iteration, host convergence check) reproduces the one-dispatch
    result — the N=16 worker-fault workaround must not change semantics."""
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    one = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                         problem=h2_631g, maxiter=20,
                         simulation=simulation).compute_minimum_energy()
    two = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                         problem=h2_631g, maxiter=20, simulation=simulation,
                         dispatch="two").compute_minimum_energy()
    np.testing.assert_allclose(two.eigenvalue, one.eigenvalue, atol=1e-9)
    assert two.outer_iterations == one.outer_iterations
    np.testing.assert_allclose(two.energy_convergence_list,
                               one.energy_convergence_list, atol=1e-9)
    np.testing.assert_allclose(two.optimal_partial_unitary,
                               one.optimal_partial_unitary, atol=1e-7)


@pytest.mark.parametrize("simulation", ["full", "sector"])
def test_fused_vqe_chunked_matches_two_dispatch(h2_631g, simulation):
    """vqe_chunk=j (host loop of bounded L-BFGS dispatches inside the
    two-dispatch eigensolver stage — the defense against the shared
    worker's long-running-dispatch kill at N=16) must reproduce the
    unchunked two-dispatch run: the resumable L-BFGS is iterate-identical
    by construction, so energies/U/trace must agree."""
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    two = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                         problem=h2_631g, maxiter=20, simulation=simulation,
                         dispatch="two").compute_minimum_energy()
    ch = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                        problem=h2_631g, maxiter=20, simulation=simulation,
                        dispatch="two", vqe_chunk=7).compute_minimum_energy()
    np.testing.assert_allclose(ch.eigenvalue, two.eigenvalue, atol=1e-9)
    assert ch.outer_iterations == two.outer_iterations
    np.testing.assert_allclose(ch.energy_convergence_list,
                               two.energy_convergence_list, atol=1e-9)
    np.testing.assert_allclose(ch.optimal_partial_unitary,
                               two.optimal_partial_unitary, atol=1e-7)


def test_vqe_chunk_requires_two_dispatch(h2_631g):
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    with pytest.raises(ValueError, match="dispatch='two'"):
        FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                       vqe_chunk=5)


def test_fused_two_dispatch_live_checkpoints(h2_631g, tmp_path):
    """Two-dispatch mode writes per-iteration checkpoints from the host
    loop (works even on backends without jax.debug.callback)."""
    import glob
    import os
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    d = str(tmp_path)
    seen = []
    r = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                       maxiter=20, dispatch="two", checkpoint_dir=d,
                       outer_loop_callback=lambda it, e: seen.append(it),
                       ).compute_minimum_energy()
    cks = sorted(glob.glob(os.path.join(d, "fused_iter_*.npz")))
    assert len(cks) == r.outer_iterations
    assert seen == list(range(1, r.outer_iterations + 1))


def test_fused_vqd_per_state_ansatz(h2_631g):
    """FusedOptOrbVQD accepts a LIST of per-state ansatze (the reference
    VQD's signature feature, vqd.py:17-18,203-206).  Identical copies must
    reproduce the shared-ansatz result; heterogeneous circuits (different
    reps) must still reach the reference eigenvalues."""
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD

    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)

    shared = FusedOptOrbVQD(
        num_spin_orbitals=4, ansatz=UCCSD(2, (1, 1), reps=2),
        initial_states=[init0, init1], betas=[2.0],
        weight_vector=[2, 1], problem=h2_631g,
        maxiter=20).compute_energies()
    same = FusedOptOrbVQD(
        num_spin_orbitals=4,
        ansatz=[UCCSD(2, (1, 1), reps=2), UCCSD(2, (1, 1), reps=2)],
        initial_states=[init0, init1], betas=[2.0],
        weight_vector=[2, 1], problem=h2_631g,
        maxiter=20).compute_energies()
    np.testing.assert_allclose(same.eigenvalues, shared.eigenvalues,
                               atol=1e-8)

    hetero = FusedOptOrbVQD(
        num_spin_orbitals=4,
        ansatz=[UCCSD(2, (1, 1), reps=1), UCCSD(2, (1, 1), reps=2)],
        initial_states=[init0, init1], betas=[2.0],
        weight_vector=[2, 1], problem=h2_631g,
        maxiter=20).compute_energies()
    np.testing.assert_array_almost_equal(
        hetero.eigenvalues, [-1.8540352, -1.37044389], decimal=3)
    # padded parameter rows: state 0 has reps=1 params in its lead slice
    p1 = UCCSD(2, (1, 1), reps=1).num_parameters
    p2 = UCCSD(2, (1, 1), reps=2).num_parameters
    assert hetero.optimal_point.shape == (2, p2)
    np.testing.assert_allclose(hetero.optimal_point[0, p1:], 0.0,
                               atol=1e-12)


def test_fused_vqd_per_state_ansatz_validation(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    init0 = HartreeFock(2, (1, 1))
    with pytest.raises(ValueError, match="one ansatz per state"):
        FusedOptOrbVQD(num_spin_orbitals=4,
                       ansatz=[UCCSD(2, (1, 1))],
                       initial_states=[init0, init0], betas=[2.0],
                       problem=h2_631g)
    with pytest.raises(ValueError, match="simulation='full'"):
        FusedOptOrbVQD(num_spin_orbitals=4,
                       ansatz=[UCCSD(2, (1, 1)), UCCSD(2, (1, 1))],
                       initial_states=[init0, init0], betas=[2.0],
                       problem=h2_631g, simulation="sector")


def test_fused_adapt_two_dispatch_matches_one_dispatch(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbAdaptVQE
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    one = FusedOptOrbAdaptVQE(num_spin_orbitals=4, ansatz=ansatz,
                              problem=h2_631g,
                              maxiter=20).compute_minimum_energy()
    two = FusedOptOrbAdaptVQE(num_spin_orbitals=4, ansatz=ansatz,
                              problem=h2_631g, maxiter=20,
                              dispatch="two").compute_minimum_energy()
    np.testing.assert_allclose(two.eigenvalue, one.eigenvalue, atol=1e-9)
    assert two.outer_iterations == one.outer_iterations
    np.testing.assert_allclose(two.energy_convergence_list,
                               one.energy_convergence_list, atol=1e-9)
    np.testing.assert_allclose(two.selection_mask, one.selection_mask)


@pytest.mark.parametrize("simulation", ["full", "sector"])
def test_fused_ssvqe_two_dispatch_matches_one(h2_631g, simulation):
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbSSVQE
    ansatz = UCCSD(2, (1, 1), reps=2)
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)

    def run(dispatch):
        return FusedOptOrbSSVQE(num_spin_orbitals=4, ansatz=ansatz,
                                initial_states=[init0, init1],
                                weight_vector=[2, 1], problem=h2_631g,
                                maxiter=20, simulation=simulation,
                                dispatch=dispatch).compute_energies()

    one, two = run("one"), run("two")
    np.testing.assert_allclose(two.eigenvalues, one.eigenvalues, atol=1e-9)
    assert two.outer_iterations == one.outer_iterations
    np.testing.assert_allclose(two.energy_convergence_list,
                               one.energy_convergence_list, atol=1e-9)


def test_fused_mcvqe_two_dispatch_matches_one(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbMCVQE
    ansatz = UCCSD(2, (1, 1), reps=2)

    def run(dispatch):
        return FusedOptOrbMCVQE(num_spin_orbitals=4, ansatz=ansatz,
                                num_particles=(1, 1), k=2, excitations="s",
                                weight_vector=[2, 1], problem=h2_631g,
                                maxiter=20,
                                dispatch=dispatch).compute_energies()

    one, two = run("one"), run("two")
    np.testing.assert_allclose(two.eigenvalues, one.eigenvalues, atol=1e-8)


def test_fused_vqd_two_dispatch_matches_one(h2_631g):
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    ansatz = UCCSD(2, (1, 1), reps=2)
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)

    def run(dispatch):
        return FusedOptOrbVQD(num_spin_orbitals=4, ansatz=ansatz,
                              initial_states=[init0, init1], betas=[2.0],
                              weight_vector=[2, 1], problem=h2_631g,
                              maxiter=20,
                              dispatch=dispatch).compute_energies()

    one, two = run("one"), run("two")
    np.testing.assert_allclose(two.eigenvalues, one.eigenvalues, atol=1e-9)
    assert two.outer_iterations == one.outer_iterations


def test_fused_simulation_auto(h2_631g):
    """simulation='auto' picks the sector on CPU for UCC-family circuits
    (measured crossover, docs/PERF.md) and falls back to the full
    simulator for circuits the sector cannot compile; explicit 'sector'
    still raises for those."""
    from esoo_tpu.sim import QuantumCircuit

    ucc = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    s = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ucc, problem=h2_631g,
                       simulation="auto")
    assert s.simulation == "sector"           # CPU backend in tests
    r = s.compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue,
                                         -1.8661038079694765, decimal=3)

    # non-UCC real ansatz: auto falls back to full
    qc = QuantumCircuit(4)
    qc.x(0)
    qc.x(2)
    qc.ry(qc.parameter(), 1)
    qc.cx(1, 3)
    s2 = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=qc, problem=h2_631g,
                        simulation="auto")
    assert s2.simulation == "full"
    with pytest.raises(ValueError):
        FusedOptOrbVQE(num_spin_orbitals=4, ansatz=qc, problem=h2_631g,
                       simulation="sector")


def test_fused_two_dispatch_parity_at_vqe_hit_max(h2_631g):
    """Regression (round-3 review): the one-dispatch program re-runs the
    eigensolver at the final U UNCONDITIONALLY — also on the converged
    exit, where the warm restart keeps optimizing whenever the inner
    L-BFGS previously stopped on hit_max rather than gtol.  With a tiny
    vqe_maxiter that tail re-solve changes the answer, so dispatch='two'
    must perform it too."""
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    kw = dict(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
              maxiter=8, vqe_maxiter=5)
    one = FusedOptOrbVQE(**kw).compute_minimum_energy()
    two = FusedOptOrbVQE(dispatch="two", **kw).compute_minimum_energy()
    np.testing.assert_allclose(two.eigenvalue, one.eigenvalue, atol=1e-9)
    assert two.outer_iterations == one.outer_iterations
    np.testing.assert_allclose(two.energy_convergence_list,
                               one.energy_convergence_list, atol=1e-9)
    np.testing.assert_allclose(two.optimal_point, one.optimal_point,
                               atol=1e-8)


@pytest.mark.slow   # ~24 s; hit-max edge parity — the two-dispatch VQD
# contract is pinned fast by test_fused_vqd_two_dispatch_matches_one
def test_fused_vqd_two_dispatch_parity_at_vqe_hit_max(h2_631g):
    """Same unconditional-tail parity for the VQD deflation programs."""
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    ansatz = UCCSD(2, (1, 1), reps=2)
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)
    kw = dict(num_spin_orbitals=4, ansatz=ansatz,
              initial_states=[init0, init1], betas=[2.0],
              weight_vector=[2, 1], problem=h2_631g,
              maxiter=6, vqe_maxiter=7)
    one = FusedOptOrbVQD(**kw).compute_energies()
    two = FusedOptOrbVQD(dispatch="two", **kw).compute_energies()
    np.testing.assert_allclose(two.eigenvalues, one.eigenvalues, atol=1e-9)
    assert two.outer_iterations == one.outer_iterations
    np.testing.assert_allclose(two.energy_convergence_list,
                               one.energy_convergence_list, atol=1e-9)


def test_fused_maxiter_zero_rejected(h2_631g):
    """maxiter=0 used to IndexError deep inside the trace bookkeeping of
    BOTH dispatch modes (size-0 trace axis); it is now rejected up front
    with a clear message."""
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    for kw in ({}, {"dispatch": "two"}):
        with pytest.raises(ValueError, match="maxiter"):
            FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                           problem=h2_631g, maxiter=0, **kw)


def test_fused_vqd_per_state_ansatz_auto_forces_full(h2_631g):
    """Regression (round-3 review): simulation='auto' could resolve to
    'sector', which compiles ONE excitation table and would silently
    simulate every state with ansatz_list[0]'s circuit."""
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)
    s = FusedOptOrbVQD(num_spin_orbitals=4,
                       ansatz=[UCCSD(2, (1, 1)), UCCSD(2, (1, 1), reps=2)],
                       initial_states=[init0, init1], betas=[2.0],
                       problem=h2_631g, simulation="auto")
    assert s.simulation == "full"


def test_fused_vqd_per_state_ansatz_default_forces_full(h2_631g):
    """The OMITTED simulation kwarg (defaults to 'auto' since the
    string kernels made the sector the universal winner) must force
    'full' for per-state ansatze exactly like an explicit 'auto'."""
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)
    s = FusedOptOrbVQD(num_spin_orbitals=4,
                       ansatz=[UCCSD(2, (1, 1)), UCCSD(2, (1, 1), reps=2)],
                       initial_states=[init0, init1], betas=[2.0],
                       problem=h2_631g)
    assert s.simulation == "full"


def test_fused_default_simulation_is_sector_for_ucc(h2_631g):
    """The fused-family default resolves to the sector for UCC circuits
    (the measured universal winner) and falls back to 'full' otherwise."""
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE
    s = FusedOptOrbVQE(num_spin_orbitals=4,
                       ansatz=UCCSD(2, (1, 1),
                                    initial_state=HartreeFock(2, (1, 1))),
                       problem=h2_631g)
    assert s.simulation == "sector"
    qc = QuantumCircuit(4)
    qc.x(0)
    qc.x(2)
    qc.ry(0.0, 0)
    s2 = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=qc, problem=h2_631g)
    assert s2.simulation == "full"


def test_fused_vqd_initial_point_count_mismatch(h2_631g):
    from esoo_tpu.sim import QuantumCircuit
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    init0 = HartreeFock(2, (1, 1))
    init1 = QuantumCircuit(4)
    init1.x(1)
    init1.x(2)
    a = UCCSD(2, (1, 1))
    with pytest.raises(ValueError, match="one vector per state"):
        FusedOptOrbVQD(num_spin_orbitals=4, ansatz=[a, a],
                       initial_states=[init0, init1], betas=[2.0],
                       problem=h2_631g,
                       initial_point=[np.zeros(a.num_parameters)])


def test_fused_vqe_ftol_kwarg_plumbs_through(h2_631g):
    """`vqe_ftol` reaches the inner L-BFGS (advisor round-4 ask): an
    absurdly loose ftol makes EVERY iteration count toward the plateau
    stop, so the eigensolver halts at the plateau patience; ftol=0.0
    restores pure gtol/maxiter semantics and runs strictly longer.
    Pinned at the chunked-program level where the iteration count is
    observable, plus an e2e smoke that vqe_ftol=0.0 still lands on the
    reference optimum."""
    from esoo_tpu.orbital_optimization.fused import (_eig_chunk_advance,
                                                     _eig_chunk_init, orth)
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    sol = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                         problem=h2_631g, maxiter=20, vqe_ftol=0.0)
    assert sol.vqe_ftol == 0.0
    state_fn = sol._compiled.state_fn
    U = orth(sol._U0)
    st0, cost_args = _eig_chunk_init(state_fn, sol._theta0, U,
                                     sol._h_sp, sol._g_sp,
                                     sector=sol._sector)
    loose = _eig_chunk_advance(state_fn, st0, cost_args, num_steps=50,
                               vqe_maxiter=50, sector=sol._sector,
                               vqe_ftol=1.0)
    exact = _eig_chunk_advance(state_fn, st0, cost_args, num_steps=50,
                               vqe_maxiter=50, sector=sol._sector,
                               vqe_ftol=0.0)
    assert int(loose.it) <= 3          # plateau patience fires immediately
    # the plateau counter is the direct plumbing observable: with
    # ftol=1.0 every iteration counts (stopped BY the plateau rule, so
    # the counter sits at the patience); with ftol=0.0 accepted
    # decreasing steps reset it to zero (stopped by gtol/no-move)
    assert int(loose.plateau) == 3
    assert int(exact.plateau) == 0
    r = sol.compute_minimum_energy()
    np.testing.assert_allclose(r.eigenvalue, -1.8661038079694765,
                               atol=1e-3)
