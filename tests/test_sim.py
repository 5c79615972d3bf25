"""Unit tests: JAX statevector simulator, primitives, direct RDM path."""

import numpy as np
import pytest

from esoo_tpu.ops import ActiveSpaceHamiltonianBuilder, SparsePauliOp
from esoo_tpu.sim import (ComputeUncompute, Estimator, QuantumCircuit,
                          Sampler, compile_circuit, one_rdm, statevector,
                          two_rdm)
from esoo_tpu.sim.rdm import annihilate


def test_bell_state():
    qc = QuantumCircuit(2)
    qc.h(0)
    qc.cx(0, 1)
    sv = np.asarray(statevector(qc))
    want = np.zeros(4)
    want[0b00] = want[0b11] = 1 / np.sqrt(2)
    np.testing.assert_allclose(sv, want, atol=1e-12)


def test_parameterized_ry():
    qc = QuantumCircuit(1)
    th = qc.parameter()
    qc.ry(th, 0)
    sv = np.asarray(compile_circuit(qc).state(np.array([0.7])))
    np.testing.assert_allclose(sv, [np.cos(0.35), np.sin(0.35)], atol=1e-12)


def test_real_and_complex_paths_agree():
    from esoo_tpu.sim.statevector import CompiledCircuit
    qc = QuantumCircuit(3)
    t0, t1 = qc.parameter(), qc.parameter()
    qc.x(0)
    qc.ry(t0, 1)
    qc.cx(1, 2)
    qc.cry(t1, 0, 2)
    qc.h(1)
    params = np.array([0.4, -1.1])
    real = CompiledCircuit(qc)                      # auto: real path
    cplx = CompiledCircuit(qc, force_complex=True)
    assert real.is_real and not cplx.is_real
    np.testing.assert_allclose(np.asarray(real.state(params)),
                               np.real(np.asarray(cplx.state(params))),
                               atol=1e-12)


def test_pauli_rotation_vs_matrix():
    # exp(-i a/2 XY) on 2 qubits vs dense matrix exponential
    from scipy.linalg import expm
    a = 0.813
    qc = QuantumCircuit(2)
    th = qc.parameter()
    qc.h(0)  # make a non-trivial start state... applied before rotation
    qc.pauli_rot(th, 0b11, 0b01)  # X on qubit1, Y on qubit0
    sv = np.asarray(compile_circuit(qc).state(np.array([a])))
    P = SparsePauliOp("XY").to_matrix()
    start = np.zeros(4, dtype=complex)
    start[0] = start[1] = 1 / np.sqrt(2)
    want = expm(-0.5j * a * P) @ start
    np.testing.assert_allclose(sv, want, atol=1e-10)


def test_expectation_vs_dense(h2_sto3g_hamiltonian):
    qc = QuantumCircuit(4)
    t = qc.parameter()
    qc.x(0)
    qc.x(2)
    qc.ry(t, 1)
    qc.cx(1, 3)
    params = np.array([0.3])
    est = Estimator()
    val = est.run([qc], [h2_sto3g_hamiltonian], [params]).result().values[0]
    # strip the fermionic fast-path tag to exercise the per-Pauli path too
    import copy
    op2 = copy.copy(h2_sto3g_hamiltonian)
    op2.fermionic = None
    val2 = est.run([qc], [op2], [params]).result().values[0]
    sv = np.asarray(compile_circuit(qc).state(params)).astype(complex)
    want = np.real(sv.conj() @ h2_sto3g_hamiltonian.to_matrix() @ sv)
    np.testing.assert_allclose(val, want, atol=1e-10)
    np.testing.assert_allclose(val2, want, atol=1e-10)


def test_annihilate_vs_matrix():
    from esoo_tpu.ops import FermionicOp, JordanWignerMapper
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    sv = rng.normal(size=16)
    sv /= np.linalg.norm(sv)
    for p in range(4):
        got = np.asarray(annihilate(jnp.asarray(sv), p))
        mat = JordanWignerMapper().map(
            FermionicOp({f"-_{p}": 1.0}, 4)).to_matrix()
        np.testing.assert_allclose(got, np.real(mat @ sv), atol=1e-12)


def test_rdms_match_operator_expectations():
    """Direct GEMM RDMs == per-operator expectation values (the two paths
    the reference treats as one, opt_orb_minimum_eigensolver.py:187-208)."""
    from esoo_tpu.ops import FermionicOp, JordanWignerMapper
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    sv = rng.normal(size=16) + 1j * rng.normal(size=16)
    sv /= np.linalg.norm(sv)
    svj = jnp.asarray(sv)
    mapper = JordanWignerMapper()
    gamma = np.asarray(one_rdm(svj, 4))
    Gamma = np.asarray(two_rdm(svj, 4))
    for p in range(4):
        for q in range(4):
            mat = mapper.map(FermionicOp({f"+_{p} -_{q}": 1.0}, 4)).to_matrix()
            np.testing.assert_allclose(gamma[p, q], sv.conj() @ mat @ sv,
                                       atol=1e-11)
    for (p, q, r, s) in [(0, 1, 2, 3), (1, 0, 3, 2), (0, 2, 1, 3),
                         (2, 3, 2, 3), (0, 1, 0, 1), (3, 1, 2, 0)]:
        mat = mapper.map(FermionicOp(
            {f"+_{p} +_{q} -_{s} -_{r}": 1.0}, 4)).to_matrix()
        np.testing.assert_allclose(Gamma[p, q, r, s], sv.conj() @ mat @ sv,
                                   atol=1e-11)


def test_fidelity_primitive():
    qc1 = QuantumCircuit(2)
    qc1.h(0)
    qc2 = QuantumCircuit(2)
    t = qc2.parameter()
    qc2.ry(t, 0)
    fid = ComputeUncompute(Sampler()).run(
        [qc1], [qc2], [None], [np.array([np.pi / 2])]).result().fidelities[0]
    np.testing.assert_allclose(fid, 1.0, atol=1e-10)


def test_sampler_distribution():
    qc = QuantumCircuit(2)
    qc.h(0)
    qc.cx(0, 1)
    dist = Sampler().run([qc]).result().quasi_dists[0]
    np.testing.assert_allclose(dist[0], 0.5, atol=1e-12)
    np.testing.assert_allclose(dist[3], 0.5, atol=1e-12)
    assert 1 not in dist and 2 not in dist


def test_estimator_exact_shot_noise(h2_sto3g_hamiltonian):
    """shots= adds Gaussian noise of exactly sqrt(var(H)/shots); enormous
    shot counts reproduce the exact value (reference test pattern,
    tests/test_optorbadaptvqe.py:65-66 uses shots=10**30)."""
    from esoo_tpu.sim import HartreeFock, UCCSD
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    theta = np.array([0.1, -0.05, 0.2])
    exact = Estimator().run([ansatz], [h2_sto3g_hamiltonian],
                            [theta]).result().values[0]
    big = Estimator(shots=10**30).run([ansatz], [h2_sto3g_hamiltonian],
                                      [theta]).result().values[0]
    np.testing.assert_allclose(big, exact, atol=1e-9)
    job = Estimator(shots=10**4, seed=0).run(
        [ansatz], [h2_sto3g_hamiltonian], [theta]).result()
    var = job.metadata[0]["variance"]
    assert var > 0.01            # non-eigenstate: real variance
    assert abs(job.values[0] - exact) < 10 * np.sqrt(var / 10**4)


def test_estimator_broadcast_mismatch_raises(h2_sto3g_hamiltonian):
    qc = QuantumCircuit(4)
    t = qc.parameter()
    qc.ry(t, 0)
    with pytest.raises(ValueError):
        Estimator().run([qc, qc], [h2_sto3g_hamiltonian] * 3,
                        [[0.1], [0.2], [0.3]])


def test_scan_gate_path_matches_unrolled():
    """Long Pauli-rotation runs go through lax.scan (O(1) program size);
    must be bit-identical to the unrolled path, gradients included."""
    import jax
    import jax.numpy as jnp
    import sys
    sv = sys.modules["esoo_tpu.sim.statevector"]
    from esoo_tpu.sim import HartreeFock, UCCSD
    CompiledCircuit = sv.CompiledCircuit
    ans = UCCSD(3, (1, 1), initial_state=HartreeFock(3, (1, 1)), reps=3)
    theta = np.random.default_rng(0).normal(size=ans.num_parameters)
    saved = sv._SCAN_THRESHOLD
    try:
        sv._SCAN_THRESHOLD = 10**9
        f_u = CompiledCircuit(ans).state_fn
        sv._SCAN_THRESHOLD = 4
        f_s = CompiledCircuit(ans).state_fn
        np.testing.assert_array_equal(np.asarray(f_u(theta)),
                                      np.asarray(f_s(theta)))
        gu = jax.grad(lambda t: jnp.sum(f_u(t) ** 2))(jnp.asarray(theta))
        gs = jax.grad(lambda t: jnp.sum(f_s(t) ** 2))(jnp.asarray(theta))
        np.testing.assert_array_equal(np.asarray(gu), np.asarray(gs))
    finally:
        sv._SCAN_THRESHOLD = saved


def test_prot_scan_remat_chunking_identical():
    """Past the residual budget the gate scan switches to sqrt-K remat
    chunks (the N=16 worker-fault fix): state AND gradient must be
    bit-identical to the unchunked scan."""
    import jax
    import jax.numpy as jnp
    import importlib
    sv = importlib.import_module("esoo_tpu.sim.statevector")
    from esoo_tpu.sim import UCCSD, HartreeFock
    from esoo_tpu.sim.rdm import rdm_energy
    from esoo_tpu.orbital_optimization.kernels import expand_spin_tensors

    ans = UCCSD(3, (2, 1), initial_state=HartreeFock(3, (2, 1)))
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=ans.num_parameters) * 0.1)
    h_sp = rng.normal(size=(3, 3))
    h_sp = (h_sp + h_sp.T) / 2
    g_sp = rng.normal(size=(3, 3, 3, 3)) * 0.1
    h_so, g_so = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))

    def run():
        compiled = sv.compile_circuit(ans)
        state = compiled.state_fn(theta)
        vag = jax.value_and_grad(
            lambda t: rdm_energy(compiled.state_fn(t), h_so, g_so))
        e, g = vag(theta)
        return np.asarray(state), float(e), np.asarray(g)

    old = sv._REMAT_RESIDUAL_BUDGET
    try:
        sv._REMAT_RESIDUAL_BUDGET = 1 << 40
        sv._compile_cache.clear()
        s_plain, e_plain, g_plain = run()
        sv._REMAT_RESIDUAL_BUDGET = 1        # force remat chunking
        sv._compile_cache.clear()            # re-trace under the new budget
        s_remat, e_remat, g_remat = run()
    finally:
        sv._REMAT_RESIDUAL_BUDGET = old
        sv._compile_cache.clear()

    np.testing.assert_allclose(s_remat, s_plain, atol=1e-14)
    np.testing.assert_allclose(e_remat, e_plain, atol=1e-13)
    np.testing.assert_allclose(g_remat, g_plain, atol=1e-12)
