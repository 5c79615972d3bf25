"""Particle-number-sector simulation tests (sim/sector.py).

The sector path must be *exactly* equal to the full 2^N simulator: same
generator algebra, same JW sign convention.  New TPU-native capability —
the reference simulates in the full space via Aer throughout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import random_hermitian_tensors
from esoo_tpu.orbital_optimization import FusedOptOrbVQE
from esoo_tpu.orbital_optimization.kernels import expand_spin_tensors
from esoo_tpu.sim import HartreeFock, UCCSD, TwoLocal, QuantumCircuit
from esoo_tpu.sim.rdm import rdm_energy
from esoo_tpu.sim.sector import SectorUCC
from esoo_tpu.sim.statevector import compile_circuit


@pytest.mark.parametrize("n_sp,parts,reps", [(2, (1, 1), 1), (4, (2, 2), 1),
                                             (4, (2, 2), 2), (3, (2, 1), 1)])
def test_sector_state_equals_full(n_sp, parts, reps):
    """Scattered sector amplitudes == full-space simulator output for
    random angles (closed and open shell, multiple reps)."""
    N = 2 * n_sp
    ans = UCCSD(n_sp, parts, initial_state=HartreeFock(n_sp, parts),
                reps=reps)
    sec = SectorUCC(ans, N)
    theta = jnp.asarray(
        np.random.default_rng(5).normal(size=ans.num_parameters) * 0.4)
    sv_full = np.asarray(compile_circuit(ans).state_fn(theta))
    sv_sec = np.asarray(sec.full_state(theta))
    np.testing.assert_allclose(sv_sec, sv_full, atol=1e-12)


def test_sector_dim_is_combinatorial():
    sec = SectorUCC(UCCSD(4, (2, 2), initial_state=HartreeFock(4, (2, 2))),
                    8)
    assert sec.dim == 36  # C(4,2)^2


@pytest.mark.parametrize("n_sp,parts", [(2, (1, 1)), (4, (2, 2)),
                                        (3, (2, 1))])
def test_sector_energy_and_gradient_match_full(n_sp, parts):
    """v^T H_sector v and its theta-gradient equal the full-space RDM
    energy path on random Hermitian tensors."""
    N = 2 * n_sp
    ans = UCCSD(n_sp, parts, initial_state=HartreeFock(n_sp, parts))
    sec = SectorUCC(ans, N)
    h_sp, g_sp = random_hermitian_tensors(n_sp, seed=7)
    h_so, g_so = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    theta = jnp.asarray(
        np.random.default_rng(5).normal(size=ans.num_parameters) * 0.3)
    H = sec.build_hamiltonian(h_so, g_so)
    e_sec = float(sec.energy(theta, H))
    full_fn = compile_circuit(ans).state_fn
    e_full = float(rdm_energy(full_fn(theta), h_so, g_so))
    np.testing.assert_allclose(e_sec, e_full, atol=1e-10)
    g_sec = np.asarray(jax.grad(lambda t: sec.energy(t, H))(theta))
    g_full = np.asarray(jax.grad(
        lambda t: rdm_energy(full_fn(t), h_so, g_so))(theta))
    np.testing.assert_allclose(g_sec, g_full, atol=1e-9)


def test_sector_hamiltonian_matches_ci_matrix():
    """The jittable on-device assembly reproduces the numpy Slater-Condon
    oracle entry for entry."""
    from esoo_tpu.initializations.ci import ci_matrix
    n_sp = 3
    ans = UCCSD(n_sp, (2, 1), initial_state=HartreeFock(n_sp, (2, 1)))
    sec = SectorUCC(ans, 2 * n_sp)
    h_sp, g_sp = random_hermitian_tensors(n_sp, seed=11)
    h_so, g_so = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    H_dev = np.asarray(sec.build_hamiltonian(h_so, g_so))
    H_np = ci_matrix([int(d) for d in sec.dets], np.asarray(h_so),
                     np.asarray(g_so))
    np.testing.assert_allclose(H_dev, H_np, atol=1e-11)


def test_fused_optorbvqe_sector_matches_full(h2_631g):
    """FusedOptOrbVQE(simulation='sector') lands on the same optimum as
    the full-space program and the reference energy."""
    ans = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    res = {}
    for sim in ("full", "sector"):
        res[sim] = FusedOptOrbVQE(
            num_spin_orbitals=4, ansatz=ans, problem=h2_631g, maxiter=20,
            simulation=sim).compute_minimum_energy()
    np.testing.assert_allclose(res["sector"].eigenvalue,
                               res["full"].eigenvalue, atol=1e-8)
    np.testing.assert_array_almost_equal(res["sector"].eigenvalue,
                                         -1.8661038079694765, decimal=3)


def test_fused_ssvqe_mcvqe_sector_match_full(h2_631g):
    """Excited-state fused solvers under sector simulation reproduce the
    full-space results and the reference energies
    (tests/test_optorbssvqe.py:65, test_optorbmcvqe.py:61)."""
    from esoo_tpu.orbital_optimization import (FusedOptOrbMCVQE,
                                               FusedOptOrbSSVQE)
    ans = UCCSD(2, (1, 1), reps=2)
    s0 = QuantumCircuit(4); s0.x(0); s0.x(2)
    s1 = QuantumCircuit(4); s1.x(1); s1.x(2)
    rs = {}
    for sim in ("full", "sector"):
        r = FusedOptOrbSSVQE(num_spin_orbitals=4, ansatz=ans,
                             initial_states=[s0, s1], weight_vector=[2, 1],
                             problem=h2_631g, maxiter=20,
                             simulation=sim).compute_energies()
        rs[sim] = np.asarray(r.eigenvalues)
    np.testing.assert_allclose(rs["sector"], rs["full"], atol=1e-7)
    np.testing.assert_array_almost_equal(
        rs["sector"], [-1.85403538, -1.37044354], decimal=3)
    rm = {}
    for sim in ("full", "sector"):
        r = FusedOptOrbMCVQE(num_spin_orbitals=4, ansatz=ans,
                             num_particles=(1, 1), k=2, excitations="s",
                             problem=h2_631g, maxiter=20,
                             simulation=sim).compute_energies()
        rm[sim] = np.asarray(r.eigenvalues)
    np.testing.assert_allclose(rm["sector"], rm["full"], atol=1e-7)
    np.testing.assert_array_almost_equal(
        rm["sector"], [-1.85703467, -1.46615986], decimal=3)


def test_fused_vqd_sector_matches_full(h2_631g):
    """Sequential deflation in the sector (overlaps = sector dot products)
    matches the full-space fused VQD and the reference energies
    (tests/test_optorbvqd.py:69)."""
    from esoo_tpu.orbital_optimization import FusedOptOrbVQD
    ans = UCCSD(2, (1, 1), reps=2)
    s0 = QuantumCircuit(4); s0.x(0); s0.x(2)
    s1 = QuantumCircuit(4); s1.x(1); s1.x(2)
    rs = {}
    for sim in ("full", "sector"):
        r = FusedOptOrbVQD(num_spin_orbitals=4, ansatz=ans,
                           initial_states=[s0, s1], betas=[2, 2],
                           problem=h2_631g, maxiter=20,
                           simulation=sim).compute_energies()
        rs[sim] = np.asarray(r.eigenvalues)
    np.testing.assert_allclose(rs["sector"], rs["full"], atol=1e-6)
    np.testing.assert_array_almost_equal(
        rs["sector"], [-1.8540352, -1.37044389], decimal=3)


def test_sector_outside_sector_initial_state_raises(h2_631g):
    """An initial state in a different particle sector is rejected."""
    from esoo_tpu.orbital_optimization import FusedOptOrbSSVQE
    ans = UCCSD(2, (1, 1), reps=2)
    s0 = QuantumCircuit(4); s0.x(0); s0.x(2)
    s2 = QuantumCircuit(4); s2.x(0); s2.x(1)  # (2, 0) sector
    with pytest.raises(ValueError, match="outside the particle-number"):
        FusedOptOrbSSVQE(num_spin_orbitals=4, ansatz=ans,
                         initial_states=[s0, s2], problem=h2_631g,
                         simulation="sector")


def test_sector_requires_ucc_family():
    with pytest.raises(ValueError, match="UCC-family"):
        SectorUCC(TwoLocal(4, reps=1), 4)


def test_sector_requires_occupation_basis_initial_state():
    init = QuantumCircuit(8)
    init.h(0)
    with pytest.raises(ValueError, match="X gates only"):
        SectorUCC(UCCSD(4, (2, 2), initial_state=init), 8)


def test_fused_adapt_vqe_sector_matches_full(h2_631g):
    """ADAPT growth (screening backward passes + masked BFGS) in the
    sector matches the full-space fused program and the reference
    OptOrbAdaptVQE energy (tests/test_optorbadaptvqe.py:64)."""
    from esoo_tpu.orbital_optimization import FusedOptOrbAdaptVQE
    rs = {}
    for sim in ("full", "sector"):
        ans = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
        r = FusedOptOrbAdaptVQE(num_spin_orbitals=4, ansatz=ans,
                                problem=h2_631g, maxiter=20,
                                simulation=sim).compute_minimum_energy()
        rs[sim] = r
    np.testing.assert_allclose(rs["sector"].eigenvalue,
                               rs["full"].eigenvalue, atol=1e-6)
    np.testing.assert_array_almost_equal(
        rs["sector"].eigenvalue, -1.866104213792463, decimal=3)
    assert int(rs["sector"].selection_mask.sum()) >= 1


def test_class_adapt_static_padded_circuit_is_sector_eligible(h2_631g):
    """The class-based AdaptVQE static path propagates UCC metadata onto
    its padded R x P circuit, so make_evaluators auto-dispatches it
    through the sector; the energy still matches the reference."""
    from esoo_tpu.ops import ActiveSpaceHamiltonianBuilder
    from esoo_tpu.sim import Estimator
    from esoo_tpu.solvers import VQE, AdaptVQE, L_BFGS_B
    from esoo_tpu.solvers.energy import _sector_for
    from esoo_tpu.solvers.adapt_vqe import _append_group

    tmpl = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    padded = tmpl._ucc_initial_state.copy()
    for _ in range(len(tmpl._ucc_pool)):
        for g in tmpl._ucc_pool:
            _append_group(padded, g)
    padded._ucc_excitations = list(tmpl._ucc_excitations) * len(tmpl._ucc_pool)
    padded._ucc_initial_state = tmpl._ucc_initial_state
    assert _sector_for(padded) is not None

    h_so, g_so = h2_631g.integral_tensors()
    # active-space corner (first 4 spin orbitals) like the OptOrb loop
    import numpy as _np
    idx = _np.r_[0:2, 4:6]
    h4 = h_so[_np.ix_(idx, idx)]
    g4 = g_so[_np.ix_(idx, idx, idx, idx)]
    H = ActiveSpaceHamiltonianBuilder(4).build(h4, g4)
    solver = VQE(Estimator(), tmpl, L_BFGS_B(maxiter=200),
                 initial_point=np.zeros(tmpl.num_parameters))
    res = AdaptVQE(solver, static_shapes=True).compute_minimum_eigenvalue(H)
    np.testing.assert_array_almost_equal(res.eigenvalue, -1.8523881,
                                         decimal=4)


@pytest.mark.parametrize("n_sp,parts", [(2, (1, 1)), (4, (2, 2)),
                                        (3, (2, 1))])
def test_sector_native_rdms_match_full(n_sp, parts):
    """sector.rdms (same-spin excitation tables + one GEMM, never touching
    2^N) equals one_rdm/two_rdm of the scattered full state elementwise,
    closed and open shell."""
    from esoo_tpu.sim.rdm import one_rdm, two_rdm
    N = 2 * n_sp
    ans = UCCSD(n_sp, parts, initial_state=HartreeFock(n_sp, parts))
    sec = SectorUCC(ans, N)
    theta = jnp.asarray(
        np.random.default_rng(11).normal(size=ans.num_parameters) * 0.4)
    v = sec.state(theta)
    g_s, G_s = sec.rdms(v)
    full = sec.to_full(v)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(one_rdm(full, N)),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(G_s), np.asarray(two_rdm(full, N)),
                               atol=1e-10)


@pytest.mark.parametrize("n_sp,parts", [(2, (1, 1)), (3, (2, 1))])
def test_sector_sparse_quadform_matches_dense(n_sp, parts):
    """The production scatter-free quadform over build_values equals the
    dense-H quadratic form (the small-nd oracle) on random tensors."""
    N = 2 * n_sp
    ans = UCCSD(n_sp, parts, initial_state=HartreeFock(n_sp, parts))
    sec = SectorUCC(ans, N)
    h_sp, g_sp = random_hermitian_tensors(n_sp, seed=3)
    h_so, g_so = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    theta = jnp.asarray(
        np.random.default_rng(9).normal(size=ans.num_parameters) * 0.3)
    v = sec.state(theta)
    H = sec.build_hamiltonian(h_so, g_so)
    vals = sec.build_values(h_so, g_so)
    np.testing.assert_allclose(float(sec.quadform_values(v, vals)),
                               float(sec.quadform(v, H)), atol=1e-10)


@pytest.mark.parametrize("n_sp,parts", [(2, (1, 1)), (3, (2, 1)),
                                        (4, (2, 2))])
def test_sector_quadform_custom_vjp_matches_autodiff(n_sp, parts):
    """The gather-only row-kernel quadform (analytic custom VJP — no
    scatters in forward OR backward, the N>=16 TPU path) equals the
    pairwise autodiff oracle in value and in every gradient: d/dtheta
    (through the gate scan), d/ddiag, d/ds_val, d/dd_val."""
    import jax
    N = 2 * n_sp
    ans = UCCSD(n_sp, parts, initial_state=HartreeFock(n_sp, parts))
    sec = SectorUCC(ans, N)
    h_sp, g_sp = random_hermitian_tensors(n_sp, seed=5)
    h_so, g_so = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    vals = sec.build_values_pairs(h_so, g_so)
    theta = jnp.asarray(
        np.random.default_rng(11).normal(size=ans.num_parameters) * 0.3)

    def e_new(th, d, s, dd):
        return sec.quadform_values(sec.state(th), (d, s, dd))

    def e_old(th, d, s, dd):
        return sec._quadform_pairs(sec.state(th), (d, s, dd))

    args = (theta,) + tuple(vals)
    v_new, g_new = jax.value_and_grad(e_new, argnums=(0, 1, 2, 3))(*args)
    v_old, g_old = jax.value_and_grad(e_old, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v_new), float(v_old), atol=1e-10)
    for a, b in zip(g_new, g_old):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_class_optorbvqe_rdms_measured_in_sector(h2_631g, monkeypatch):
    """The class-based OptOrbVQE direct-RDM path measures sector-eligible
    circuits via sector.rdms — the 2^N statevector extraction is never
    invoked (monkeypatched to fail) and the reference energy still lands."""
    from esoo_tpu.sim import Estimator
    from esoo_tpu.solvers import VQE, L_BFGS_B
    from esoo_tpu.orbital_optimization import (
        OptOrbVQE, PartialUnitaryProjectionOptimizer)
    from esoo_tpu.orbital_optimization.base import BaseOptOrbSolver

    def boom(self, sv):
        raise AssertionError("full-space RDM extraction reached")

    monkeypatch.setattr(BaseOptOrbSolver, "measure_rdms_direct", boom)
    ans = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    vqe = VQE(Estimator(), ans, L_BFGS_B(maxiter=300),
              initial_point=np.zeros(ans.num_parameters))
    pupo = PartialUnitaryProjectionOptimizer(1e-3, 1e-5, 10000)
    r = OptOrbVQE(num_spin_orbitals=4, ground_state_solver=vqe,
                  partial_unitary_optimizer=pupo, problem=h2_631g,
                  maxiter=20).compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue, -1.8661038, decimal=3)


def test_slater_condon_structure_disk_cache(tmp_path, monkeypatch):
    """The cached structure loader must roundtrip every array exactly and
    hit its file on the second build (the O(nd^2) host scan is ~86 s at
    H8 N=16 and ~tens of minutes at N=20 — paid once per sector)."""
    import os
    from esoo_tpu.sim import sector as sector_mod
    from esoo_tpu.initializations.ci import (enumerate_determinants,
                                             slater_condon_structure)

    monkeypatch.setenv("ESOO_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(sector_mod, "_SC_CACHE_MIN_ND", 0)
    dets = [int(d) for d in enumerate_determinants(6, (2, 1), 3)]
    direct = slater_condon_structure(dets, 6)
    first = sector_mod._slater_condon_structure_cached(dets, 6)
    files = os.listdir(tmp_path)
    assert any(f.startswith("sector_sc_") and f.endswith(".npz")
               for f in files)
    second = sector_mod._slater_condon_structure_cached(dets, 6)
    for ref, got in ((direct, first), (direct, second)):
        assert set(ref.keys()) == set(got.keys())
        for k in ref:
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(got[k]), err_msg=k)


@pytest.mark.parametrize("n_sp,parts", [(3, (2, 1)), (4, (2, 2))])
def test_sector_tabled_kernels_match_constants(n_sp, parts):
    """The tables-as-program-arguments variants (device_tables + tables=
    on apply/state/build_values/quadform_values/rdms — the N=20 path
    where baked constants break the remote compile) must reproduce the
    constants-based kernels: exact for build_values/quadform/rdms, and
    to reversible-reconstruction roundoff for the gate-scan gradients
    (the tabled apply uses the reversible analytic VJP).

    kernel='pairs' pins the gather kernels under test — the string
    kernels' tabled variants are covered by tests/test_strings.py."""
    N = 2 * n_sp
    ans = UCCSD(n_sp, parts, initial_state=HartreeFock(n_sp, parts))
    sec = SectorUCC(ans, N, kernel="pairs")
    T = sec.device_tables()
    h_sp, g_sp = random_hermitian_tensors(n_sp, seed=7)
    h_so, g_so = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    theta = jnp.asarray(
        np.random.default_rng(13).normal(size=ans.num_parameters) * 0.3)

    # state (forward) exact
    v_c = sec.state(theta)
    v_t = sec.state(theta, tables=T)
    np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_c), atol=1e-13)

    # build_values exact
    vals_c = sec.build_values(h_so, g_so)
    vals_t = sec.build_values(h_so, g_so, tables=T)
    for a, b in zip(vals_t, vals_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    # quadform value + gradients vs the constants kernel
    def e_c(th, d, s, dd):
        return sec.quadform_values(sec.state(th), (d, s, dd))

    def e_t(th, d, s, dd):
        return sec.quadform_values(sec.state(th, tables=T), (d, s, dd),
                                   tables=T)

    args = (theta,) + tuple(vals_c)
    v1, g1 = jax.value_and_grad(e_c, argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(e_t, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v2), float(v1), atol=1e-11)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10)

    # rdms exact
    g_c, G_c = sec.rdms(v_c)
    g_t, G_t = sec.rdms(v_t, tables=T)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_c), atol=1e-12)
    np.testing.assert_allclose(np.asarray(G_t), np.asarray(G_c), atol=1e-12)


def test_fused_chunked_tabled_matches_constants(h2_631g, monkeypatch):
    """End-to-end: the chunked two-dispatch FusedOptOrbVQE with the
    tables-as-arguments programs (threshold forced to 0) reproduces the
    constants-based chunked run."""
    from esoo_tpu.orbital_optimization import fused as fused_mod
    ans = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    kw = dict(num_spin_orbitals=4, ansatz=ans, problem=h2_631g,
              maxiter=20, simulation="sector", dispatch="two", vqe_chunk=7)
    base = FusedOptOrbVQE(**kw).compute_minimum_energy()
    monkeypatch.setattr(fused_mod, "_TABLED_MIN_ND", 0)
    tabled = FusedOptOrbVQE(**kw).compute_minimum_energy()
    np.testing.assert_allclose(tabled.eigenvalue, base.eigenvalue,
                               atol=1e-7)
    assert tabled.outer_iterations == base.outer_iterations
    np.testing.assert_allclose(tabled.optimal_partial_unitary,
                               base.optimal_partial_unitary, atol=1e-5)
