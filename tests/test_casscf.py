"""FusedOptOrbCASSCF + Davidson: exact active-space diagonalization
inside the OptOrb loop (orbital_optimization/casscf.py,
solvers/davidson.py, sim/sector.py SectorCI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)


def _random_spin_orbital_tensors(N, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(N, N))
    h = jnp.asarray((h + h.T) / 2)
    g0 = rng.normal(size=(N,) * 4)
    g = (g0 + g0.transpose(1, 0, 3, 2) + g0.transpose(2, 3, 0, 1)
         + g0.transpose(3, 2, 1, 0))
    return h, jnp.asarray(g)


@pytest.mark.parametrize("n,parts", [(3, (1, 1)), (4, (2, 2)), (4, (2, 1))])
def test_davidson_matches_dense_eigh(n, parts):
    """Davidson on the SectorCI sigma == lowest eigenvalue of the dense
    sector Hamiltonian (pairs-kernel oracle), incl. open shells."""
    from esoo_tpu.sim import HartreeFock, UCCSD
    from esoo_tpu.sim.sector import SectorCI, SectorUCC
    from esoo_tpu.solvers.davidson import davidson_ground

    N = 2 * n
    ci = SectorCI(N, parts)
    h, g = _random_spin_orbital_tensors(N, seed=n + parts[0])
    vals = ci.build_values(h, g)
    diag = ci.diagonal_values(vals).reshape(-1)

    def mv(x):
        return ci.sigma_values(x.reshape(ci.nB, ci.nA),
                               vals).reshape(-1)

    res = davidson_ground(mv, diag, ci.hf_matrix(jnp.float64).reshape(-1),
                          max_subspace=12, maxiter=300, tol=1e-10)
    ans = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    H = np.asarray(SectorUCC(ans, N, kernel="pairs",
                             num_particles=parts).build_hamiltonian(h, g))
    w = np.linalg.eigvalsh(H)
    assert abs(float(res.eigenvalue) - w[0]) < 1e-8
    # eigenvector residual is small
    assert float(res.residual_norm) < 1e-8 * max(1.0, abs(w[0]))


def test_sector_ci_diagonal_exact():
    """strings.diagonal == diag of the dense sector Hamiltonian."""
    from esoo_tpu.sim import HartreeFock, UCCSD
    from esoo_tpu.sim.sector import SectorCI, SectorUCC

    N, parts = 8, (2, 2)
    ci = SectorCI(N, parts)
    h, g = _random_spin_orbital_tensors(N, seed=3)
    vals = ci.build_values(h, g)
    d = np.asarray(ci.diagonal_values(vals)).reshape(-1)
    ans = UCCSD(4, parts, initial_state=HartreeFock(4, parts))
    H = np.asarray(SectorUCC(ans, N, kernel="pairs").build_hamiltonian(
        h, g))
    np.testing.assert_allclose(d, np.diag(H), atol=1e-12)


def test_casscf_h2_631g_matches_optorbvqe_value(h2_631g):
    """UCCSD is exact for two electrons, so CASSCF lands on the same
    optimum as the reference-anchored OptOrbVQE expectation -1.8661038
    (reference tests/test_optorbvqe.py:67)."""
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    r = FusedOptOrbCASSCF(4, problem=h2_631g,
                          maxiter=20).compute_minimum_energy()
    np.testing.assert_array_almost_equal(r.eigenvalue, -1.8661038,
                                         decimal=4)
    assert r.outer_iterations <= 10
    # eigenvector is returned normalized, in the sector basis
    assert abs(np.linalg.norm(r.optimal_point) - 1.0) < 1e-8
    # natural occupations: descending, trace = number of electrons
    occ = r.natural_occupations
    assert occ is not None and np.all(np.diff(occ) <= 1e-12)
    np.testing.assert_allclose(occ.sum(), 2.0, atol=1e-8)


def test_casscf_two_dispatch_equals_one_dispatch(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    one = FusedOptOrbCASSCF(4, problem=h2_631g,
                            maxiter=12).compute_minimum_energy()
    two = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=12,
                            dispatch="two").compute_minimum_energy()
    np.testing.assert_allclose(two.eigenvalue, one.eigenvalue, atol=1e-10)
    np.testing.assert_allclose(two.optimal_partial_unitary,
                               one.optimal_partial_unitary, atol=1e-8)


def test_casscf_below_or_equal_vqe(h4_631g):
    """Exact diagonalization is the variational upper baseline: CASSCF
    energy <= converged OptOrbVQE (UCCSD) energy at the same size."""
    from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                               FusedOptOrbVQE)
    from esoo_tpu.sim import HartreeFock, UCCSD

    rc = FusedOptOrbCASSCF(8, problem=h4_631g,
                           maxiter=20).compute_minimum_energy()
    ansatz = UCCSD(4, (2, 2), initial_state=HartreeFock(4, (2, 2)))
    rv = FusedOptOrbVQE(8, ansatz, problem=h4_631g,
                        maxiter=20).compute_minimum_energy()
    assert rc.eigenvalue <= rv.eigenvalue + 1e-9


def test_casscf_checkpoint_resume(h2_631g, tmp_path):
    """resume_from warm-starts both U and the sector eigenvector."""
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    ckdir = str(tmp_path / "ck")
    r = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=12,
                          checkpoint_dir=ckdir).compute_minimum_energy()
    import glob
    cks = sorted(glob.glob(ckdir + "/*.npz"))
    assert cks
    r2 = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=12,
                           resume_from=cks[-1]).compute_minimum_energy()
    # the resumed run restarts the convergence check (E_prev = inf), so
    # it may descend a little further than the original's stopping
    # point — it must land at the same optimum at tolerance scale and
    # never above the checkpointed energy
    np.testing.assert_allclose(r2.eigenvalue, r.eigenvalue, atol=1e-4)
    assert r2.eigenvalue <= r.eigenvalue + 1e-9


def test_casscf_requires_particles_or_problem():
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    N = 4
    h = np.zeros((N, N))
    g = np.zeros((N,) * 4)
    with pytest.raises(ValueError, match="num_particles"):
        FusedOptOrbCASSCF(4, integral_tensors=(h, g))


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs multiple (virtual) devices")
def test_casscf_mesh_equality(h2_631g):
    """mesh= shards both the g tensor and the sigma operator batch;
    energies match the unmeshed run."""
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF
    from esoo_tpu.parallel import make_orbital_mesh

    r0 = FusedOptOrbCASSCF(4, problem=h2_631g,
                           maxiter=12).compute_minimum_energy()
    solver = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=12,
                               mesh=make_orbital_mesh(4))
    assert solver._sector_tables is not None
    r1 = solver.compute_minimum_energy()
    np.testing.assert_allclose(r1.eigenvalue, r0.eigenvalue, atol=1e-10)


@pytest.mark.parametrize("k", [2, 3])
def test_block_davidson_matches_dense_eigh(k):
    from esoo_tpu.sim import HartreeFock, UCCSD
    from esoo_tpu.sim.sector import SectorCI, SectorUCC
    from esoo_tpu.solvers.davidson import davidson_block

    N, parts = 8, (2, 2)
    ci = SectorCI(N, parts)
    h, g = _random_spin_orbital_tensors(N, seed=11)
    vals = ci.build_values(h, g)
    diag = ci.diagonal_values(vals).reshape(-1)

    def mv(x):
        return ci.sigma_values(x.reshape(ci.nB, ci.nA),
                               vals).reshape(-1)

    order = np.argsort(np.asarray(diag))
    V0 = np.zeros((k, ci.dim))
    V0[np.arange(k), order[:k]] = 1.0
    res = davidson_block(mv, diag, jnp.asarray(V0), k=k, max_subspace=18,
                         maxiter=400, tol=1e-10)
    ans = UCCSD(4, parts, initial_state=HartreeFock(4, parts))
    H = np.asarray(SectorUCC(ans, N, kernel="pairs").build_hamiltonian(
        h, g))
    w = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w[:k],
                               atol=1e-8)
    # eigenvector block is orthonormal
    X = np.asarray(res.eigenvectors)
    np.testing.assert_allclose(X @ X.T, np.eye(k), atol=1e-8)


def test_sa_casscf_matches_mcvqe_reference_values(h2_631g):
    """SA-CASSCF k=2 is the exact state-averaged optimum; the reference's
    OptOrbMCVQE expectation [-1.85703467, -1.46615986]
    (tests/test_optorbmcvqe.py:61) is that optimum for H2 — reproduced
    here with no ansatz at all."""
    from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

    r = FusedOptOrbSACASSCF(4, k=2, problem=h2_631g,
                            maxiter=20).compute_energies()
    np.testing.assert_array_almost_equal(
        np.asarray(r.eigenvalues), [-1.85703467, -1.46615986], decimal=5)


def test_sa_casscf_two_dispatch_and_below_ssvqe(h2_631g):
    from esoo_tpu.orbital_optimization import (FusedOptOrbSACASSCF,
                                               FusedOptOrbSSVQE)
    from esoo_tpu.sim import QuantumCircuit, UCCSD

    r1 = FusedOptOrbSACASSCF(4, k=2, problem=h2_631g,
                             maxiter=20).compute_energies()
    r2 = FusedOptOrbSACASSCF(4, k=2, problem=h2_631g, maxiter=20,
                             dispatch="two").compute_energies()
    np.testing.assert_allclose(np.asarray(r2.eigenvalues),
                               np.asarray(r1.eigenvalues), atol=1e-10)
    ansatz = UCCSD(2, (1, 1), reps=2)
    s0 = QuantumCircuit(4); s0.x(0); s0.x(2)
    s1 = QuantumCircuit(4); s1.x(1); s1.x(2)
    rs = FusedOptOrbSSVQE(4, ansatz, initial_states=[s0, s1],
                          weight_vector=[2, 1], problem=h2_631g,
                          maxiter=20).compute_energies()
    w = np.array([2.0, 1.0])
    assert (w @ np.asarray(r1.eigenvalues)
            <= w @ np.asarray(rs.eigenvalues) + 1e-9)


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs multiple (virtual) devices")
def test_sa_casscf_mesh_equality(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF
    from esoo_tpu.parallel import make_orbital_mesh

    r0 = FusedOptOrbSACASSCF(4, k=2, problem=h2_631g,
                             maxiter=12).compute_energies()
    r1 = FusedOptOrbSACASSCF(4, k=2, problem=h2_631g, maxiter=12,
                             mesh=make_orbital_mesh(4)).compute_energies()
    np.testing.assert_allclose(np.asarray(r1.eigenvalues),
                               np.asarray(r0.eigenvalues), atol=1e-10)


def test_casscf_compact_storage_equals_dense(h4_631g):
    """table_storage='compact' (int8 stacks + operator-chunked kernels,
    the single-chip path past ~1M determinants) reproduces the dense
    path end-to-end — energies, U, and natural occupations."""
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    dense = FusedOptOrbCASSCF(8, problem=h4_631g, maxiter=8,
                              table_storage="dense"
                              ).compute_minimum_energy()
    comp = FusedOptOrbCASSCF(8, problem=h4_631g, maxiter=8,
                             table_storage="compact"
                             ).compute_minimum_energy()
    np.testing.assert_allclose(comp.eigenvalue, dense.eigenvalue,
                               atol=1e-9)
    np.testing.assert_allclose(comp.optimal_partial_unitary,
                               dense.optimal_partial_unitary, atol=1e-7)
    np.testing.assert_allclose(comp.natural_occupations,
                               dense.natural_occupations, atol=1e-8)


def test_casscf_compact_two_dispatch_and_sa(h2_631g):
    """Compact storage works through dispatch='two' and the
    state-averaged block-Davidson variant."""
    from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                               FusedOptOrbSACASSCF)

    one = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=10,
                            table_storage="compact"
                            ).compute_minimum_energy()
    two = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=10,
                            dispatch="two", table_storage="compact"
                            ).compute_minimum_energy()
    np.testing.assert_allclose(two.eigenvalue, one.eigenvalue, atol=1e-10)

    sa_d = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8
                               ).compute_energies()
    sa_c = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                               table_storage="compact").compute_energies()
    np.testing.assert_allclose(np.asarray(sa_c.eigenvalues),
                               np.asarray(sa_d.eigenvalues), atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs multiple (virtual) devices")
def test_casscf_compact_mesh_equality(h2_631g):
    """mesh= composes with table_storage='compact' (round-3 verdict
    item 3): int8 stacks sharded over the operator axis under the dense
    kernel keys reproduce the dense unmeshed energies exactly."""
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF
    from esoo_tpu.parallel import make_orbital_mesh

    r0 = FusedOptOrbCASSCF(4, problem=h2_631g,
                           maxiter=12).compute_minimum_energy()
    solver = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=12,
                               table_storage="compact",
                               mesh=make_orbital_mesh(4))
    assert solver.table_storage == "sharded-compact"
    tabs = solver._sector_tables
    assert np.asarray(tabs["MA"]).dtype == np.int8
    r1 = solver.compute_minimum_energy()
    np.testing.assert_allclose(r1.eigenvalue, r0.eigenvalue, atol=1e-10)


def test_casscf_table_storage_validation(h2_631g):
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    with pytest.raises(ValueError, match="table_storage"):
        FusedOptOrbCASSCF(4, problem=h2_631g, table_storage="int8")


def test_casscf_spin_squared_diagnostic(h2_631g):
    """<S^2> of the optimal state: H2 ground state is a singlet (0);
    an H3 doublet sector gives 0.75; both dispatch modes populate it."""
    from esoo_tpu.chem import MoleculeDriver
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    r = FusedOptOrbCASSCF(4, problem=h2_631g,
                          maxiter=10).compute_minimum_energy()
    np.testing.assert_allclose(r.spin_squared, 0.0, atol=1e-8)
    r2 = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=10,
                           dispatch="two").compute_minimum_energy()
    np.testing.assert_allclose(r2.spin_squared, 0.0, atol=1e-8)

    p3 = MoleculeDriver(atom="H 0 0 0; H 0 0 0.9; H 0 0 1.8",
                        basis="sto-3g", spin=1).run()
    r3 = FusedOptOrbCASSCF(6, problem=p3,
                           maxiter=10).compute_minimum_energy()
    np.testing.assert_allclose(r3.spin_squared, 0.75, atol=1e-7)


def test_spin_squared_from_rdms_triplet():
    """The RDM spin formula on exact sector eigenstates: the (1, 1)
    sector of a 2-orbital system contains both the S_z=0 triplet
    component (S^2 = 2) and singlets (S^2 = 0) — check against exact
    eigenvectors of a dense SPIN-FREE sector Hamiltonian (random spatial
    tensors spin-expanded, so [H, S^2] = 0 and every non-degenerate
    eigenstate is an S^2 eigenstate)."""
    from esoo_tpu.sim.sector import SectorCI
    from esoo_tpu.orbital_optimization import spin_squared_from_rdms
    from esoo_tpu.orbital_optimization.kernels import expand_spin_tensors

    n, parts = 2, (1, 1)
    sec = SectorCI(2 * n, parts)
    rng = np.random.default_rng(3)
    h_sp = rng.normal(size=(n, n))
    h_sp = (h_sp + h_sp.T) / 2
    g0 = rng.normal(size=(n,) * 4)
    g_sp = (g0 + g0.transpose(1, 0, 3, 2) + g0.transpose(2, 3, 0, 1)
            + g0.transpose(3, 2, 1, 0))
    h, g = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    vals = sec.build_values(h, g)
    nd = sec.dim
    H = np.zeros((nd, nd))
    for j in range(nd):
        e = np.zeros(nd)
        e[j] = 1.0
        H[:, j] = np.asarray(sec.sigma_values(
            jnp.asarray(e).reshape(sec.nB, sec.nA), vals)).reshape(-1)
    w, X = np.linalg.eigh((H + H.T) / 2)
    s2s = []
    for j in range(nd):
        gam, Gam = sec.rdms(jnp.asarray(X[:, j]).reshape(sec.nB, sec.nA))
        s2s.append(float(spin_squared_from_rdms(gam, Gam)))
    s2s = np.sort(np.round(np.asarray(s2s), 6))
    # 4 determinants in the (1,1) sector: 3 singlet-ish combos + 1
    # triplet S_z=0 component; a spin-free random Hamiltonian may mix
    # degenerate states, but every exact eigenstate must have S^2 in
    # {0, 2} up to degeneracy mixing — check the extremes are present
    assert s2s[0] < 1e-6           # at least one singlet
    assert abs(s2s[-1] - 2.0) < 1e-6   # the triplet component


def test_block_davidson_chunked_equals_monolithic():
    """init + bounded advance dispatches + finish computes the identical
    result to the single-while-loop davidson_block — and on a spectrum
    that straddles zero, where dead correction rows used to alias
    spurious zero Ritz pairs (regression: dead rows are now padded out
    of the Rayleigh-Ritz)."""
    from esoo_tpu.solvers.davidson import (
        davidson_block, davidson_block_init, davidson_block_advance,
        davidson_block_finish)

    rng = np.random.default_rng(0)
    n, k = 200, 3
    A = rng.normal(size=(n, n))
    A = (A + A.T) / 2 + np.diag(np.arange(n) * 1.0)   # lowest evals < 0
    Aj = jnp.asarray(A)
    mv = lambda x: Aj @ x
    diag = jnp.diagonal(Aj)
    V0 = jnp.asarray(rng.normal(size=(k, n)))
    ref = davidson_block(mv, diag, V0, k=k, max_subspace=12,
                         maxiter=300, tol=1e-10)
    w_exact = np.linalg.eigvalsh(A)[:k]
    np.testing.assert_allclose(np.asarray(ref.eigenvalues), w_exact,
                               atol=1e-8)
    st = davidson_block_init(mv, diag, V0, k=k, max_subspace=12,
                             tol=1e-10)
    while (not bool(np.asarray(st[-1]))
           and int(np.asarray(st[3])) < 300):
        st = davidson_block_advance(mv, diag, st, iters=7, tol=1e-10)
    r2 = davidson_block_finish(mv, diag, st, tol=1e-10)
    np.testing.assert_allclose(np.asarray(r2.eigenvalues),
                               np.asarray(ref.eigenvalues), atol=1e-10)
    np.testing.assert_allclose(
        np.abs(np.asarray(r2.eigenvectors)
               @ np.asarray(ref.eigenvectors).T), np.eye(k), atol=1e-6)


def test_sa_casscf_davidson_chunk_equality(h2_631g):
    """davidson_chunk (bounded eigensolver dispatches, the vqe_chunk
    analogue) reproduces the unchunked SA result, dense and compact."""
    from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

    base = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                               dispatch="two").compute_energies()
    for storage in ("dense", "compact"):
        ck = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                                 dispatch="two", davidson_chunk=3,
                                 table_storage=storage
                                 ).compute_energies()
        np.testing.assert_allclose(np.asarray(ck.eigenvalues),
                                   np.asarray(base.eigenvalues),
                                   atol=1e-8)
    with pytest.raises(ValueError, match="davidson_chunk"):
        FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, davidson_chunk=3,
                            dispatch="one")


def test_davidson_tol_ladder_semantics(h2_631g):
    """davidson_tol_ladder (opt-in): loop solves run loose, the final
    re-solve runs tight, so returned energies match the unladdered
    chunked run within the looser-trajectory tolerance; the kwarg
    requires davidson_chunk.  Flagship rationale: the SA k=3 N=32 loop
    spends ~91% of wall in Davidson advances (stage_stats profile)."""
    from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                               FusedOptOrbSACASSCF)

    base = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                               dispatch="two", davidson_chunk=3
                               ).compute_energies()
    lad_solver = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                                     dispatch="two", davidson_chunk=3,
                                     davidson_tol_ladder=True)
    lad = lad_solver.compute_energies()
    np.testing.assert_allclose(np.asarray(lad.eigenvalues),
                               np.asarray(base.eigenvalues), atol=2e-5)
    # stage stats (observability for the flagship probes) populate
    assert lad_solver.stage_stats["davidson_iters"]
    assert (len(lad_solver.stage_stats["solve_s"])
            == len(lad_solver.stage_stats["davidson_iters"]))

    g_base = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=8,
                               dispatch="two", davidson_chunk=3
                               ).compute_minimum_energy()
    g_lad = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=8,
                              dispatch="two", davidson_chunk=3,
                              davidson_tol_ladder=True
                              ).compute_minimum_energy()
    np.testing.assert_allclose(g_lad.eigenvalue, g_base.eigenvalue,
                               atol=2e-5)
    with pytest.raises(ValueError, match="davidson_tol_ladder"):
        FusedOptOrbCASSCF(4, problem=h2_631g, davidson_tol_ladder=True)


def test_ground_casscf_davidson_chunk_equality(h2_631g):
    """Ground-path davidson_chunk (k=1 block machinery, bounded
    dispatches) matches the unchunked davidson_ground two-dispatch run,
    dense and compact."""
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    base = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=10,
                             dispatch="two").compute_minimum_energy()
    for storage in ("dense", "compact"):
        ck = FusedOptOrbCASSCF(4, problem=h2_631g, maxiter=10,
                               dispatch="two", davidson_chunk=4,
                               table_storage=storage
                               ).compute_minimum_energy()
        np.testing.assert_allclose(ck.eigenvalue, base.eigenvalue,
                                   atol=1e-7)


def test_sa_casscf_per_state_diagnostics(h2_631g):
    """SA results carry per-state natural occupations and <S^2>: the H2
    6-31G -> 4 k=2 ladder is ground singlet + first excited state; each
    state's occupations sum to the electron count and <S^2> identifies
    its spin (values in {0, 2} for this two-electron sector)."""
    from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

    r = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2,
                            maxiter=8).compute_energies()
    assert r.spin_squared is not None and r.spin_squared.shape == (2,)
    assert r.natural_occupations.shape == (2, 2)
    np.testing.assert_allclose(r.natural_occupations.sum(axis=1),
                               [2.0, 2.0], atol=1e-7)
    for s2 in r.spin_squared:
        assert min(abs(s2 - 0.0), abs(s2 - 2.0)) < 1e-6
    r2 = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                             dispatch="two").compute_energies()
    np.testing.assert_allclose(r2.spin_squared, r.spin_squared,
                               atol=1e-7)
    # sequential (compact-table) diagnostics extraction agrees too
    r3 = FusedOptOrbSACASSCF(4, problem=h2_631g, k=2, maxiter=8,
                             table_storage="compact").compute_energies()
    np.testing.assert_allclose(r3.spin_squared, r.spin_squared,
                               atol=1e-7)
    np.testing.assert_allclose(r3.natural_occupations,
                               r.natural_occupations, atol=1e-7)


def test_sa_sequential_predicate():
    """Sequential state processing trips on compact tables OR a dense
    sector past _SEQ_MV_MIN_ND (the SA k=3 N=28 dense vmap OOM), and
    never for single-state dense work."""
    from types import SimpleNamespace
    from esoo_tpu.orbital_optimization.casscf import (
        _sa_sequential, _SEQ_MV_MIN_ND)

    small = SimpleNamespace(nB=70, nA=70)            # nd = 4,900
    big = SimpleNamespace(nB=1001, nA=1001)          # nd ~ 1.0M (N=28)
    assert big.nB * big.nA >= _SEQ_MV_MIN_ND
    compact_tabs = {"MA8": None}
    dense_tabs = {"MA": None}
    assert not _sa_sequential(small, 3, None)
    assert not _sa_sequential(small, 3, dense_tabs)
    assert _sa_sequential(small, 3, compact_tabs)
    assert _sa_sequential(big, 3, None)
    assert _sa_sequential(big, 3, dense_tabs)
    assert not _sa_sequential(big, 1, dense_tabs)    # ground keeps vmap
    assert _sa_sequential(big, 1, compact_tabs)


class TestStateSpecificExcited:
    def test_zero_weight_optimizes_excited_orbitals(self):
        # weight_vector=[0, 1] makes the orbital update purely
        # state-1-driven: true state-specific excited CASSCF through
        # the existing weighted machinery — E1 drops below the SA
        # value, E0 (no longer favored) rises above SA's
        from esoo_tpu.chem import MoleculeDriver
        from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

        p = MoleculeDriver("Li 0 0 0; H 0 0 1.5949",
                           basis="sto-3g").run()
        sa = FusedOptOrbSACASSCF(8, k=2, problem=p,
                                 maxiter=20).compute_energies()
        ss = FusedOptOrbSACASSCF(8, k=2, weight_vector=[0, 1],
                                 problem=p, maxiter=20).compute_energies()
        assert ss.eigenvalues[1] < sa.eigenvalues[1] - 1e-3
        assert ss.eigenvalues[0] > sa.eigenvalues[0] + 1e-3


class TestMultipletDegeneracy:
    def test_triplet_identical_across_sz_sectors(self):
        # the Sz=1 (2,0)-sector ground state and the S^2=2 member of
        # the Sz=0 (1,1)-sector ladder are the SAME multiplet: in the
        # full orbital space (FCI — basis invariant) they must be
        # exactly degenerate even though the two runs use different
        # SCF references (ROHF vs RHF) and disjoint determinant bases
        from esoo_tpu.chem import MoleculeDriver
        from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                                   FusedOptOrbSACASSCF)

        pt = MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="6-31g",
                            spin=2).run()
        rt = FusedOptOrbCASSCF(num_spin_orbitals=8, problem=pt,
                               maxiter=1).compute_minimum_energy()
        assert rt.spin_squared == pytest.approx(2.0, abs=1e-10)

        p0 = MoleculeDriver("H 0 0 0; H 0 0 0.735",
                            basis="6-31g").run()
        sa = FusedOptOrbSACASSCF(8, k=3, problem=p0,
                                 maxiter=1).compute_energies()
        i = int(np.argmin(np.abs(np.asarray(sa.spin_squared) - 2.0)))
        assert sa.spin_squared[i] == pytest.approx(2.0, abs=1e-10)
        assert rt.eigenvalue == pytest.approx(sa.eigenvalues[i],
                                              abs=1e-12)

    def test_state_specific_triplet_below_sa_triplet(self):
        # in a REDUCED space the Sz=1 run optimizes orbitals FOR the
        # triplet, so it lands below the SA ladder's triplet member
        from esoo_tpu.chem import MoleculeDriver
        from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                                   FusedOptOrbSACASSCF)

        pt = MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="6-31g",
                            spin=2).run()
        rt = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=pt,
                               maxiter=20).compute_minimum_energy()
        p0 = MoleculeDriver("H 0 0 0; H 0 0 0.735",
                            basis="6-31g").run()
        sa = FusedOptOrbSACASSCF(4, k=3, problem=p0,
                                 maxiter=20).compute_energies()
        i = int(np.argmin(np.abs(np.asarray(sa.spin_squared) - 2.0)))
        assert rt.eigenvalue < sa.eigenvalues[i] - 1e-4
