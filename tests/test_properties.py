"""Molecular properties: multipole integrals + RDM dipole moments.

Validation strategy (no external reference data needed):
  * origin-shift identity D(origin=a) = D(0) - a*S — an exact algebraic
    property of the moment integrals, exercised through d shells.
  * Hellmann-Feynman: every solver here is variational, so for the
    field-perturbed Hamiltonian h -> h + F*D the energy derivative
    dE/dF at the optimum equals tr(gamma D).  Central finite differences
    of fully re-converged SCF / CASSCF energies must match the analytic
    RDM dipole — this tests the integrals, the RDM plumbing, and the
    property assembly end to end.
  * frozen-core consistency: the HF dipole is invariant under
    active_space() reduction (core folds into dipole_core).

Reference anchor: the reference never evaluates properties (PySCF owns
the integrals, /root/reference/base_opt_orb_solver.py:87-91 consumes
energies only); this subsystem fills the PySCF property-integral role
of SURVEY.md §2.3.
"""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver, dipole_moment
from esoo_tpu.chem.basis import ATOMIC_NUMBERS, build_shells
from esoo_tpu.chem.integrals import IntegralEngine
from esoo_tpu.chem.properties import AU_TO_DEBYE, hf_density_spatial
from esoo_tpu.chem.scf import rhf


def _engine(atom, basis):
    shells, symbols, coords = build_shells(atom, basis)
    charges = np.array([ATOMIC_NUMBERS[s] for s in symbols], float)
    return IntegralEngine(shells, charges, coords), charges, coords


class TestMomentIntegrals:
    def test_origin_shift_identity_sto3g(self):
        eng, _, _ = _engine("Li 0 0 0; H 0 0 1.6", "sto-3g")
        S, _, _ = eng.one_electron()
        a = np.array([0.3, -0.7, 0.2])
        D0, Da = eng.dipole(), eng.dipole(origin=a)
        for d in range(3):
            np.testing.assert_allclose(Da[d], D0[d] - a[d] * S,
                                       atol=1e-13)

    def test_origin_shift_identity_d_shells(self):
        # cc-pVDZ carbon/oxygen carry pure d shells — exercises the
        # spherical transform of the moment blocks
        eng, _, _ = _engine("C 0.1 -0.2 0.3; O 0 0 2.1", "cc-pvdz")
        S, _, _ = eng.one_electron()
        a = np.array([-0.4, 0.9, 0.6])
        D0, Da = eng.dipole(), eng.dipole(origin=a)
        for d in range(3):
            np.testing.assert_allclose(Da[d], D0[d] - a[d] * S,
                                       atol=1e-12)

    def test_symmetry_and_second_moment(self):
        eng, _, _ = _engine("H 0 0 0; H 0 0 1.4", "6-31g")
        D = eng.dipole()
        for d in range(3):
            np.testing.assert_allclose(D[d], D[d].T, atol=1e-14)
        # <mu|x^2|mu> > 0 for every basis function
        Q = eng.moments([(2, 0, 0), (0, 2, 0), (0, 0, 2)])
        assert (np.diagonal(Q, axis1=1, axis2=2) > 0).all()

    def test_s_functions_analytic(self):
        # single normalized s Gaussian at R: <x> = R_x exactly
        # (geometry strings are Angstrom; integrals live in bohr)
        from esoo_tpu.chem.basis import ANGSTROM_TO_BOHR

        eng, _, _ = _engine("H 0.5 -0.25 0.75", "sto-3g")
        S, _, _ = eng.one_electron()
        D = eng.dipole()
        np.testing.assert_allclose(
            [D[0][0, 0], D[1][0, 0], D[2][0, 0]],
            np.array([0.5, -0.25, 0.75]) * ANGSTROM_TO_BOHR * S[0, 0],
            atol=1e-12)


class TestSCFDipole:
    def test_h2_zero_dipole(self):
        problem = MoleculeDriver("H 0 0 0; H 0 0 0.735",
                                 basis="6-31g").run()
        mu = dipole_moment(problem)
        np.testing.assert_allclose(mu, 0.0, atol=1e-10)

    def test_lih_hellmann_feynman(self):
        # analytic HF dipole == -dE/dF for h -> h + F*D_z (re-converged
        # SCF at each field; HF is variational so the identity is exact)
        atom = "Li 0 0 0; H 0 0 3.0139"  # ~1.595 A in bohr units? no:
        # geometry strings are in ANGSTROM throughout the package
        atom = "Li 0 0 0; H 0 0 1.595"
        eng, charges, coords = _engine(atom, "sto-3g")
        S, T, V = eng.one_electron()
        eri = eng.eri()
        hcore = T + V
        D = eng.dipole()
        F = 2e-5
        es = []
        for sgn in (+1, -1):
            scf = rhf(S, hcore + sgn * F * D[2], eri, 4, charges, coords)
            assert scf.converged
            es.append(scf.energy_electronic)
        dEdF = (es[0] - es[1]) / (2 * F)
        problem = MoleculeDriver(atom, basis="sto-3g").run()
        mu = dipole_moment(problem)
        mu_nuc_z = float(np.einsum("a,a->", charges, coords[:, 2]))
        # dE/dF = <z>_elec = mu_nuc_z - mu_z
        np.testing.assert_allclose(mu_nuc_z - mu[2], dEdF, atol=5e-7)
        # sanity: LiH dipole points from Li(+) to H(-), a few Debye
        assert 3.0 < abs(mu[2]) * AU_TO_DEBYE < 8.0

    def test_units(self):
        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="sto-3g").run()
        au = dipole_moment(problem, unit="au")
        debye = dipole_moment(problem, unit="debye")
        np.testing.assert_allclose(debye, au * AU_TO_DEBYE)
        with pytest.raises(ValueError):
            dipole_moment(problem, unit="coulomb-meters")

    def test_no_dipole_integrals_raises(self):
        problem = MoleculeDriver("H 0 0 0; H 0 0 0.735",
                                 basis="sto-3g").run()
        problem.dipole_mo = None
        with pytest.raises(ValueError, match="no dipole integrals"):
            dipole_moment(problem)

    def test_frozen_core_invariance(self):
        # HF-level dipole is identical computed from the full problem or
        # from the frozen-core active problem (core in dipole_core)
        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="sto-3g").run()
        mu_full = dipole_moment(problem)
        act = problem.active_space()          # freezes the Li 1s core
        mu_act = dipole_moment(act)           # HF density of the rest
        np.testing.assert_allclose(mu_act, mu_full, atol=1e-12)

    def test_rohf_density_occupations(self):
        problem = MoleculeDriver("H 0 0 0; H 0 0 1.0; H 0 0 2.0",
                                 basis="sto-3g", spin=1).run()
        g = hf_density_spatial(problem)
        assert np.trace(g) == pytest.approx(3.0)
        assert g[0, 0] == 2.0 and g[1, 1] == 1.0


class TestQuadrupole:
    def test_second_moment_origin_shift_identity(self):
        # <(x-ax)(y-ay)> = <xy> - ax<y> - ay<x> + ax ay S, exact through
        # d shells (cc-pVDZ C/O)
        eng, _, _ = _engine("C 0.1 -0.2 0.3; O 0 0 2.1", "cc-pvdz")
        S, _, _ = eng.one_electron()
        a = np.array([0.5, -0.3, 0.8])
        D = eng.dipole()
        Q0 = eng.quadrupole()
        Qa = eng.quadrupole(origin=a)
        comps = eng.QUAD_COMPS
        for c, (ex, ey, ez) in enumerate(comps):
            (i, j) = [d for d in range(3) for _ in range((ex, ey, ez)[d])]
            np.testing.assert_allclose(
                Qa[c],
                Q0[c] - a[i] * D[j] - a[j] * D[i] + a[i] * a[j] * S,
                atol=1e-11)

    def test_h2_traceless_origin_independent_and_sign(self):
        from esoo_tpu.chem import quadrupole_moment

        # neutral, zero dipole: traceless quadrupole origin-independent;
        # H2 has a positive Theta_zz (prolate charge distribution)
        p1 = MoleculeDriver("H 0 0 0; H 0 0 0.7414", basis="6-31g").run()
        p2 = MoleculeDriver("H 1 2 3; H 1 2 3.7414", basis="6-31g").run()
        Q1 = quadrupole_moment(p1)
        Q2 = quadrupole_moment(p2)
        # independently converged SCFs: agreement to the SCF noise floor
        np.testing.assert_allclose(Q1, Q2, atol=1e-6)
        assert abs(np.trace(Q1)) < 1e-10
        assert Q1[2, 2] > 0.1
        np.testing.assert_allclose(Q1[0, 0], Q1[1, 1], atol=1e-10)

    def test_hellmann_feynman_second_moment(self):
        # dE/dF for h -> h + F*<z^2> equals the analytic <z^2> at SCF
        atom = "Li 0 0 0; H 0 0 1.595"
        eng, charges, coords = _engine(atom, "sto-3g")
        S, T, V = eng.one_electron()
        eri = eng.eri()
        M = eng.quadrupole()           # zz is component 5
        F = 2e-5
        es = []
        for sgn in (+1, -1):
            scf = rhf(S, T + V + sgn * F * M[5], eri, 4, charges, coords)
            assert scf.converged
            es.append(scf.energy_electronic)
        dEdF = (es[0] - es[1]) / (2 * F)
        from esoo_tpu.chem import quadrupole_moment
        problem = MoleculeDriver(atom, basis="sto-3g").run()
        Q = quadrupole_moment(problem, traceless=False)
        Z = problem.ao_basis.atomic_numbers
        R = problem.ao_basis.coords
        nuc_zz = float(np.einsum("a,a,a->", Z.astype(float),
                                 R[:, 2], R[:, 2]))
        # Q_zz = nuc_zz - <z^2>  =>  <z^2> = nuc_zz - Q_zz
        np.testing.assert_allclose(nuc_zz - Q[2, 2], dEdF, atol=3e-5)

    def test_frozen_core_invariance_and_units(self):
        from esoo_tpu.chem import AU_TO_BUCKINGHAM, quadrupole_moment

        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="sto-3g").run()
        act = problem.active_space()
        np.testing.assert_allclose(quadrupole_moment(act),
                                   quadrupole_moment(problem), atol=1e-11)
        np.testing.assert_allclose(
            quadrupole_moment(problem, unit="buckingham"),
            quadrupole_moment(problem) * AU_TO_BUCKINGHAM)
        with pytest.raises(ValueError):
            quadrupole_moment(problem, unit="esu")


class TestPopulations:
    def test_h2_symmetric_zero_charges(self):
        from esoo_tpu.chem import populations

        problem = MoleculeDriver("H 0 0 0; H 0 0 0.735",
                                 basis="6-31g").run()
        for method in ("mulliken", "lowdin"):
            pop, q = populations(problem, method=method)
            np.testing.assert_allclose(pop, [1.0, 1.0], atol=1e-10)
            np.testing.assert_allclose(q, 0.0, atol=1e-10)

    def test_lih_polarity_and_sum_rules(self):
        # minimal-basis Mulliken charges are famously unphysical
        # (sto-3g LiH comes out neutral); 6-31g restores Li(+) H(-)
        from esoo_tpu.chem import density_ao, populations

        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="6-31g").run()
        P = density_ao(problem)
        S = problem.ao_basis.overlap
        assert np.trace(P @ S) == pytest.approx(4.0, abs=1e-10)
        for method in ("mulliken", "lowdin"):
            pop, q = populations(problem, method=method)
            assert pop.sum() == pytest.approx(4.0, abs=1e-10)
            assert q.sum() == pytest.approx(0.0, abs=1e-10)
            assert q[0] > 0.1 and q[1] < -0.1       # Li(+) H(-)

    def test_h2o_sto3g_literature_anchor(self):
        # the classic RHF/STO-3G H2O Mulliken charges: q_O ~ -0.365
        from esoo_tpu.chem import populations

        problem = MoleculeDriver(
            "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
            basis="sto-3g").run()
        _, q = populations(problem)
        assert q[0] == pytest.approx(-0.3657, abs=5e-3)
        np.testing.assert_allclose(q[1], q[2], atol=1e-10)

    def test_cation_charge_sum(self):
        from esoo_tpu.chem import populations

        problem = MoleculeDriver("He 0 0 0; H 0 0 0.772",
                                 basis="sto-3g", charge=1).run()
        _, q = populations(problem)
        assert q.sum() == pytest.approx(1.0, abs=1e-10)

    def test_frozen_core_invariance(self):
        from esoo_tpu.chem import populations

        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="sto-3g").run()
        act = problem.active_space()
        for method in ("mulliken", "lowdin"):
            np.testing.assert_allclose(
                populations(act, method=method)[1],
                populations(problem, method=method)[1], atol=1e-12)

    def test_casscf_rdm_populations(self):
        from esoo_tpu.chem import populations
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="6-31g").run()
        res = FusedOptOrbCASSCF(num_spin_orbitals=8, problem=problem,
                                maxiter=20).compute_minimum_energy()
        pop, q = populations(problem, gamma_spatial=res.one_rdm_spatial,
                             partial_unitary=res.optimal_partial_unitary)
        assert pop.sum() == pytest.approx(4.0, abs=1e-8)
        # correlation reduces the ionicity vs HF but keeps Li(+) H(-)
        q_hf = populations(problem)[1]
        assert 0.0 < q[0] < q_hf[0] + 0.05

    def test_errors(self):
        from esoo_tpu.chem import populations

        problem = MoleculeDriver("H 0 0 0; H 0 0 0.735",
                                 basis="sto-3g").run()
        with pytest.raises(ValueError, match="mulliken.*lowdin"):
            populations(problem, method="hirshfeld")
        problem.ao_basis = None
        with pytest.raises(ValueError, match="no AO basis"):
            populations(problem)


class TestSpinDensity:
    def test_h2_singlet_zero(self, h2_631g):
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        res = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=h2_631g,
                                maxiter=15).compute_minimum_energy()
        np.testing.assert_allclose(res.spin_density_spatial, 0.0,
                                   atol=1e-8)

    def test_h3_doublet_spin_populations(self):
        from esoo_tpu.chem import populations
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        problem = MoleculeDriver("H 0 0 0; H 0 0 0.95; H 0 0 1.90",
                                 basis="sto-3g", spin=1).run()
        res = FusedOptOrbCASSCF(num_spin_orbitals=6, problem=problem,
                                maxiter=20).compute_minimum_energy()
        sd = res.spin_density_spatial
        assert np.trace(sd) == pytest.approx(1.0, abs=1e-8)  # 2 S_z
        spin_pop, _ = populations(problem, gamma_spatial=sd,
                                  partial_unitary=res.optimal_partial_unitary,
                                  include_core=False)
        assert spin_pop.sum() == pytest.approx(1.0, abs=1e-8)
        # symmetric linear H3 doublet: classic spin polarization —
        # positive on the ends, NEGATIVE on the central atom
        np.testing.assert_allclose(spin_pop[0], spin_pop[2], atol=1e-6)
        assert spin_pop[0] > 0.3
        assert spin_pop[1] < -0.01

    def test_sa_sz0_states_sum_zero(self, h2_631g):
        from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

        res = FusedOptOrbSACASSCF(4, k=3, problem=h2_631g,
                                  maxiter=10).compute_energies()
        assert res.spin_density_spatial.shape == (3, 2, 2)
        # every state in the (1,1) sector has S_z = 0
        traces = np.trace(res.spin_density_spatial, axis1=1, axis2=2)
        np.testing.assert_allclose(traces, 0.0, atol=1e-8)


def _trdm1_oracle(dets, N, u, v):
    """Brute-force <u|a+_p a_s|v> over sorted determinant bitmasks with
    JW phases — independent of every string/sector kernel."""
    g = np.zeros((N, N))
    for p in range(N):
        for s in range(N):
            for idx, d in enumerate(dets):
                if not (d >> s) & 1:
                    continue
                ph = (-1) ** bin(int(d) & ((1 << s) - 1)).count("1")
                d1 = int(d) & ~(1 << s)
                if (d1 >> p) & 1:
                    continue
                ph *= (-1) ** bin(d1 & ((1 << p) - 1)).count("1")
                j = int(np.searchsorted(dets, d1 | (1 << p)))
                if j < len(dets) and dets[j] == d1 | (1 << p):
                    g[p, s] += ph * u[j] * v[idx]
    return g


class TestTransitionRDM1:
    def _sector_and_vecs(self, N, particles, seed=7):
        from esoo_tpu.sim.sector import SectorCI

        sec = SectorCI(N, particles)
        rng = np.random.default_rng(seed)
        u = rng.normal(size=sec.dim)
        v = rng.normal(size=sec.dim)
        u /= np.linalg.norm(u)
        v /= np.linalg.norm(v)
        return sec, u, v

    @pytest.mark.parametrize("particles", [(2, 2), (2, 1)])
    def test_oracle_dense(self, particles):
        sec, u, v = self._sector_and_vecs(8, particles)
        ref = _trdm1_oracle(sec.dets, 8, u, v)
        got = np.asarray(sec.transition_rdm1(
            u.reshape(sec.nB, sec.nA), v.reshape(sec.nB, sec.nA)))
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_oracle_compact(self):
        sec, u, v = self._sector_and_vecs(8, (2, 2), seed=3)
        ref = _trdm1_oracle(sec.dets, 8, u, v)
        tabs = sec.device_tables(storage="compact")
        got = np.asarray(sec.transition_rdm1(
            u.reshape(sec.nB, sec.nA), v.reshape(sec.nB, sec.nA),
            tables=tabs))
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_diagonal_equals_rdm_and_transpose_symmetry(self):
        sec, u, v = self._sector_and_vecs(8, (2, 2), seed=11)
        V = v.reshape(sec.nB, sec.nA)
        U = u.reshape(sec.nB, sec.nA)
        gamma, _ = sec.rdms(V)
        np.testing.assert_allclose(
            np.asarray(sec.transition_rdm1(V, V)), np.asarray(gamma),
            atol=1e-12)
        # real states: gamma_uv = gamma_vu^T
        np.testing.assert_allclose(
            np.asarray(sec.transition_rdm1(U, V)),
            np.asarray(sec.transition_rdm1(V, U)).T, atol=1e-12)

    def test_batched_matches_loop(self):
        sec, u, v = self._sector_and_vecs(6, (2, 1), seed=5)
        stack = np.stack([u, v]).reshape(2, sec.nB, sec.nA)
        batched = np.asarray(sec.transition_rdm1(
            stack, v.reshape(sec.nB, sec.nA)))
        for i, w in enumerate(stack):
            np.testing.assert_allclose(
                batched[i],
                np.asarray(sec.transition_rdm1(
                    w, v.reshape(sec.nB, sec.nA))), atol=1e-13)


class TestPolarizability:
    def _fci_energy(self, p):
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        # full-space exact solve: U is square, so the orbital response
        # to the field is fully absorbed (variational in every d.o.f.)
        return FusedOptOrbCASSCF(
            num_spin_orbitals=2 * p.num_spatial_orbitals, problem=p,
            maxiter=30, stopping_tolerance=1e-11,
            inner_stopping_tolerance=1e-11).compute_minimum_energy()

    def test_h2_alpha_consistency_and_anisotropy(self, h2_631g):
        from esoo_tpu.chem import apply_field, dipole_moment, polarizability

        F = 2e-3
        alpha = polarizability(h2_631g, lambda p: self._fci_energy(
            p).eigenvalue, field=F,
            components=[(0, 0), (2, 2), (0, 2)])
        # 6-31g H carries only s functions: perpendicular polarization
        # is impossible in this basis — alpha_xx vanishes EXACTLY, while
        # the parallel component is finite; xz vanishes by symmetry
        assert alpha[2, 2] > 1.0
        assert abs(alpha[0, 0]) < 1e-6
        assert abs(alpha[0, 2]) < 1e-6
        # Hellmann-Feynman consistency: alpha_zz == d mu_z / dF_z from
        # the RDM dipoles of the field-perturbed solutions
        mus = []
        for sgn in (+1, -1):
            r = self._fci_energy(apply_field(h2_631g, [0, 0, sgn * F]))
            mus.append(dipole_moment(
                h2_631g, gamma_spatial=r.one_rdm_spatial,
                partial_unitary=r.optimal_partial_unitary)[2])
        alpha_zz_mu = (mus[0] - mus[1]) / (2 * F)
        np.testing.assert_allclose(alpha[2, 2], alpha_zz_mu,
                                   rtol=2e-3, atol=2e-3)

    def test_h2_ccpvdz_anisotropy(self):
        # with p functions on H the perpendicular response is real:
        # alpha_zz > alpha_xx > 0 (literature full-CI limit ~6.4 / 4.6)
        from esoo_tpu.chem import polarizability

        p = MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="cc-pvdz").run()
        alpha = polarizability(
            p, lambda q: self._fci_energy(q).eigenvalue,
            components=[(0, 0), (2, 2)])
        assert alpha[2, 2] > alpha[0, 0] > 0.5
        assert alpha[2, 2] < 10.0

    def test_apply_field_requires_dipoles(self, h2_631g):
        import dataclasses

        from esoo_tpu.chem import apply_field

        bare = dataclasses.replace(h2_631g, dipole_mo=None)
        with pytest.raises(ValueError, match="no dipole integrals"):
            apply_field(bare, [0, 0, 1e-3])


class TestEigensolverTransitionRDMs:
    """Transition RDMs on the fused eigensolver family (sector runs)."""

    def _ssvqe_result(self, h2_631g):
        from esoo_tpu.sim import HartreeFock, QuantumCircuit, UCCSD
        from esoo_tpu.orbital_optimization import FusedOptOrbSSVQE

        ansatz = UCCSD(2, (1, 1), reps=2)
        init0 = HartreeFock(2, (1, 1))
        init1 = QuantumCircuit(4)
        init1.x(1)
        init1.x(2)
        solver = FusedOptOrbSSVQE(num_spin_orbitals=4, ansatz=ansatz,
                                  initial_states=[init0, init1],
                                  weight_vector=[2, 1], problem=h2_631g,
                                  maxiter=20)
        return solver, solver.compute_energies()

    def test_ssvqe_trdm_oracle(self, h2_631g):
        import jax.numpy as jnp

        solver, res = self._ssvqe_result(h2_631g)
        t = res.transition_rdm1_spatial
        assert t is not None and t.shape == (2, 2, 2, 2)
        # electron-count traces on the diagonal; real-state symmetry
        for i in range(2):
            assert np.trace(t[i, i]) == pytest.approx(2.0, abs=1e-8)
        np.testing.assert_allclose(t[0, 1], t[1, 0].transpose(1, 0),
                                   atol=1e-10)
        # independent check: rebuild the two optimal sector states and
        # brute-force <0|a+_p a_s|1> over determinant bitmasks
        sec = solver._sector
        theta = jnp.asarray(res.optimal_point)
        states = [np.asarray(sec.apply(solver._sector_init[j], theta))
                  for j in range(2)]
        g_so = _trdm1_oracle(sec.dets, 4, states[0][: sec.dim],
                             states[1][: sec.dim])
        np.testing.assert_allclose(t[0, 1],
                                   g_so[:2, :2] + g_so[2:, 2:], atol=1e-8)

    def test_mcvqe_matches_sa_casscf_oscillator_strength(self, h2_631g):
        # two completely different pipelines to the same exact states
        # (MCVQE contracted CIS basis vs exact SA diagonalization): the
        # X->B oscillator strength must agree
        from esoo_tpu.chem import oscillator_strengths, transition_dipoles
        from esoo_tpu.sim import UCCSD
        from esoo_tpu.orbital_optimization import (FusedOptOrbMCVQE,
                                                   FusedOptOrbSACASSCF)

        mc = FusedOptOrbMCVQE(num_spin_orbitals=4,
                              ansatz=UCCSD(2, (1, 1), reps=2),
                              num_particles=(1, 1), k=2,
                              problem=h2_631g, maxiter=20).compute_energies()
        sa = FusedOptOrbSACASSCF(4, k=2, problem=h2_631g,
                                 maxiter=20).compute_energies()
        np.testing.assert_allclose(mc.eigenvalues, sa.eigenvalues,
                                   atol=1e-4)

        def f01(res):
            mu = transition_dipoles(
                h2_631g, res.transition_rdm1_spatial,
                partial_unitary=res.optimal_partial_unitary)
            return oscillator_strengths(res.eigenvalues, mu)[0, 1]

        assert mc.transition_rdm1_spatial is not None
        # the k=2 excited state is the spin-forbidden Sz=0 triplet:
        # both pipelines must agree it carries NO oscillator strength
        np.testing.assert_allclose(f01(mc), f01(sa), atol=1e-6)
        assert abs(f01(sa)) < 1e-10

    def test_h2_full_selection_rule_pattern(self, h2_631g):
        # the complete 2-orbital H2 spectrum: X(g), triplet(u),
        # B singlet(u), doubly-excited(g) — exactly one transition from
        # X is allowed (X->B); triplet is spin-forbidden, sigma_u^2 is
        # parity-forbidden (g->g)
        from esoo_tpu.chem import oscillator_strengths, transition_dipoles
        from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

        sa = FusedOptOrbSACASSCF(4, k=4, problem=h2_631g,
                                 maxiter=20).compute_energies()
        np.testing.assert_allclose(sa.spin_squared, [0, 2, 0, 0],
                                   atol=1e-6)
        mu = transition_dipoles(h2_631g, sa.transition_rdm1_spatial,
                                partial_unitary=sa.optimal_partial_unitary)
        f = oscillator_strengths(sa.eigenvalues, mu)
        assert f[0, 2] > 0.3                       # X -> B allowed
        assert abs(f[0, 1]) < 1e-10                # spin-forbidden
        assert abs(f[0, 3]) < 1e-10                # parity-forbidden


class TestCASSCFDipole:
    def test_lih_casscf_hellmann_feynman(self):
        # full chain: FusedOptOrbCASSCF 1-RDM + optimal U -> dipole,
        # validated against finite-field CASSCF total energies
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        atom = "Li 0 0 0; H 0 0 1.595"
        problem = MoleculeDriver(atom, basis="sto-3g").run()
        D = problem.dipole_mo

        def solve(field):
            import dataclasses
            p = dataclasses.replace(
                problem, hcore_mo=problem.hcore_mo + field * D[2])
            solver = FusedOptOrbCASSCF(
                num_spin_orbitals=8, problem=p, maxiter=30,
                stopping_tolerance=1e-10,
                inner_stopping_tolerance=1e-10)
            return solver.compute_minimum_energy()

        res = solve(0.0)
        mu = dipole_moment(problem,
                           gamma_spatial=res.one_rdm_spatial,
                           partial_unitary=res.optimal_partial_unitary)
        F = 2e-5
        dEdF = (solve(+F).eigenvalue - solve(-F).eigenvalue) / (2 * F)
        mu_nuc_z = float(problem.nuclear_dipole[2])
        # FD noise floor: 1e-10-converged energies / (2F) ~ a few 1e-6
        np.testing.assert_allclose(mu_nuc_z - mu[2], dEdF, atol=3e-5)
        # correlation shifts the dipole off the HF value but not wildly
        mu_hf = dipole_moment(problem)
        assert abs(mu[2] - mu_hf[2]) < 1.0

    def test_sa_casscf_per_state_dipoles(self):
        # per-state RDMs: ground H2 in a stretched asymmetric cage has
        # zero dipole by symmetry; use LiH so states differ measurably
        from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="sto-3g").run()
        solver = FusedOptOrbSACASSCF(
            num_spin_orbitals=8, k=2, problem=problem, maxiter=8)
        res = solver.compute_energies()
        assert res.one_rdm_spatial.shape == (2, 4, 4)
        mus = [dipole_moment(problem, gamma_spatial=res.one_rdm_spatial[i],
                             partial_unitary=res.optimal_partial_unitary)
               for i in range(2)]
        # traces are the electron count; states have distinct dipoles
        for i in range(2):
            assert np.trace(res.one_rdm_spatial[i]) == pytest.approx(4.0,
                                                                     abs=1e-6)
        assert abs(mus[0][2] - mus[1][2]) > 1e-3

    def test_transition_dipoles_oscillator_strengths(self):
        from esoo_tpu.chem import oscillator_strengths, transition_dipoles
        from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF

        problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595",
                                 basis="sto-3g").run()
        solver = FusedOptOrbSACASSCF(
            num_spin_orbitals=8, k=3, problem=problem, maxiter=10)
        res = solver.compute_energies()
        t = res.transition_rdm1_spatial
        assert t.shape == (3, 3, 4, 4)
        # diagonal slices are the per-state RDMs; real states transpose
        np.testing.assert_allclose(
            t[np.arange(3), np.arange(3)], res.one_rdm_spatial,
            atol=1e-10)
        np.testing.assert_allclose(t[0, 1], t[1, 0].T, atol=1e-10)
        mu = transition_dipoles(
            problem, t, partial_unitary=res.optimal_partial_unitary)
        # diagonal == per-state dipole_moment
        for i in range(3):
            np.testing.assert_allclose(
                mu[i, i],
                dipole_moment(problem, gamma_spatial=res.one_rdm_spatial[i],
                              partial_unitary=res.optimal_partial_unitary),
                atol=1e-10)
        f = oscillator_strengths(res.eigenvalues, mu)
        np.testing.assert_allclose(f, -f.T, atol=1e-12)
        # spin selection rule: state 1 is the Sz=0 triplet component
        # (S^2 = 2) — singlet->triplet is dipole-forbidden EXACTLY;
        # state 2 is the A singlet, strongly allowed (f ~ 0.18)
        assert res.spin_squared[1] == pytest.approx(2.0, abs=1e-6)
        assert res.spin_squared[2] == pytest.approx(0.0, abs=1e-6)
        assert abs(f[0, 1]) < 1e-12
        assert 0.05 < f[0, 2] < 2.0
        # units thread through
        np.testing.assert_allclose(
            transition_dipoles(problem, t,
                               partial_unitary=res.optimal_partial_unitary,
                               unit="debye"),
            mu * AU_TO_DEBYE)


class TestBondOrders:
    def test_h2_rhf_exactly_one(self):
        from esoo_tpu.chem import bond_orders

        p = MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="sto-3g").run()
        B = bond_orders(p)
        assert B[0, 1] == pytest.approx(1.0, abs=1e-10)
        assert B[0, 0] == 0.0

    def test_n2_rhf_exactly_three(self):
        # the anchor that CAUGHT a real SCF bug: the bare-core guess
        # converged N2/STO-3G to a symmetry-broken saddle 0.73 Ha above
        # the literature RHF energy (B came out 2.28); the GWH guess
        # lands the true solution with a clean triple bond
        from esoo_tpu.chem import bond_orders

        p = MoleculeDriver("N 0 0 0; N 0 0 1.0977", basis="sto-3g").run()
        total = p.scf.energy_electronic + p.nuclear_repulsion_energy
        assert total == pytest.approx(-107.495893, abs=1e-4)  # literature
        assert bond_orders(p)[0, 1] == pytest.approx(3.0, abs=1e-8)

    def test_fci_h2_dissociation_kills_the_bond(self):
        from esoo_tpu.chem import bond_orders
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        def b(r):
            p = MoleculeDriver(f"H 0 0 0; H 0 0 {r}",
                               basis="sto-3g").run()
            res = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=p,
                                    maxiter=15).compute_minimum_energy()
            return bond_orders(
                p, gamma_spatial=res.one_rdm_spatial,
                partial_unitary=res.optimal_partial_unitary)[0, 1]

        b_eq, b_far = b(0.735), b(6.0)
        assert 0.9 < b_eq < 1.0     # correlation shaves the RHF 1.0
        assert b_far < 1e-3          # covalent bond fully broken

    def test_open_shell_h3_spin_contribution(self):
        from esoo_tpu.chem import bond_orders
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        p = MoleculeDriver("H 0 0 0; H 0 0 0.95; H 0 0 1.90",
                           basis="sto-3g", spin=1).run()
        r = FusedOptOrbCASSCF(num_spin_orbitals=6, problem=p,
                              maxiter=20).compute_minimum_energy()
        B = bond_orders(p, gamma_spatial=r.one_rdm_spatial,
                        partial_unitary=r.optimal_partial_unitary,
                        spin_density_spatial=r.spin_density_spatial)
        # symmetric 3c-3e chain: two equal half-ish bonds, weak 1-3
        assert B[0, 1] == pytest.approx(B[1, 2], abs=1e-6)
        assert 0.3 < B[0, 1] < 0.7
        assert B[0, 2] < B[0, 1]

    def test_requires_ao_metadata(self, h2_631g):
        import dataclasses

        from esoo_tpu.chem import bond_orders

        bare = dataclasses.replace(h2_631g, ao_basis=None)
        with pytest.raises(ValueError, match="ao_basis"):
            bond_orders(bare)


class TestNaturalOrbitals:
    def test_orthonormal_and_consistent(self, h2_631g):
        from esoo_tpu.chem import natural_orbitals
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        res = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=h2_631g,
                                maxiter=20).compute_minimum_energy()
        occ, C = natural_orbitals(h2_631g, res.one_rdm_spatial,
                                  res.optimal_partial_unitary)
        S = np.asarray(h2_631g.ao_basis.overlap)
        np.testing.assert_allclose(C.T @ S @ C, np.eye(C.shape[1]),
                                   atol=1e-10)
        np.testing.assert_allclose(occ, res.natural_occupations,
                                   atol=1e-10)
        assert occ.sum() == pytest.approx(2.0, abs=1e-10)
        # reconstructing the AO density from the NOs matches density_ao
        from esoo_tpu.chem import density_ao
        P = density_ao(h2_631g, res.one_rdm_spatial,
                       res.optimal_partial_unitary)
        np.testing.assert_allclose((C * occ) @ C.T, P, atol=1e-10)

    def test_shape_mismatch_raises(self, h2_631g):
        from esoo_tpu.chem import natural_orbitals

        with pytest.raises(ValueError, match="window"):
            natural_orbitals(h2_631g, np.eye(3))
