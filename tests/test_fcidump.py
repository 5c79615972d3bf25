"""FCIDUMP interop (chem/fcidump.py): round-trip exactness, solver
equivalence through the file, 8-fold symmetry reconstruction, Fortran
D-exponents, and header error paths.  Ecosystem role: the reference
gets integrals only through PySCF (base_opt_orb_solver.py:87-91); the
FCIDUMP bridge makes the native stack interoperable with every package
that speaks the Knowles-Handy format."""

import os

import numpy as np
import pytest

from esoo_tpu.chem import (MoleculeDriver, read_fcidump, write_fcidump)


@pytest.fixture(scope="module")
def h2_631g():
    return MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="6-31g").run()


class TestRoundTrip:
    def test_integrals_exact(self, h2_631g, tmp_path):
        f = str(tmp_path / "h2.fcidump")
        write_fcidump(h2_631g, f)
        p = read_fcidump(f)
        assert p.num_particles == (1, 1)
        assert p.num_spatial_orbitals == 4
        np.testing.assert_allclose(p.hcore_mo, h2_631g.hcore_mo,
                                   atol=1e-14)
        np.testing.assert_allclose(p.eri_mo, h2_631g.eri_mo, atol=1e-14)
        assert p.nuclear_repulsion_energy == pytest.approx(
            h2_631g.nuclear_repulsion_energy, abs=1e-14)

    def test_eightfold_symmetry_is_canonical(self, h2_631g, tmp_path):
        # the writer emits ONLY canonical index quadruples; the reader
        # must rebuild all 8 permutations
        f = str(tmp_path / "h2.fcidump")
        write_fcidump(h2_631g, f)
        two_body_lines = [
            ln for ln in open(f).read().splitlines()
            if len(ln.split()) == 5 and ln.split()[3] != "0"
            and not ln.lstrip().startswith("&")]
        seen = set()
        for ln in two_body_lines:
            i, j, k, l = (int(x) for x in ln.split()[1:5])
            assert i >= j and k >= l
            assert i * (i + 1) // 2 + j >= k * (k + 1) // 2 + l
            assert (i, j, k, l) not in seen
            seen.add((i, j, k, l))

    def test_open_shell_ms2(self, tmp_path):
        p0 = MoleculeDriver("H 0 0 0; H 0 0 0.95; H 0 0 1.90",
                            basis="sto-3g", spin=1).run()
        f = str(tmp_path / "h3.fcidump")
        write_fcidump(p0, f)
        assert "MS2=1" in open(f).readline()
        p = read_fcidump(f)
        assert p.num_particles == (2, 1)

    def test_active_space_core_energy_in_constant(self, tmp_path):
        full = MoleculeDriver("Li 0 0 0; H 0 0 1.60",
                              basis="sto-3g").run()
        act = full.active_space(n_frozen=1)
        f = str(tmp_path / "lih_cas.fcidump")
        write_fcidump(act, f)
        p = read_fcidump(f)
        assert p.nuclear_repulsion_energy == pytest.approx(
            act.nuclear_repulsion_energy + act.core_energy, abs=1e-13)
        assert p.num_particles == (1, 1)
        assert p.num_spatial_orbitals == act.num_spatial_orbitals


class TestSolveThroughFile:
    def test_casscf_energy_identical(self, h2_631g, tmp_path):
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        f = str(tmp_path / "h2.fcidump")
        write_fcidump(h2_631g, f)
        p = read_fcidump(f)
        r_mem = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=h2_631g,
                                  maxiter=15).compute_minimum_energy()
        r_file = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=p,
                                   maxiter=15).compute_minimum_energy()
        assert r_file.eigenvalue == pytest.approx(r_mem.eigenvalue,
                                                  abs=1e-10)


class TestForeignFormats:
    def test_fortran_d_exponent_and_slash_terminator(self, tmp_path):
        # Molpro writes D-exponents and some codes end the namelist
        # with a bare '/'
        f = tmp_path / "foreign.fcidump"
        f.write_text(
            "&FCI NORB=1,NELEC=2,MS2=0,\n"
            " /\n"
            " 6.0D-01 1 1 1 1\n"
            "-1.25D+00 1 1 0 0\n"
            " 7.1D-01 0 0 0 0\n")
        p = read_fcidump(str(f))
        assert p.eri_mo[0, 0, 0, 0] == pytest.approx(0.6)
        assert p.hcore_mo[0, 0] == pytest.approx(-1.25)
        assert p.nuclear_repulsion_energy == pytest.approx(0.71)

    def test_missing_norb_raises(self, tmp_path):
        f = tmp_path / "bad.fcidump"
        f.write_text("&FCI NELEC=2,MS2=0 &END\n 1.0 0 0 0 0\n")
        with pytest.raises(ValueError, match="NORB"):
            read_fcidump(str(f))

    def test_missing_terminator_raises(self, tmp_path):
        f = tmp_path / "bad2.fcidump"
        f.write_text("&FCI NORB=1,NELEC=2,MS2=0\n")
        with pytest.raises(ValueError, match="END"):
            read_fcidump(str(f))

    def test_inconsistent_nelec_ms2(self, tmp_path):
        f = tmp_path / "bad3.fcidump"
        f.write_text("&FCI NORB=1,NELEC=2,MS2=1 &END\n 1.0 0 0 0 0\n")
        with pytest.raises(ValueError, match="inconsistent"):
            read_fcidump(str(f))

    def test_orbital_energy_records_ignored(self, tmp_path):
        # Molpro writes orbital energies as 'eps_i  i 0 0 0' before the
        # core line; they are NOT Hamiltonian elements (this silently
        # corrupted hcore's last row/column before the fix)
        f = tmp_path / "molpro.fcidump"
        f.write_text(
            "&FCI NORB=2,NELEC=2,MS2=0, ISYM=1 /\n"
            " 5.0E-01 1 1 1 1\n"
            "-1.2528E+00 1 1 0 0\n"
            "-4.759E-01 2 2 0 0\n"
            "-5.782E-01 1 0 0 0\n"   # orbital energy eps_1
            " 6.702E-01 2 0 0 0\n"   # orbital energy eps_2
            " 7.1E-01 0 0 0 0\n")
        p = read_fcidump(str(f))
        np.testing.assert_allclose(
            p.hcore_mo, np.diag([-1.2528, -0.4759]), atol=1e-12)
        assert p.nuclear_repulsion_energy == pytest.approx(0.71)

    def test_inline_slash_terminator(self, tmp_path):
        # Fortran allows the terminating '/' after the last field
        f = tmp_path / "inline.fcidump"
        f.write_text(
            "&FCI NORB=1,NELEC=2,MS2=0, ISYM=1 /\n"
            " 6.0E-01 1 1 1 1\n"
            "-1.25E+00 1 1 0 0\n"
            " 7.1E-01 0 0 0 0\n")
        p = read_fcidump(str(f))
        assert p.hcore_mo[0, 0] == pytest.approx(-1.25)


class TestEffectiveCoreWorkflow:
    """The documented ECP ingestion workflow (docs/CHEMISTRY.md,
    VERDICT r4 item 8): a checked-in FCIDUMP whose Hamiltonian carries
    an effective core — valence-only NORB, the core folded into the
    one-body operator and the scalar constant, exactly the structure
    PySCF's `tools.fcidump.from_scf` emits for an ECP calculation —
    ingested via read_fcidump and solved end to end with OptOrbVQE.

    The fixture was generated by this repo's own frozen-core transform
    (H2S STO-3G, S 1s2s2p folded; PySCF is not available in the build
    image, so a literally-PySCF-ECP-generated file cannot be produced
    here — the file format and ingestion path are identical)."""

    FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "h2s_effective_core.fcidump")

    def test_fixture_structure_is_valence_only(self):
        p = read_fcidump(self.FIXTURE)
        assert p.num_spatial_orbitals == 6          # valence window only
        assert p.num_particles == (4, 4)
        # the constant carries the (large, negative) core energy, the
        # unambiguous signature of an effective-core dump
        assert p.nuclear_repulsion_energy < -300.0

    def test_optorbvqe_on_effective_core_dump(self):
        import numpy as np
        from esoo_tpu.orbital_optimization import (
            OptOrbVQE, PartialUnitaryProjectionOptimizer)
        from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
        from esoo_tpu.solvers import VQE, L_BFGS_B

        p = read_fcidump(self.FIXTURE)
        ans = UCCSD(5, p.num_particles,
                    initial_state=HartreeFock(5, p.num_particles))
        vqe = VQE(Estimator(), ans, L_BFGS_B(maxiter=300),
                  initial_point=np.zeros(ans.num_parameters))
        sol = OptOrbVQE(
            num_spin_orbitals=10, ground_state_solver=vqe,
            partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
                1e-3, 1e-5, 10000),
            problem=p, maxiter=10, stopping_tolerance=1e-5)
        r = sol.compute_minimum_energy()
        # measured 2026-08-19 (class and fused paths agree to 1e-10);
        # total = active energy + the dump's constant; 14 mHa of valence
        # correlation below the H2S RHF total -394.3116
        np.testing.assert_allclose(
            r.eigenvalue + p.nuclear_repulsion_energy,
            -394.32585014, atol=2e-5)
