"""Ghost atoms + counterpoise BSSE correction.

Anchors: strict variational lowering of a monomer in the dimer basis
(more functions can only help), exact bookkeeping (no ghost electrons,
no ghost nuclear repulsion), and the Boys-Bernardi identity that the
raw monomer-basis interaction is always over-attractive (BSSE <= 0).
The reference has no ghost/counterpoise capability (fixed PySCF
problem)."""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver, counterpoise_interaction


class TestGhostAtoms:
    def test_bookkeeping(self):
        p = MoleculeDriver("He 0 0 0; @He 0 0 3.0",
                           basis="cc-pvdz").run()
        assert p.num_particles == (1, 1)
        assert p.nuclear_repulsion_energy == 0.0
        # basis functions of BOTH centers are present
        solo = MoleculeDriver("He 0 0 0", basis="cc-pvdz").run()
        assert (p.ao_basis.overlap.shape[0]
                == 2 * solo.ao_basis.overlap.shape[0])
        assert p.ao_basis.atomic_numbers[1] == 0

    def test_ghost_prefix_variants(self):
        a = MoleculeDriver("He 0 0 0; @He 0 0 3.0",
                           basis="sto-3g").run()
        b = MoleculeDriver("He 0 0 0; ghost:He 0 0 3.0",
                           basis="sto-3g").run()
        assert a.scf.energy_electronic == pytest.approx(
            b.scf.energy_electronic, abs=1e-12)

    def test_variational_lowering(self):
        # the dimer basis can only LOWER the monomer energy
        solo = MoleculeDriver("He 0 0 0", basis="cc-pvdz").run()
        ghost = MoleculeDriver("He 0 0 0; @He 0 0 3.0",
                               basis="cc-pvdz").run()
        assert ghost.scf.energy_electronic < solo.scf.energy_electronic
        # electron count conserved
        S = np.asarray(ghost.ao_basis.overlap)
        from esoo_tpu.chem import density_ao
        assert np.trace(density_ao(ghost) @ S) == pytest.approx(
            2.0, abs=1e-10)


class TestCounterpoise:
    def test_he2_bsse_sign_and_magnitude(self):
        def hf(atom):
            p = MoleculeDriver(atom, basis="cc-pvdz").run()
            return p.scf.energy_electronic + p.nuclear_repulsion_energy

        r = counterpoise_interaction("He 0 0 0", "He 0 0 3.0", hf)
        # raw is ALWAYS over-attractive: BSSE strictly negative
        assert r["bsse"] < -1e-6
        # CP-corrected HF He2 at 3 A is purely repulsive (no dispersion
        # at HF), raw can fake attraction
        assert r["e_int_cp"] > 0.0
        assert r["e_int_raw"] < r["e_int_cp"]

    def test_far_separation_vanishes(self):
        def hf(atom):
            p = MoleculeDriver(atom, basis="sto-3g").run()
            return p.scf.energy_electronic + p.nuclear_repulsion_energy

        r = counterpoise_interaction("He 0 0 0", "He 0 0 12.0", hf)
        assert abs(r["e_int_cp"]) < 1e-8
        assert abs(r["bsse"]) < 1e-8

    @pytest.mark.slow   # ~22 s chemistry showcase; the CP machinery
    # (ghosts, BSSE sign, variational lowering) is pinned fast above
    def test_fci_dispersion_survives_cp(self):
        # correlated He2: the CP-corrected FCI curve keeps genuine
        # dispersion attraction at mid-range where HF is repulsive
        from esoo_tpu.chem import casscf_energy_fn

        e = casscf_energy_fn(basis="cc-pvdz")
        r = counterpoise_interaction("He 0 0 0", "He 0 0 3.0", e)
        assert r["bsse"] < 0.0
        # correlation makes the CP interaction LESS repulsive than HF's
        def hf(atom):
            p = MoleculeDriver(atom, basis="cc-pvdz").run()
            return p.scf.energy_electronic + p.nuclear_repulsion_energy
        rhf = counterpoise_interaction("He 0 0 0", "He 0 0 3.0", hf)
        assert r["e_int_cp"] < rhf["e_int_cp"]
