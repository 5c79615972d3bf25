"""Ideal-gas RRHO thermochemistry (chem/thermo.py).

Anchors: exact Sackur–Tetrode for a monatomic, tabulated JANAF/CODATA
standard entropies for H2 and H2O (RRHO with a classical rotor lands
within ~0.5 J/(mol K) of experiment for these), arithmetic identities,
and the integration path from an actual harmonic_frequencies result.
The reference computes no observables beyond the energy
(/root/reference/electronic_structure_algorithms/orbital_optimization/
base_opt_orb_solver.py:534-582 is energy-only).
"""

import numpy as np
import pytest

from esoo_tpu.chem import thermochemistry

_HARTREE_J = 4.3597447222071e-18
_NA = 6.02214076e23
_BAR = 1.0e5


def _h2o_atom():
    r, ang = 0.9572, np.deg2rad(104.52)
    x, z = r * np.sin(ang / 2), r * np.cos(ang / 2)
    return f"O 0 0 0; H {x} 0 {z}; H {-x} 0 {z}"


class TestLiteratureAnchors:
    def test_helium_sackur_tetrode(self):
        # CODATA S°(He, 298.15 K, 1 bar) = 126.153 J/(mol K); the
        # monatomic ideal gas is EXACTLY Sackur-Tetrode
        t = thermochemistry("He 0 0 0", pressure=_BAR)
        assert t["entropy_J_mol_K"] == pytest.approx(126.153, abs=0.01)
        assert t["entropy_rot"] == 0.0
        assert t["entropy_vib"] == 0.0
        assert t["zpe"] == 0.0
        # monatomic thermal energy is purely translational 3/2 RT
        assert t["thermal_energy"] == pytest.approx(
            1.5 * 8.314462618 * 298.15 / (_HARTREE_J * _NA), rel=1e-9)

    def test_h2_standard_entropy(self):
        # JANAF S°(H2, 298.15 K, 1 bar) = 130.68; classical-rotor RRHO
        # sits ~0.4 low (Theta_rot = 87.5 K is not quite high-T)
        t = thermochemistry("H 0 0 0; H 0 0 0.7414",
                            frequencies_cm1=[4401.21],
                            symmetry_number=2, pressure=_BAR)
        assert t["entropy_J_mol_K"] == pytest.approx(130.68, abs=0.7)
        # vibration is frozen out at 298 K
        assert t["entropy_vib"] * _HARTREE_J * _NA < 1e-6

    def test_h2o_standard_entropy(self):
        # JANAF S°(H2O, 298.15 K, 1 bar) = 188.84 with experimental
        # geometry + fundamentals, sigma(C2v) = 2
        t = thermochemistry(_h2o_atom(),
                            frequencies_cm1=[1594.7, 3657.1, 3755.9],
                            symmetry_number=2, pressure=_BAR)
        assert t["entropy_J_mol_K"] == pytest.approx(188.84, abs=0.5)

    def test_h2_zpe_arithmetic(self):
        # ZPE = sum hc*nu/2, computed independently here
        nus = [4401.21]
        t = thermochemistry("H 0 0 0; H 0 0 0.7414", frequencies_cm1=nus,
                            symmetry_number=2)
        zpe = 0.5 * 6.62607015e-34 * 2.99792458e10 * sum(nus) / _HARTREE_J
        assert t["zpe"] == pytest.approx(zpe, rel=1e-12)


class TestIdentities:
    def test_gibbs_and_enthalpy_identities(self):
        t = thermochemistry(_h2o_atom(),
                            frequencies_cm1=[1594.7, 3657.1, 3755.9],
                            symmetry_number=2)
        kT = 8.314462618 * 298.15 / (_HARTREE_J * _NA)
        assert t["enthalpy_correction"] == pytest.approx(
            t["thermal_energy"] + kT, rel=1e-9)
        assert t["gibbs_correction"] == pytest.approx(
            t["enthalpy_correction"] - 298.15 * t["entropy_total"],
            rel=1e-9)
        assert t["entropy_total"] == pytest.approx(
            t["entropy_trans"] + t["entropy_rot"] + t["entropy_vib"]
            + t["entropy_elec"], rel=1e-12)

    def test_pressure_shift_is_r_ln_p(self):
        # S(P1) - S(P2) = R ln(P2/P1), translations only
        a = thermochemistry("He 0 0 0", pressure=_BAR)
        b = thermochemistry("He 0 0 0", pressure=101325.0)
        assert (a["entropy_J_mol_K"] - b["entropy_J_mol_K"]
                ) == pytest.approx(8.314462618 * np.log(101325.0 / _BAR),
                                   rel=1e-9)

    def test_multiplicity_adds_r_ln_g(self):
        a = thermochemistry("He 0 0 0", multiplicity=1)
        b = thermochemistry("He 0 0 0", multiplicity=3)
        assert (b["entropy_elec"] - a["entropy_elec"]) * _HARTREE_J * \
            _NA == pytest.approx(8.314462618 * np.log(3.0), rel=1e-9)

    def test_absolute_thermo_offsets(self):
        e0 = -76.0
        t = thermochemistry(_h2o_atom(),
                            frequencies_cm1=[1594.7, 3657.1, 3755.9],
                            symmetry_number=2, electronic_energy=e0)
        assert t["enthalpy"] == pytest.approx(
            e0 + t["enthalpy_correction"], rel=1e-12)
        assert t["gibbs_free_energy"] == pytest.approx(
            e0 + t["gibbs_correction"], rel=1e-12)
        assert t["internal_energy"] == pytest.approx(
            e0 + t["thermal_energy"], rel=1e-12)


class TestHarmonicIntegration:
    def test_h2_from_harmonic_frequencies(self):
        # end-to-end: FCI/STO-3G H2 frequency job feeds thermochemistry
        from esoo_tpu.chem import casscf_energy_fn, harmonic_frequencies

        fn = casscf_energy_fn(basis="sto-3g")
        atom = "H 0 0 0; H 0 0 0.735"
        fr = harmonic_frequencies(atom, fn)
        t = thermochemistry(atom, fr, symmetry_number=2,
                            electronic_energy=fn(atom))
        assert t["n_imaginary"] == 0
        # one vibration; ZPE = hc*nu/2 of the single positive mode
        nu = float(fr["frequencies_cm1"][fr["vib_mask"]].max())
        zpe = 0.5 * 6.62607015e-34 * 2.99792458e10 * nu / _HARTREE_J
        assert t["zpe"] == pytest.approx(zpe, rel=1e-10)
        # sanity: G < H at positive T, entropy in the gas-phase ballpark
        assert t["gibbs_free_energy"] < t["enthalpy"]
        assert 100.0 < t["entropy_J_mol_K"] < 160.0

    def test_imaginary_modes_counted_and_excluded(self):
        fr = {"frequencies_cm1": np.array([-500.0, 0.0, 1000.0]),
              "vib_mask": np.array([True, False, True])}
        t = thermochemistry("H 0 0 0; H 0 0 0.74", fr, symmetry_number=2)
        assert t["n_imaginary"] == 1
        zpe = 0.5 * 6.62607015e-34 * 2.99792458e10 * 1000.0 / _HARTREE_J
        assert t["zpe"] == pytest.approx(zpe, rel=1e-12)


class TestErrors:
    def test_negative_temperature(self):
        with pytest.raises(ValueError, match="temperature"):
            thermochemistry("He 0 0 0", temperature=-1.0)

    def test_missing_frequencies_polyatomic(self):
        with pytest.raises(ValueError, match="freq_result"):
            thermochemistry("H 0 0 0; H 0 0 0.74")

    def test_nonpositive_explicit_frequency(self):
        with pytest.raises(ValueError, match="positive"):
            thermochemistry("H 0 0 0; H 0 0 0.74",
                            frequencies_cm1=[-100.0])
