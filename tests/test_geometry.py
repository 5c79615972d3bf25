"""Nuclear gradients + geometry optimization (chem/geometry.py).

Validation without external reference data: translational invariance of
the FD gradient (exact identity for any isolated molecule), round-trip
of the geometry-string assembly, and local-minimum certificates on the
optimized geometries (zero gradient AND energy rises on displacement in
both directions).  Reference anchor: the reference has no geometry
capability (fixed PySCF problem, base_opt_orb_solver.py:87-91)."""

import numpy as np
import pytest

from esoo_tpu.chem import (casscf_energy_fn, geometry_string,
                           nuclear_gradient, optimize_geometry)
from esoo_tpu.chem.basis import parse_geometry


class TestGradient:
    def test_geometry_string_round_trip(self):
        atom = "Li 0 0 0; H 0.1 -0.2 1.595"
        symbols, coords = parse_geometry(atom)
        s2, c2 = parse_geometry(geometry_string(symbols, coords))
        assert s2 == symbols
        np.testing.assert_allclose(c2, coords, atol=1e-10)

    def test_translational_invariance_and_direction(self):
        energy = casscf_energy_fn(basis="sto-3g")
        # stretched H2: the gradient must pull the atoms together
        g = nuclear_gradient("H 0 0 0; H 0 0 0.90", energy)
        np.testing.assert_allclose(g.sum(axis=0), 0.0, atol=1e-7)
        np.testing.assert_allclose(g[0], -g[1], atol=1e-7)
        assert g[1, 2] > 1e-3          # dE/dz2 > 0: bond too long
        g2 = nuclear_gradient("H 0 0 0; H 0 0 0.60", energy)
        assert g2[1, 2] < -1e-3        # bond too short


class TestFrequencies:
    def test_h2_against_independent_1d_reduced_mass(self):
        from esoo_tpu.chem import harmonic_frequencies
        from esoo_tpu.chem.geometry import (_AMU_TO_ME, _HARTREE_TO_CM1,
                                            ISOTOPE_MASSES,
                                            optimize_geometry)

        energy = casscf_energy_fn(basis="sto-3g")
        opt = optimize_geometry("H 0 0 0; H 0 0 0.75", energy, gtol=1e-5)
        res = harmonic_frequencies(opt["atom"], energy)
        f = res["frequencies_cm1"]
        assert res["n_vibrations"] == 1          # linear diatomic: 3N-5
        # five projected trans/rot near-zeros, one real stretch
        assert np.abs(f[:-1]).max() < 50.0
        nu = f[-1]
        # independent 1-D check: k = d2E/dr2 along the bond, reduced
        # mass mu -> nu = sqrt(k/mu).  Exercises none of the 3N-Hessian
        # mass-weighting/projection machinery.
        symbols, coords = parse_geometry(opt["atom"])
        h = 5e-3
        r0 = coords[1, 2] - coords[0, 2]

        def e_at(r):
            c = coords.copy()
            c[1, 2] = c[0, 2] + r
            return energy(geometry_string(symbols, c))

        k = (e_at(r0 + h) - 2 * e_at(r0) + e_at(r0 - h)) / h ** 2
        mu = ISOTOPE_MASSES["H"] * _AMU_TO_ME / 2.0
        nu_1d = np.sqrt(k / mu) * _HARTREE_TO_CM1
        np.testing.assert_allclose(nu, nu_1d, rtol=1e-3)
        # FCI/STO-3G H2 harmonic stretch is a few thousand cm^-1
        assert 3500.0 < nu < 6500.0

    def test_imaginary_mode_sign_convention(self):
        from esoo_tpu.chem import harmonic_frequencies

        # stretched H2 far past equilibrium: the stretch curvature is
        # NEGATIVE (approaching dissociation) -> imaginary mode reported
        # as a negative wavenumber
        energy = casscf_energy_fn(basis="sto-3g")
        res = harmonic_frequencies("H 0 0 0; H 0 0 1.8", energy)
        assert res["frequencies_cm1"][0] < -100.0


class TestIRIntensities:
    def test_h2_exactly_dark(self):
        # homonuclear diatomic: no dipole anywhere on the surface ->
        # every mode (incl. the real stretch) has EXACTLY zero intensity
        from esoo_tpu.chem import (casscf_dipole_fn, harmonic_frequencies,
                                   ir_intensities)

        energy = casscf_energy_fn(basis="sto-3g")
        dip = casscf_dipole_fn(basis="sto-3g")
        atom = "H 0 0 0; H 0 0 0.735"
        vib = harmonic_frequencies(atom, energy)
        inten = ir_intensities(atom, dip, vib)
        np.testing.assert_allclose(inten, 0.0, atol=1e-8)

    @pytest.mark.slow
    def test_h2o_bend_is_bright(self):
        from esoo_tpu.chem import (casscf_dipole_fn, harmonic_frequencies,
                                   ir_intensities, optimize_geometry)

        energy = casscf_energy_fn(basis="sto-3g")
        dip = casscf_dipole_fn(basis="sto-3g")
        opt = optimize_geometry(
            "O 0 0 0.12; H 0 0.76 -0.47; H 0 -0.76 -0.47", energy)
        vib = harmonic_frequencies(opt["atom"], energy)
        inten = ir_intensities(opt["atom"], dip, vib)
        # trans/rot modes carry no intensity; all three vibrations of
        # water are IR-active, the bend prominently so
        assert inten[:-3].max() < 1e-4
        assert (inten[-3:] > 0.1).all()
        assert inten[-3] > 1.0          # bend (lowest real mode)


class TestOptimize:
    def test_h2_fci_equilibrium(self):
        energy = casscf_energy_fn(basis="sto-3g")
        res = optimize_geometry("H 0 0 0; H 0 0 0.90", energy)
        assert res["converged"]
        r = np.linalg.norm(res["coords"][1] - res["coords"][0])
        # FCI/STO-3G H2 equilibrium is ~0.735 A = 1.389 bohr
        assert 1.30 < r < 1.45
        assert np.abs(res["gradient"]).max() < 3e-4
        # independent local-minimum certificate: energy rises both ways
        symbols, coords = parse_geometry(res["atom"])
        for d in (+0.02, -0.02):
            c = coords.copy()
            c[1, 2] += d
            assert energy(geometry_string(symbols, c)) > res["energy"]

    @pytest.mark.slow   # ~52 s; the optimize path is anchored fast by
    # test_h2_fci_equilibrium, live callbacks by
    # TestTransitionState::test_callback_triple_is_consistent
    def test_lih_active_space_and_callback(self):
        # frozen-core CAS in a reduced window, with the live callback
        energy = casscf_energy_fn(basis="sto-3g", num_spin_orbitals=8)
        seen = []
        res = optimize_geometry(
            "Li 0 0 0; H 0 0 1.8", energy, gtol=5e-4,
            callback=lambda a, e, g: seen.append((a, e)))
        assert res["converged"]
        r = np.linalg.norm(res["coords"][1] - res["coords"][0])
        # LiH equilibrium ~1.5-1.6 A = 2.8-3.1 bohr
        assert 2.6 < r < 3.3
        assert len(seen) == res["n_iterations"]
        assert seen[-1][1] == pytest.approx(res["energy"], abs=1e-8)


class TestExcitedStateSurfaces:
    """casscf_state_energy_fn: SA-CASSCF excited-state potential energy
    surfaces driving the same FD gradient / optimizer machinery."""

    def test_state0_k1_reduces_to_ground_fn(self):
        from esoo_tpu.chem import casscf_state_energy_fn

        atom = "Li 0 0 0; H 0 0 1.60"
        e_ground = casscf_energy_fn("sto-3g")(atom)
        e_sa = casscf_state_energy_fn("sto-3g", state=0, k=1)(atom)
        assert e_sa == pytest.approx(e_ground, abs=1e-10)

    @pytest.mark.slow   # ~45 s; casscf_state_energy_fn anchored fast by
    # test_state0_k1_reduces_to_ground_fn; the excited-surface physics by
    # test_lih_adiabatic_below_vertical (slow tier)
    def test_s1_force_points_outward_at_s0_geometry(self):
        from esoo_tpu.chem import casscf_state_energy_fn

        # LiH near the S0 equilibrium: the A-state surface still slopes
        # DOWN with increasing bond length (its minimum is much longer),
        # so dE1/dz on the outer H is negative — and two direct solves
        # confirm the excursion
        e1 = casscf_state_energy_fn("sto-3g", state=1, k=2)
        atom = "Li 0 0 0; H 0 0 1.55"
        g = nuclear_gradient(atom, e1)
        assert g[1, 2] < -1e-3
        assert g[0, 2] > 1e-3          # equal and opposite on Li
        assert e1("Li 0 0 0; H 0 0 2.5") < e1(atom)

    def test_state_out_of_range(self):
        from esoo_tpu.chem import casscf_state_energy_fn

        with pytest.raises(ValueError, match="state"):
            casscf_state_energy_fn("sto-3g", state=2, k=2)

    @pytest.mark.slow
    def test_lih_adiabatic_below_vertical(self):
        from esoo_tpu.chem import casscf_state_energy_fn

        e0 = casscf_energy_fn("sto-3g")
        e1 = casscf_state_energy_fn("sto-3g", state=1, k=2)
        r0 = optimize_geometry("Li 0 0 0; H 0 0 1.60", e0, maxiter=20)
        assert r0["converged"]
        vertical = e1(r0["atom"]) - r0["energy"]
        r1 = optimize_geometry(r0["atom"], e1, maxiter=25)
        adiabatic = r1["energy"] - r0["energy"]
        assert 0.0 < adiabatic < vertical
        # the relaxed A-state bond is much longer than X-state's
        _, c0 = parse_geometry(r0["atom"])
        _, c1 = parse_geometry(r1["atom"])
        assert (np.linalg.norm(c1[1] - c1[0])
                > 1.3 * np.linalg.norm(c0[1] - c0[0]))


class TestRamanActivities:
    def test_h2_raman_active_depol_third(self):
        # mutual exclusion in a centrosymmetric molecule: the H2 stretch
        # is IR-dark (TestIRIntensities) but Raman-ACTIVE.  STO-3G is
        # s-only, so the derivative tensor is pure alpha'_zz, for which
        # rho = 3*g2/(45*a2+4*g2) = 3/(5+4) = 1/3 EXACTLY
        from esoo_tpu.chem import (casscf_polarizability_fn,
                                   harmonic_frequencies,
                                   raman_activities)

        atom = "H 0 0 0; H 0 0 0.735"
        fr = harmonic_frequencies(atom, casscf_energy_fn("sto-3g"))
        acts, depol = raman_activities(
            atom, casscf_polarizability_fn("sto-3g"), fr)
        vib = fr["vib_mask"]
        assert acts[vib][-1] > 1.0
        assert depol[vib][-1] == pytest.approx(1.0 / 3.0, abs=1e-6)
        # trans/rot rows are exact zeros with NaN depolarization
        np.testing.assert_array_equal(acts[~vib], 0.0)
        assert np.all(np.isnan(depol[~vib]))

    def test_invariants_against_analytic_linear_alpha(self):
        # fake alpha(R) = diag(b*r, 0, 0) with r the H-H distance: the
        # activity/units chain is then fully analytic
        from esoo_tpu.chem import raman_activities
        from esoo_tpu.chem.basis import ANGSTROM_TO_BOHR
        from esoo_tpu.chem.geometry import ISOTOPE_MASSES

        b = 0.7

        def alpha_fn(atom):
            _, c = parse_geometry(atom)
            r = np.linalg.norm(c[1] - c[0])
            return np.diag([b * r, 0.0, 0.0])

        m = ISOTOPE_MASSES["H"]
        v = np.array([0, 0, -1, 0, 0, 1]) / np.sqrt(2.0)
        fr = {"modes": v.reshape(1, 2, 3),
              "vib_mask": np.array([True]),
              "frequencies_cm1": np.array([4000.0])}
        acts, depol = raman_activities("H 0 0 0; H 0 0 0.75",
                                       alpha_fn, fr)
        # dr/dQ = sqrt(2/m); alpha'_xx in A^2/amu^(1/2) adds the
        # bohr->Angstrom^2 volume-per-displacement factor
        apx = b * np.sqrt(2.0 / m) * (1.0 / ANGSTROM_TO_BOHR) ** 2
        expected = 45.0 * (apx / 3.0) ** 2 + 7.0 * apx ** 2
        assert acts[0] == pytest.approx(expected, rel=1e-7)
        # single-diagonal-component derivative: rho = 1/3 again
        assert depol[0] == pytest.approx(1.0 / 3.0, abs=1e-9)

    def test_isotropic_derivative_fully_polarized(self):
        # alpha' proportional to the identity => gamma'^2 = 0 => rho = 0
        from esoo_tpu.chem import raman_activities

        def alpha_fn(atom):
            _, c = parse_geometry(atom)
            r = np.linalg.norm(c[1] - c[0])
            return np.eye(3) * r

        v = np.array([0, 0, -1, 0, 0, 1]) / np.sqrt(2.0)
        fr = {"modes": v.reshape(1, 2, 3), "vib_mask": np.array([True]),
              "frequencies_cm1": np.array([4000.0])}
        acts, depol = raman_activities("H 0 0 0; H 0 0 0.75",
                                       alpha_fn, fr)
        assert acts[0] > 0.0
        assert depol[0] == pytest.approx(0.0, abs=1e-12)


@pytest.fixture(scope="module")
def h3_saddle():
    """The H+H2 exchange TS, searched once for the whole module (its
    'frequencies' dict makes a second Hessian pass unnecessary)."""
    from esoo_tpu.chem import optimize_transition_state

    e = casscf_energy_fn(basis="sto-3g", spin=1)
    return e, optimize_transition_state(
        "H 0 0 0; H 0 0 0.90; H 0 0 1.85", e)


class TestTransitionState:
    def test_h_plus_h2_exchange_saddle(self, h3_saddle):
        # the classic H + H2 exchange TS: symmetric linear H3, exactly
        # one imaginary mode (the antisymmetric stretch), barrier above
        # the H2 + H asymptote
        e, ts = h3_saddle
        assert ts["converged"]
        assert ts["n_negative"] == 1
        c = ts["coords"]
        r1 = np.linalg.norm(c[1] - c[0])
        r2 = np.linalg.norm(c[2] - c[1])
        np.testing.assert_allclose(r1, r2, atol=1e-3)   # symmetric
        assert 0.90 < r1 / 1.8897259886 < 0.96          # ~0.937 A

        # barrier vs the H2 + H asymptote (both fully optimized/free)
        e2 = casscf_energy_fn(basis="sto-3g")
        r0 = optimize_geometry("H 0 0 0; H 0 0 0.735", e2)
        eh = e("H 0 0 0")
        barrier = ts["energy"] - (r0["energy"] + eh)
        assert 0.02 < barrier < 0.05    # 20.6 kcal/mol at FCI/STO-3G

        # the frequency analysis ships WITH the result (fresh final-
        # geometry Hessian — no second pass)
        fr = ts["frequencies"]
        vib = fr["frequencies_cm1"][fr["vib_mask"]]
        assert int(np.sum(vib < -50)) == 1
        # the degenerate bend pair of a linear symmetric TS
        pos = np.sort(vib[vib > 50])
        np.testing.assert_allclose(pos[0], pos[1], rtol=1e-4)

    def test_callback_triple_is_consistent(self, h3_saddle):
        # callback(atom, energy, gradient) must all refer to the SAME
        # geometry: re-evaluating at the reported atom reproduces both
        from esoo_tpu.chem import optimize_transition_state

        e, ts = h3_saddle
        seen = []
        optimize_transition_state(ts["atom"], e, maxiter=1,
                                  callback=lambda a, en, g:
                                  seen.append((a, en, g.copy())))
        a, en, g = seen[0]
        assert en == pytest.approx(float(e(a)), abs=1e-12)
        np.testing.assert_allclose(
            g, nuclear_gradient(a, e), atol=1e-10)

    def test_eyring_rate_analytic(self):
        from esoo_tpu.chem import eyring_rate

        # independent arithmetic: 20 kcal/mol at 298.15 K
        dg = 20.0 / 627.5094740631
        k = eyring_rate(dg)
        kB, h, Eh = 1.380649e-23, 6.62607015e-34, 4.3597447222071e-18
        expected = (kB * 298.15 / h) * np.exp(-dg * Eh / (kB * 298.15))
        assert k == pytest.approx(expected, rel=1e-12)
        assert 1e-3 < k < 1e-1          # ~0.01 1/s ballpark
        # Arrhenius-like growth with T
        assert eyring_rate(dg, 400.0) > 1e3 * k


class TestReactionPath:
    @pytest.mark.slow   # ~56 s; the saddle itself is anchored fast by
    # TestTransitionState (same h3_saddle fixture), eyring by its
    # analytic test
    def test_h3_irc_descends_into_both_valleys(self, h3_saddle):
        # mass-weighted steepest descent from the exchange TS: both
        # directions descend MONOTONICALLY and end in the two
        # mirror-image H2 + H valleys (short bond -> H2's r_e, long
        # bond growing)
        from esoo_tpu.chem import reaction_path

        e, ts = h3_saddle
        fr = ts["frequencies"]
        mode = fr["modes"][int(np.argmin(fr["frequencies_cm1"]))]
        ends = []
        for d in (+1, -1):
            path = reaction_path(ts["atom"], e, mode, direction=d,
                                 max_steps=15)
            E = np.array(path["energies"])
            assert np.all(np.diff(E) < 1e-8)        # monotone descent
            assert E[-1] < E[0] - 0.01
            _, c = parse_geometry(path["atoms"][-1])
            r1 = np.linalg.norm(c[1] - c[0]) / 1.8897259886
            r2 = np.linalg.norm(c[2] - c[1]) / 1.8897259886
            ends.append((r1, r2))
        (a1, a2), (b1, b2) = ends
        # mirror symmetry of the two branches
        np.testing.assert_allclose(a1, b2, atol=5e-3)
        np.testing.assert_allclose(a2, b1, atol=5e-3)
        # one bond shortens toward H2, the other breaks
        assert min(a1, a2) < 0.85
        assert max(a1, a2) > 1.3
