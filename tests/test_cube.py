"""Real-space evaluation + cube export (chem/cube.py).

The load-bearing check is QUADRATURE CLOSURE: numerically integrating
the evaluated AOs reproduces the integral engine's analytic overlap
matrix — the same functions, through pure-d shells.  Remaining checks:
density integrals equal electron counts, natural-orbital consistency,
cube round trips.  The reference computes no real-space quantities."""

import os

import numpy as np
import pytest

from esoo_tpu.chem import (MoleculeDriver, cube_density, density_values,
                           evaluate_aos, grid_points, orbital_values,
                           read_cube, write_cube)


@pytest.fixture(scope="module")
def h2():
    return MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="6-31g").run()


def _box(lo, hi, n):
    xs = np.linspace(lo, hi, n)
    dv = (xs[1] - xs[0]) ** 3
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1), dv


class TestQuadratureClosure:
    def test_h2_sto3g_overlap(self):
        p = MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="sto-3g").run()
        pts, dv = _box(-7.0, 7.75, 60)
        phi = evaluate_aos(p.ao_basis.shells, pts)
        np.testing.assert_allclose(phi.T @ phi * dv,
                                   np.asarray(p.ao_basis.overlap),
                                   atol=1e-7)

    def test_carbon_pure_d_block(self):
        # the solid-harmonic (pure) transform must match the engine's;
        # the d functions are compact enough for a fine local grid
        p = MoleculeDriver("C 0 0 0", basis="cc-pvdz", spin=2).run()
        pts, dv = _box(-4.0, 4.05, 161)
        phi = evaluate_aos(p.ao_basis.shells, pts)
        S_num = phi.T @ phi * dv
        S = np.asarray(p.ao_basis.overlap)
        np.testing.assert_allclose(S_num[9:14, 9:14], S[9:14, 9:14],
                                   atol=1e-5)
        # d x s/p cross blocks too
        np.testing.assert_allclose(S_num[9:14, :9], S[9:14, :9],
                                   atol=1e-4)


class TestDensities:
    def test_hf_density_integrates_to_n_electrons(self, h2, tmp_path):
        info = cube_density(h2, str(tmp_path / "h2.cube"),
                            spacing=0.2, margin=5.0)
        assert info["n_electrons"] == pytest.approx(2.0, abs=1e-3)

    def test_fci_density_and_positivity(self, h2, tmp_path):
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        r = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=h2,
                              maxiter=15).compute_minimum_energy()
        info = cube_density(h2, str(tmp_path / "h2_fci.cube"),
                            gamma_spatial=r.one_rdm_spatial,
                            partial_unitary=r.optimal_partial_unitary,
                            spacing=0.2, margin=5.0)
        assert info["n_electrons"] == pytest.approx(2.0, abs=1e-3)
        pts, _ = _box(-3.0, 3.0, 25)
        rho = density_values(h2, pts, gamma_spatial=r.one_rdm_spatial,
                             partial_unitary=r.optimal_partial_unitary)
        assert rho.min() > -1e-10   # a true density is nonnegative

    def test_spin_density_of_doublet_integrates_to_2sz(self, tmp_path):
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        p = MoleculeDriver("H 0 0 0; H 0 0 0.95; H 0 0 1.90",
                           basis="sto-3g", spin=1).run()
        r = FusedOptOrbCASSCF(num_spin_orbitals=6, problem=p,
                              maxiter=20).compute_minimum_energy()
        info = cube_density(p, str(tmp_path / "h3_spin.cube"),
                            gamma_spatial=r.spin_density_spatial,
                            partial_unitary=r.optimal_partial_unitary,
                            spacing=0.2, margin=5.0, spin=True)
        assert info["n_electrons"] == pytest.approx(1.0, abs=2e-3)

    def test_natural_orbital_norm_and_density_sum(self, h2):
        from esoo_tpu.chem import natural_orbitals
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        r = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=h2,
                              maxiter=15).compute_minimum_energy()
        occ, C = natural_orbitals(h2, r.one_rdm_spatial,
                                  r.optimal_partial_unitary)
        pts, dv = _box(-8.0, 8.8, 57)
        vals = orbital_values(h2, pts, C)         # (npts, 2)
        # each NO is normalized, and sum_i occ_i |NO_i|^2 == rho
        np.testing.assert_allclose((vals ** 2).sum(axis=0) * dv,
                                   1.0, atol=2e-3)
        rho = density_values(h2, pts, gamma_spatial=r.one_rdm_spatial,
                             partial_unitary=r.optimal_partial_unitary)
        np.testing.assert_allclose((vals ** 2) @ occ, rho, atol=1e-10)


class TestCubeIO:
    def test_round_trip(self, h2, tmp_path):
        f = str(tmp_path / "rt.cube")
        origin = np.array([-2.0, -2.0, -2.5])
        axes = np.diag([0.5, 0.5, 0.5])
        shape = (9, 9, 11)
        pts = grid_points(origin, axes, shape)
        rho = density_values(h2, pts)
        write_cube(f, h2, rho, origin, axes, shape)
        back = read_cube(f)
        assert back["shape"] == shape
        np.testing.assert_allclose(back["origin"], origin, atol=1e-6)
        np.testing.assert_allclose(back["values"], rho, rtol=2e-5)
        np.testing.assert_allclose(back["coords"],
                                   np.asarray(h2.ao_basis.coords),
                                   atol=1e-6)

    def test_value_count_mismatch_raises(self, h2):
        with pytest.raises(ValueError, match="entries"):
            write_cube("/tmp/x.cube", h2, np.zeros(5), [0, 0, 0],
                       np.eye(3), (2, 2, 2))

    def test_spin_true_requires_explicit_spin_gamma(self, h2):
        from esoo_tpu.chem import density_values as dv

        with pytest.raises(ValueError, match="spin-SUMMED"):
            dv(h2, np.zeros((1, 3)), spin=True)
        with pytest.raises(ValueError, match="SPATIAL"):
            dv(h2, np.zeros((1, 3)), gamma_spatial=np.zeros((8, 8)),
               spin=True)

    def test_requires_shells(self, h2):
        import dataclasses

        bare = dataclasses.replace(h2, ao_basis=None)
        with pytest.raises(ValueError, match="shells"):
            density_values(bare, np.zeros((1, 3)))


class TestESP:
    def test_far_field_matches_dipole_law(self):
        # LiH on-axis far field: V -> mu_z/z^2, with the remaining
        # deviation (the quadrupole term) decaying like 1/z
        from esoo_tpu.chem import dipole_moment, esp_values

        p = MoleculeDriver("Li 0 0 0; H 0 0 1.5949",
                           basis="sto-3g").run()
        mu = dipole_moment(p)
        v15 = esp_values(p, [[0, 0, 15.0]])[0]
        v20 = esp_values(p, [[0, 0, 20.0]])[0]
        r15, r20 = v15 / (mu[2] / 15.0 ** 2), v20 / (mu[2] / 20.0 ** 2)
        assert abs(r15 - 1.0) < 0.15
        assert abs(r20 - 1.0) < abs(r15 - 1.0)   # converging
        np.testing.assert_allclose((r20 - 1.0) / (r15 - 1.0),
                                   15.0 / 20.0, atol=0.05)

    def test_cation_monopole(self):
        # H2+ far field is dominated by the +1 monopole: V ~ 1/r
        from esoo_tpu.chem import esp_values

        p = MoleculeDriver("H 0 0 0; H 0 0 1.057", basis="sto-3g",
                           charge=1, spin=1).run()
        v = esp_values(p, [[0, 14.0, 0.5]])[0]
        r = np.linalg.norm(np.array([0, 14.0, 0.5])
                           - np.array([0, 0, 1.057 * 1.8897259886 / 2]))
        np.testing.assert_allclose(v, 1.0 / r, rtol=0.01)

    def test_neutral_atom_penetration(self):
        # outside a neutral spherical atom V > 0 (nucleus less shielded
        # than a point charge would be) and far below the bare 2/r
        from esoo_tpu.chem import esp_values

        p = MoleculeDriver("He 0 0 0", basis="6-31g").run()
        for r in (1.0, 2.0, 4.0):
            v = esp_values(p, [[r, 0, 0]])[0]
            assert 0.0 < v < 2.0 / r
        # decays faster than 1/r (exponential shielding)
        v1, v4 = esp_values(p, [[1.0, 0, 0], [4.0, 0, 0]])
        assert v4 < v1 / 4.0

    def test_esp_charges_lih(self):
        from esoo_tpu.chem import esp_charges

        p = MoleculeDriver("Li 0 0 0; H 0 0 1.5949",
                           basis="sto-3g").run()
        q, rrms = esp_charges(p)
        assert q.sum() == pytest.approx(0.0, abs=1e-10)
        assert q[0] > 0.3          # Li is the cationic end
        assert rrms < 0.5

    def test_esp_charges_total_charge_constraint(self):
        from esoo_tpu.chem import esp_charges

        p = MoleculeDriver("H 0 0 0; H 0 0 1.057", basis="sto-3g",
                           charge=1, spin=1).run()
        q, _ = esp_charges(p)
        assert q.sum() == pytest.approx(1.0, abs=1e-10)
        np.testing.assert_allclose(q[0], q[1], atol=1e-6)  # symmetric
