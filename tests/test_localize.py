"""Orbital localization (Pipek-Mezey / Foster-Boys, chem/localize.py).

Anchors: exact invariants (orthonormality, occupied-density/energy
invariance under the window rotation, metric monotonicity) plus the
textbook localized structure of water (1 core + 2 lone pairs on O and
two symmetric O-H bond orbitals) and LiH (core centroid at Li, bond
centroid between the nuclei)."""

import numpy as np
import pytest

from esoo_tpu import chem


@pytest.fixture(scope="module")
def h2o():
    return chem.MoleculeDriver(
        atom="O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g").run()


@pytest.fixture(scope="module")
def lih():
    return chem.MoleculeDriver(atom="Li 0 0 0; H 0 0 1.595",
                               basis="sto-3g").run()


@pytest.mark.parametrize("method", ["pipek", "boys"])
def test_invariants_h2o(h2o, method):
    res = chem.localize_orbitals(h2o, method=method)
    C = res["coefficients"]
    W = res["rotation"]
    S = h2o.ao_basis.overlap
    n_docc = min(h2o.num_particles)
    assert C.shape == (S.shape[0], n_docc)
    # W orthogonal, localized orbitals S-orthonormal
    np.testing.assert_allclose(W.T @ W, np.eye(n_docc), atol=1e-12)
    np.testing.assert_allclose(C.T @ S @ C, np.eye(n_docc), atol=1e-10)
    # occupied density (hence the SCF determinant, energy, dipole)
    # exactly invariant under the window rotation
    C0 = h2o.mo_coeff_ao[:, :n_docc]
    np.testing.assert_allclose(C @ C.T, C0 @ C0.T, atol=1e-10)
    # metric nondecreasing sweep-to-sweep and strictly improved overall
    hist = res["metric_history"]
    assert np.all(np.diff(hist) >= -1e-12)
    assert hist[-1] > hist[0] + 1e-3
    assert res["converged"]
    # per-orbital Mulliken populations partition to 1
    np.testing.assert_allclose(res["populations"].sum(axis=1), 1.0,
                               atol=1e-10)


def test_pipek_h2o_bonding_pattern(h2o):
    """PM water: three orbitals essentially on O (1s core + 2 lone
    pairs) and two symmetric O-H bonds sharing weight with one H each."""
    res = chem.localize_orbitals(h2o, method="pipek")
    pops = res["populations"]            # (5, 3) — atoms [O, H, H]
    o_pop = pops[:, 0]
    lone = np.where(o_pop > 0.9)[0]
    bonds = np.where(o_pop <= 0.9)[0]
    assert len(lone) == 3 and len(bonds) == 2
    # each bond orbital lives on O + exactly one H
    h_shares = pops[bonds][:, 1:]
    for row in h_shares:
        row = np.sort(row)
        assert row[-1] > 0.15            # the bonded H
        assert row[0] < 0.05             # the spectator H
    # the two bonds are mirror images
    np.testing.assert_allclose(np.sort(h_shares[0]),
                               np.sort(h_shares[1]), atol=1e-6)


def test_boys_lih_centroids(lih):
    """Boys LiH: the core orbital's dipole centroid sits on Li, the
    bond orbital's between the nuclei (shifted toward H)."""
    res = chem.localize_orbitals(lih, method="boys")
    cents = res["centroids"]             # (2, 3); Li at z=0, H at z~3.01
    z = np.sort(cents[:, 2])
    z_h = lih.ao_basis.coords[1, 2]
    assert abs(z[0]) < 0.1               # core on Li
    assert 0.3 * z_h < z[1] < 1.1 * z_h  # bond between the nuclei
    # LiH canonical MOs are already near-local (core + bond), so the
    # metric moves little — but never down
    hist = res["metric_history"]
    assert hist[-1] >= hist[0] - 1e-12


def test_explicit_window_and_errors(lih):
    # localizing a 1-orbital window is a no-op
    res = chem.localize_orbitals(lih, orbitals=[0])
    np.testing.assert_allclose(res["rotation"], [[1.0]])
    # virtual-window localization stays S-orthonormal
    n = lih.num_spatial_orbitals
    n_docc = min(lih.num_particles)
    virt = list(range(n_docc, n))
    rv = chem.localize_orbitals(lih, orbitals=virt, method="pipek")
    S = lih.ao_basis.overlap
    Cv = rv["coefficients"]
    np.testing.assert_allclose(Cv.T @ S @ Cv, np.eye(len(virt)),
                               atol=1e-10)
    with pytest.raises(ValueError):
        chem.localize_orbitals(lih, orbitals=[0, 99])
    with pytest.raises(ValueError):
        chem.localize_orbitals(lih, orbitals=[0, 0])    # duplicates
    with pytest.raises(ValueError):
        chem.localize_orbitals(lih, method="nope")
    # boolean masks are accepted and mean selection, not indices
    mask = np.zeros(lih.num_spatial_orbitals, dtype=bool)
    mask[:2] = True
    rm = chem.localize_orbitals(lih, orbitals=mask, method="boys")
    rl = chem.localize_orbitals(lih, orbitals=[0, 1], method="boys")
    np.testing.assert_allclose(rm["coefficients"], rl["coefficients"],
                               atol=1e-12)
    with pytest.raises(ValueError):     # wrong-length mask
        chem.localize_orbitals(lih, orbitals=mask[:-1])
    with pytest.raises(ValueError, match="empty"):   # empty selection
        chem.localize_orbitals(lih, orbitals=[])
    with pytest.raises(ValueError, match="empty"):   # all-False mask
        chem.localize_orbitals(
            lih, orbitals=np.zeros(lih.num_spatial_orbitals, dtype=bool))
    # bare-tensor problems carry no AO structure
    import dataclasses
    bare = dataclasses.replace(lih, mo_coeff_ao=None)
    with pytest.raises(ValueError):
        chem.localize_orbitals(bare)
