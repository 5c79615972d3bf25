"""Universal basis ingestion (round-2 verdict item 3): Gaussian94 .gbs
parser, third-row STO-3G tables, heavy-atom cc-pVTZ, and the
active-space/frozen-core transformer that makes heavy-atom OptOrb runs
feasible (the qiskit-nature ActiveSpaceTransformer role; reference
base_opt_orb_solver.py:87-91 ingests the transformed problem)."""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.chem.basis import BASIS_SETS
from esoo_tpu.chem.gbs import format_gbs, load_gbs, parse_gbs

H2S_GEOM = "S 0 0 0; H 0 0.9617 0.9269; H 0 -0.9617 0.9269"


# -- parser ----------------------------------------------------------------

def test_gbs_roundtrip_all_tables():
    """format_gbs -> parse_gbs reproduces every bundled table exactly."""
    for name in ("sto-3g", "6-31g", "cc-pvdz", "cc-pvtz"):
        table = BASIS_SETS[name]
        back = parse_gbs(format_gbs(table))
        assert set(back) == set(table)
        for el in table:
            shells = [s for s in table[el]]
            assert len(back[el]) == len(shells)
            for a, b in zip(shells, back[el]):
                assert a["l"] == b["l"]
                np.testing.assert_allclose(
                    np.asarray(a["prims"], dtype=float),
                    np.asarray(b["prims"], dtype=float), rtol=1e-9)


def test_gbs_parses_sp_shells_and_fortran_exponents():
    text = """
! STO-3G hydrogen + an SP carbon fragment (synthetic)
****
H     0
S   3   1.00
      0.3425250914D+01       0.1543289673D+00
      0.6239137298D+00       0.5353281423D+00
      0.1688554040D+00       0.4446345422D+00
****
C     0
S   3   1.00
     71.6168370              0.15432897
     13.0450960              0.53532814
      3.5305122              0.44463454
SP   3   1.00
      2.9412494             -0.09996723             0.15591627
      0.6834831              0.39951283             0.60768372
      0.2222899              0.70011547             0.39195739
****
"""
    table = parse_gbs(text)
    assert set(table) == {"H", "C"}
    # SP expands to one S + one P sharing exponents
    c_shells = table["C"]
    assert [s["l"] for s in c_shells] == [0, 0, 1]
    np.testing.assert_allclose(
        [p[0] for p in c_shells[1]["prims"]],
        [p[0] for p in c_shells[2]["prims"]])
    # Fortran D exponent parsed
    np.testing.assert_allclose(table["H"][0]["prims"][0][0], 3.425250914)


def test_gbs_parse_errors():
    with pytest.raises(ValueError, match="no basis entries"):
        parse_gbs("! nothing here\n****\n")
    with pytest.raises(ValueError, match="unrecognized shell"):
        parse_gbs("****\nH 0\nQ 1 1.00\n 1.0 1.0\n****\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_gbs("****\nH 0\nS 3 1.00\n 1.0 1.0\n")


def test_gbs_file_drives_molecule(tmp_path):
    """A .gbs file path as `basis=` reproduces the table-driven energy."""
    path = tmp_path / "mybasis.gbs"
    path.write_text(format_gbs({"H": BASIS_SETS["sto-3g"]["H"]}))
    p_file = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735",
                            basis=str(path)).run()
    p_table = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735",
                             basis="sto-3g").run()
    np.testing.assert_allclose(p_file.scf.energy_total,
                               p_table.scf.energy_total, atol=1e-12)


def test_unknown_basis_mentions_gbs():
    with pytest.raises(ValueError, match="gbs"):
        MoleculeDriver(atom="H 0 0 0", basis="no-such-basis").run()


# -- third-row STO-3G vs literature ---------------------------------------

def test_h2s_sto3g_rhf_literature():
    """H2S STO-3G RHF = -394.3116 Ha — validates the S tables AND the
    universal third-row 3sp contraction constants."""
    p = MoleculeDriver(atom=H2S_GEOM, basis="sto-3g").run()
    total = p.scf.energy_electronic + p.nuclear_repulsion_energy
    np.testing.assert_allclose(total, -394.3116, atol=5e-4)


def test_hcl_sto3g_rhf():
    """HCl STO-3G RHF at r=1.2746 A (literature ~-455.135)."""
    p = MoleculeDriver(atom="H 0 0 0; Cl 0 0 1.2746", basis="sto-3g").run()
    total = p.scf.energy_electronic + p.nuclear_repulsion_energy
    np.testing.assert_allclose(total, -455.135, atol=2e-3)


def test_third_row_atoms_variational():
    """Every third-row atom's RHF/ROHF sits above the HF limit and within
    the minimal-basis deficit window (guards against transposed digits)."""
    limits = {"Si": -288.854, "P": -340.719, "S": -397.505,
              "Cl": -459.482, "Ar": -526.817}
    spins = {"Si": 2, "P": 3, "S": 2, "Cl": 1, "Ar": 0}
    for el, lim in limits.items():
        p = MoleculeDriver(atom=f"{el} 0 0 0", basis="sto-3g",
                           spin=spins[el]).run()
        e = p.scf.energy_electronic
        assert lim < e < lim + 8.0, (el, e)


# -- heavy-atom cc-pVTZ vs literature --------------------------------------

def test_h2o_ccpvtz_rhf_literature():
    """H2O cc-pVTZ RHF = -76.0572 Ha at the re geometry — the heavy-atom
    triple-zeta validation the round-2 verdict asked for."""
    import math
    r, th = 0.9572, math.radians(104.52 / 2)
    geom = (f"O 0 0 0; H 0 {r*math.sin(th):.6f} {r*math.cos(th):.6f}; "
            f"H 0 {-r*math.sin(th):.6f} {r*math.cos(th):.6f}")
    p = MoleculeDriver(atom=geom, basis="cc-pvtz").run()
    total = p.scf.energy_electronic + p.nuclear_repulsion_energy
    np.testing.assert_allclose(total, -76.05717, atol=5e-4)


@pytest.mark.slow
def test_n2_ccpvtz_rhf_literature():
    p = MoleculeDriver(atom="N 0 0 0; N 0 0 1.0977", basis="cc-pvtz").run()
    total = p.scf.energy_electronic + p.nuclear_repulsion_energy
    np.testing.assert_allclose(total, -108.9835, atol=5e-4)


def test_c_atom_ccpvtz_rohf_literature():
    p = MoleculeDriver(atom="C 0 0 0", basis="cc-pvtz", spin=2).run()
    np.testing.assert_allclose(p.scf.energy_electronic, -37.6867, atol=3e-4)


# -- active space / frozen core --------------------------------------------

def test_active_space_hf_identity():
    """Folding the frozen core into (h_eff, E_core) must reproduce the
    full-space SCF energy EXACTLY from the active-space HF determinant."""
    p = MoleculeDriver(atom=H2S_GEOM, basis="sto-3g").run()
    a = p.active_space()          # auto core: S -> 5 frozen
    assert a.num_particles == (4, 4)
    assert a.num_spatial_orbitals == 6
    na = a.num_particles[0]
    occ = slice(0, na)
    h, eri = a.hcore_mo, a.eri_mo
    e_act = (2 * np.trace(h[occ, occ])
             + 2 * np.einsum("iijj->", eri[occ, occ, occ, occ])
             - np.einsum("ijji->", eri[occ, occ, occ, occ]))
    np.testing.assert_allclose(e_act + a.core_energy,
                               p.scf.energy_electronic, atol=1e-10)


def test_active_space_validation_errors():
    p = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="sto-3g").run()
    with pytest.raises(ValueError, match="cannot freeze"):
        p.active_space(n_frozen=2)
    with pytest.raises(ValueError, match="active window"):
        p.active_space(n_frozen=0, n_active_orbitals=99)


def test_h2s_frozen_core_optorbvqe_e2e():
    """A second-row molecule end to end: H2S STO-3G, 5 frozen core
    orbitals, OptOrb reduction of the 12-spin-orbital valence space to
    N=10 — impossible with the round-2 tables (no S data) and infeasible
    without the active-space transformer (18 electrons).  The OptOrb
    energy must improve on the frozen-window HF determinant and total to
    a sensible H2S energy."""
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE
    from esoo_tpu.sim import HartreeFock, UCCSD

    p = MoleculeDriver(atom=H2S_GEOM, basis="sto-3g").run()
    a = p.active_space()                      # (4, 4) in 6 spatial
    ansatz = UCCSD(5, (4, 4), initial_state=HartreeFock(5, (4, 4)))
    r = FusedOptOrbVQE(num_spin_orbitals=10, ansatz=ansatz, problem=a,
                       maxiter=6, vqe_maxiter=150,
                       simulation="sector").compute_minimum_energy()
    e_hf_full = p.scf.energy_electronic
    total = r.eigenvalue + a.core_energy
    # correlation within the reduced window: below full-molecule HF,
    # above a generous correlation bound
    assert total < e_hf_full - 1e-4
    assert total > e_hf_full - 0.5
    U = r.optimal_partial_unitary
    np.testing.assert_allclose(U.T @ U, np.eye(5), atol=1e-6)


def test_hf_molecule_ccpvtz_rhf_literature():
    """HF/cc-pVTZ RHF = -100.0580 Ha at r=0.9168 A (validates F)."""
    p = MoleculeDriver(atom="H 0 0 0; F 0 0 0.9168", basis="cc-pvtz").run()
    total = p.scf.energy_electronic + p.nuclear_repulsion_energy
    np.testing.assert_allclose(total, -100.0580, atol=5e-4)


def test_ne_ccpvtz_rhf_literature():
    p = MoleculeDriver(atom="Ne 0 0 0", basis="cc-pvtz").run()
    np.testing.assert_allclose(p.scf.energy_electronic, -128.5313,
                               atol=1e-3)


def test_post_ar_element_user_gbs_hydrogenic(tmp_path):
    """Post-Ar ingestion (Z=30) through a user-supplied .gbs file, with
    an INTERNAL exact oracle: hydrogenic Zn^29+ in an even-tempered s
    basis.  The one-electron SCF electronic energy must equal the lowest
    generalized eigenvalue of (T+V, S) in the same basis exactly, and
    approach the analytic -Z^2/2 = -450 Ha from above (variational).
    Bundled tables stop at Ar; this pins the documented user-supplied
    route for heavier elements (docs/CHEMISTRY.md ECP note)."""
    import scipy.linalg

    Z = 30
    lines = ["****", "Zn     0"]
    for k in range(12):
        a = Z * Z * 0.005 * 3.0 ** k
        lines.append("S    1   1.00")
        lines.append(f"      {a:.10E}      1.0000000000")
    lines.append("****")
    gbs = tmp_path / "zn_even_tempered.gbs"
    gbs.write_text("\n".join(lines) + "\n")

    p = MoleculeDriver(atom="Zn 0 0 0", basis=str(gbs),
                       charge=Z - 1, spin=1).run()
    assert p.num_particles == (1, 0)
    e = p.scf.energy_electronic

    from esoo_tpu.chem.integrals import IntegralEngine
    ao = p.ao_basis
    S, T, V = IntegralEngine(ao.shells, ao.atomic_numbers,
                             ao.coords).one_electron()
    w = scipy.linalg.eigh(T + V, S, eigvals_only=True)
    np.testing.assert_allclose(e, w[0], atol=1e-9)
    assert -450.0 - 1e-9 <= e < -449.0   # variational, <0.25% from exact
