"""The classical method ladder on one molecule, all in-package.

HF → MP2 → CISD → CCSD → CCSD(T) → FCI on water/STO-3G — every rung computed
by this package's own machinery (the reference delegates all classical
energies to PySCF and has no correlated method of its own).  The
correlation-energy recovery climbs monotonically toward the exact
sector diagonalization.

Run: python examples/H2O_Method_Ladder.py   (~30 s on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

from esoo_tpu.chem import MoleculeDriver, ccsd, cisd, mp2  # noqa: E402
from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF  # noqa: E402

ATOM = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def main():
    problem = MoleculeDriver(ATOM, basis="sto-3g").run()
    nre = problem.nuclear_repulsion_energy

    e_hf = problem.scf.energy_electronic + nre
    m = mp2(problem)
    ci = cisd(problem)
    cc = ccsd(problem, triples=True)
    fci = FusedOptOrbCASSCF(
        num_spin_orbitals=2 * problem.num_spatial_orbitals,
        problem=problem, maxiter=1).compute_minimum_energy()
    e_fci = fci.eigenvalue + nre
    e_corr_exact = e_fci - e_hf

    rows = [
        ("HF", e_hf),
        ("MP2", m["e_total"]),
        ("CISD", ci["e_total"]),
        ("CCSD", cc["e_total"]),
        ("CCSD(T)", cc["e_total_ccsd_t"]),
        ("FCI (sector Davidson)", e_fci),
    ]
    print(f"H2O / STO-3G  (exact correlation {e_corr_exact:.6f} Ha)\n")
    print(f"{'method':>22} {'E_total (Ha)':>14} {'% corr':>8}")
    prev = None
    for name, e in rows:
        pct = 100.0 * (e - e_hf) / e_corr_exact
        print(f"{name:>22} {e:14.6f} {pct:8.2f}")
        if prev is not None:
            assert e <= prev + 1e-10       # monotone descent
        prev = e

    assert abs(rows[4][1] - e_fci) < 1e-3  # CCSD(T) within 1 mHa of FCI


if __name__ == "__main__":
    main()
