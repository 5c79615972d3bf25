"""MP2 natural occupations choose the OptOrb active-space size.

The practical workflow question for every OptOrb run is "how many spin
orbitals do I keep?"  MP2's unrelaxed natural-occupation spectrum
answers it for pennies: occupations well above ~1e-3 mark orbitals that
carry correlation.  Here LiH/6-31G (22 spin orbitals) is compressed to
the MP2-selected size and OptOrbVQE recovers nearly all of the
correlation energy in the reduced space.

Run: python examples/MP2_ActiveSpace_OptOrbVQE.py   (~1 min on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from esoo_tpu.chem import MoleculeDriver, localize_orbitals, mp2  # noqa: E402
from esoo_tpu.orbital_optimization import FusedOptOrbVQE  # noqa: E402
from esoo_tpu.sim import UCCSD, HartreeFock  # noqa: E402


def main():
    problem = MoleculeDriver("Li 0 0 0; H 0 0 1.5949",
                             basis="6-31g").run()
    r = mp2(problem)
    occ = r["natural_occupations"]
    print("MP2 natural occupations (first 8):")
    for i, o in enumerate(occ[:8]):
        print(f"  NO {i}: {o:10.6f}")

    # the chemically-motivated view of the same question: localize the
    # occupied window — LiH's two occupied MOs become a pure Li core
    # and a Li-H bond, naming WHICH orbitals carry the chemistry
    loc = localize_orbitals(problem, method="pipek")
    print("\nPipek-Mezey localized occupied orbitals "
          "(per-atom populations):")
    for i, row in enumerate(loc["populations"]):
        kind = "Li core" if row[0] > 0.9 else "Li-H bond"
        print(f"  LMO {i}: Li {row[0]:.3f}  H {row[1]:.3f}   ({kind})")
    kinds = sorted(loc["populations"][:, 0])
    assert kinds[0] < 0.9 < kinds[1]     # one bond + one core

    # keep every NO with occupation above the selection threshold
    thresh = 1e-3
    n_keep = int(np.sum(occ > thresh))
    print(f"\nselected active space: {n_keep} spatial orbitals "
          f"({2 * n_keep} spin orbitals) of {problem.num_spatial_orbitals}")

    n_act = n_keep
    parts = problem.num_particles
    ansatz = UCCSD(n_act, parts,
                   initial_state=HartreeFock(n_act, parts))
    res = FusedOptOrbVQE(num_spin_orbitals=2 * n_act, ansatz=ansatz,
                         problem=problem,
                         maxiter=25).compute_minimum_energy()
    e_hf = r["e_hf"]
    e_opt = res.eigenvalue
    print(f"\nHF energy        : {e_hf:.6f} Ha")
    print(f"MP2 energy       : {e_hf + r['e_corr']:.6f} Ha")
    print(f"OptOrbVQE ({2 * n_act} so): {e_opt:.6f} Ha")
    corr = e_hf - e_opt
    print(f"correlation recovered in the compressed space: "
          f"{corr:.6f} Ha ({corr / -r['e_corr'] * 100:.0f}% of MP2's)")

    assert n_keep < problem.num_spatial_orbitals
    assert e_opt < e_hf + r["e_corr"]    # beats MP2 in a smaller space


if __name__ == "__main__":
    main()
