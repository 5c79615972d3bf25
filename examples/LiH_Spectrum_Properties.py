"""LiH absorption spectrum + dipole moments from exact SA-CASSCF.

End-to-end molecular-property workflow the reference cannot express
(it consumes PySCF integrals and reports energies only,
/root/reference/electronic_structure_algorithms/orbital_optimization/
base_opt_orb_solver.py:87-91): the native chem frontend computes the
dipole-operator integrals (McMurchie-Davidson Hermite moments), the
state-averaged exact-CASSCF solver returns per-state and transition
1-RDMs, and chem.properties assembles

  * per-state dipole moments (diagonal of the dipole matrix),
  * transition dipole moments  mu_IJ = -<I|r|J>,
  * length-gauge oscillator strengths f = (2/3) dE |mu|^2,

with the singlet->triplet spin selection rule emerging exactly
(f = 0 to machine precision for the S^2 = 2 states).

Run: python examples/LiH_Spectrum_Properties.py   (~15 s on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from esoo_tpu.chem import (AU_TO_DEBYE, MoleculeDriver,  # noqa: E402
                           dipole_moment, oscillator_strengths,
                           transition_dipoles)
from esoo_tpu.orbital_optimization import FusedOptOrbSACASSCF  # noqa: E402

HARTREE_TO_EV = 27.211386245988


def main():
    problem = MoleculeDriver("Li 0 0 0; H 0 0 1.595", basis="sto-3g").run()
    print(f"LiH sto-3g: {problem.num_spatial_orbitals} orbitals, "
          f"{problem.num_particles} electrons")
    print(f"HF dipole: {dipole_moment(problem, unit='debye')[2]:+.3f} D (z)")

    # 4-state state-averaged exact CASSCF in an 8-spin-orbital active space
    solver = FusedOptOrbSACASSCF(num_spin_orbitals=8, k=4,
                                 problem=problem, maxiter=12)
    res = solver.compute_energies()

    mu = transition_dipoles(problem, res.transition_rdm1_spatial,
                            partial_unitary=res.optimal_partial_unitary)
    f = oscillator_strengths(res.eigenvalues, mu)

    labels = {0.0: "singlet", 0.75: "doublet", 2.0: "triplet"}
    print(f"\n{'state':>5} {'E (Ha)':>12} {'dE (eV)':>8} {'S^2':>5} "
          f"{'mu_z (D)':>9} {'f(0->n)':>9}")
    for i in range(4):
        s2 = float(res.spin_squared[i])
        lab = labels.get(round(s2, 2), f"S^2={s2:.2f}")
        de = (res.eigenvalues[i] - res.eigenvalues[0]) * HARTREE_TO_EV
        print(f"{i:>5} {res.eigenvalues[i]:>12.6f} {de:>8.3f} "
              f"{lab:>8} {mu[i, i, 2] * AU_TO_DEBYE:>+9.3f} "
              f"{f[0, i]:>9.5f}")

    # the spin selection rule is exact: singlet ground state -> Sz=0
    # triplet components carry zero transition dipole
    triplets = [i for i in range(1, 4)
                if abs(float(res.spin_squared[i]) - 2.0) < 1e-6]
    singlets = [i for i in range(1, 4)
                if abs(float(res.spin_squared[i])) < 1e-6]
    assert all(abs(f[0, i]) < 1e-10 for i in triplets)
    assert all(f[0, i] > 0.01 for i in singlets)
    print(f"\nspin-forbidden f(0->{triplets}) = 0 exactly; "
          f"allowed X->A f = {f[0, singlets[0]]:.4f}")


if __name__ == "__main__":
    main()
