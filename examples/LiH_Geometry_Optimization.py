"""Geometry optimization + equilibrium properties for LiH.

Full workflow the reference cannot express (it consumes one fixed PySCF
problem and reports energies only): BFGS over nuclear coordinates with
finite-difference gradients of fully re-converged exact-CASSCF total
energies, then dipole moment and atomic charges at the optimized
geometry from the CASSCF 1-RDM.

Run: python examples/LiH_Geometry_Optimization.py   (~30 s on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from esoo_tpu.chem import (MoleculeDriver, casscf_energy_fn,  # noqa: E402
                           dipole_moment, optimize_geometry, populations)
from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF  # noqa: E402


def main():
    energy = casscf_energy_fn(basis="sto-3g")    # full space = FCI quality

    print("optimizing LiH from a stretched 1.8 A start (FCI/STO-3G):")
    res = optimize_geometry(
        "Li 0 0 0; H 0 0 1.8", energy,
        callback=lambda atom, e, g: print(
            f"  E = {e:+.8f} Ha   max|dE/dR| = {np.abs(g).max():.2e}"))

    r_bohr = np.linalg.norm(res["coords"][1] - res["coords"][0])
    print(f"\nconverged: {res['converged']} in {res['n_iterations']} "
          f"iterations ({res['n_evaluations']} energy evaluations)")
    print(f"equilibrium bond length: {r_bohr:.4f} bohr "
          f"= {r_bohr * 0.52917721092:.4f} A")
    print(f"total energy: {res['energy']:.8f} Ha")

    # properties at the optimized geometry from the CASSCF 1-RDM
    problem = MoleculeDriver(res["atom"], basis="sto-3g").run()
    r = FusedOptOrbCASSCF(num_spin_orbitals=2 * problem.num_spatial_orbitals,
                          problem=problem,
                          maxiter=30).compute_minimum_energy()
    mu = dipole_moment(problem, gamma_spatial=r.one_rdm_spatial,
                       partial_unitary=r.optimal_partial_unitary,
                       unit="debye")
    _, q = populations(problem, gamma_spatial=r.one_rdm_spatial,
                       partial_unitary=r.optimal_partial_unitary)
    print(f"dipole at equilibrium: {mu[2]:+.3f} D (z)")
    print(f"Mulliken charges: Li {q[0]:+.3f}, H {q[1]:+.3f}")

    assert res["converged"] and 1.30 < r_bohr < 1.75 * 2
    assert np.abs(res["gradient"]).max() < 3e-4


if __name__ == "__main__":
    main()
