"""Orbital-optimized exact diagonalization (CASSCF) on an H4 chain.

No reference counterpart: FusedOptOrbCASSCF swaps the variational
quantum eigensolver for the exact lowest sector eigenpair (warm-started
Davidson on the string-CI sigma GEMMs) — the accuracy upper baseline of
every OptOrb* solver, and the fastest configuration at every measured
size (docs/PERF.md "Exact CASSCF": H8 cc-pVTZ m=112 -> N=28, a
1,002,001-determinant active space, at ~1.5 s per outer iteration on
one TPU v5e chip).

The state-averaged variant gives exact excited states with the same
weighted-RDM orbital updates (block Davidson, lowest k).
"""

from time import perf_counter

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                           FusedOptOrbSACASSCF)

problem = MoleculeDriver(
    atom="H 0 0 0; H 0 0 1.23; H 0 0 2.46; H 0 0 3.69",
    basis="6-31G").run()

# ground state: 6-31G (16 spin orbitals) optimized down to an
# 8-spin-orbital active space, exactly diagonalized each iteration
t0 = perf_counter()
result = FusedOptOrbCASSCF(num_spin_orbitals=8, problem=problem,
                           maxiter=20).compute_minimum_energy()
print(f"FusedOptOrbCASSCF H4 6-31G->8: {result.eigenvalue:.8f} Ha "
      f"(electronic) in {result.outer_iterations} outer iterations, "
      f"{perf_counter() - t0:.1f}s")
# standard CASSCF wavefunction diagnostics: natural-orbital occupation
# numbers and the total-spin expectation (0 = pure singlet)
print("natural occupations:", result.natural_occupations)
print(f"<S^2> = {result.spin_squared:.6f}")

# state-averaged: the three lowest exact states steer the orbitals
t0 = perf_counter()
sa = FusedOptOrbSACASSCF(num_spin_orbitals=8, k=3, problem=problem,
                         maxiter=20).compute_energies()
es = np.asarray(sa.eigenvalues)
print(f"FusedOptOrbSACASSCF k=3: {es[0]:.6f} / {es[1]:.6f} / "
      f"{es[2]:.6f} Ha in {sa.outer_iterations} outer iterations, "
      f"{perf_counter() - t0:.1f}s")
print("total electronic + nuclear repulsion:",
      f"{result.eigenvalue + problem.nuclear_repulsion_energy:.8f} Ha")
