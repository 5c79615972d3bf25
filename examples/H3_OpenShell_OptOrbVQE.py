"""Open-shell OptOrbVQE: linear H3 doublet (spin = 1) in 6-31G reduced to
6 spin orbitals.

Demonstrates the ROHF open-shell frontend (round 2): one common set of
spatial orbitals (Guest-Saunders effective Fock) feeds the OptOrb
machinery, whose partial unitary U is spatial and spin-expanded by
block_diag — exactly the structure ROHF preserves (the reference's PySCF
ingestion is closed-shell in every shipped example/test).
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
from esoo_tpu.solvers import L_BFGS_B, VQE
from esoo_tpu.orbital_optimization import (OptOrbVQE,
                                           PartialUnitaryProjectionOptimizer)

problem = MoleculeDriver(atom="H 0 0 0; H 0 0 0.9; H 0 0 1.8",
                         basis="6-31g", spin=1).run()
print(f"ROHF total energy: {problem.scf.energy_total:.6f} Ha, "
      f"(n_alpha, n_beta) = {problem.num_particles}")

num_reduced_spin_orbitals = 6
n_act = num_reduced_spin_orbitals // 2
parts = problem.num_particles   # (2, 1)

ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))
vqe = VQE(Estimator(), ansatz, L_BFGS_B(maxiter=300),
          initial_point=np.zeros(ansatz.num_parameters))
pupo = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=1e-3, stopping_tolerance=1e-5, maxiter=10000)

solver = OptOrbVQE(num_spin_orbitals=num_reduced_spin_orbitals,
                   ground_state_solver=vqe,
                   partial_unitary_optimizer=pupo,
                   problem=problem, maxiter=15)
result = solver.compute_minimum_energy()

print(f"OptOrbVQE electronic energy (6-31G -> 6 so): "
      f"{float(result.eigenvalue):.8f} Ha")
print("(full STO-3G FCI in the same sector is -3.0399 Ha electronic; the "
      "larger starting basis wins)")
