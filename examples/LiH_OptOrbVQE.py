"""OptOrbVQE on LiH: cc-pVDZ starting basis (19 spatial / 38 spin
orbitals) reduced to 6 spin orbitals.

Demonstrates the general-molecule chemistry frontend (round 2): published
cc-pVDZ tables for Li (Prascher et al. 2011) and H (Dunning 1989) feed the
native McMurchie-Davidson integral engine + RHF — the pipeline the
reference delegates to PySCFDriver (reference
base_opt_orb_solver.py:87-91).  Literature anchor: RHF/cc-pVDZ at
r = 1.5949 A is -7.98368 Ha total; full-space FCI is about -8.0087 Ha, so
the reduced-space OptOrb energy must land between them.
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
from esoo_tpu.solvers import L_BFGS_B, VQE
from esoo_tpu.orbital_optimization import (OptOrbVQE,
                                           PartialUnitaryProjectionOptimizer)

problem = MoleculeDriver(atom="Li 0 0 0; H 0 0 1.5949",
                         basis="cc-pvdz").run()
print(f"RHF total energy: {problem.scf.energy_total:.6f} Ha "
      f"(literature -7.98368), {problem.num_spatial_orbitals} spatial "
      f"orbitals")

num_reduced_spin_orbitals = 6
n_act = num_reduced_spin_orbitals // 2
parts = problem.num_particles

ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))
vqe = VQE(Estimator(), ansatz, L_BFGS_B(maxiter=300),
          initial_point=np.zeros(ansatz.num_parameters))
pupo = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=1e-3, stopping_tolerance=1e-5, maxiter=10000)

solver = OptOrbVQE(num_spin_orbitals=num_reduced_spin_orbitals,
                   ground_state_solver=vqe,
                   partial_unitary_optimizer=pupo,
                   problem=problem, maxiter=20)
result = solver.compute_minimum_energy()

e_total = float(result.eigenvalue) + problem.nuclear_repulsion_energy
print(f"OptOrbVQE electronic energy: {float(result.eigenvalue):.8f} Ha")
print(f"OptOrbVQE total energy:      {e_total:.8f} Ha")
print(f"RHF total:                   {problem.scf.energy_total:.8f} Ha")
print(f"correlation captured in 6 spin orbitals: "
      f"{e_total - problem.scf.energy_total:.6f} Ha")
