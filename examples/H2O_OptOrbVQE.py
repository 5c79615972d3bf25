"""OptOrbVQE on water: 6-31G* starting basis (19 spatial / 38 spin
orbitals, polarized cartesian-6d) reduced to 12 spin orbitals, using the
one-dispatch fused solver.

A full 10-electron molecule through the native chemistry frontend — the
kind of system the reference reaches only through PySCFDriver (reference
base_opt_orb_solver.py:87-91).  The RHF value -76.0105 Ha reproduces the
published 6-31G* result (-76.0107, Szabo & Ostlund Table 3.13); OptOrbVQE
then captures correlation inside the optimized 12-spin-orbital active
space.
"""

import math

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.orbital_optimization import FusedOptOrbVQE

r, ang = 0.9572, math.radians(104.52)
x, z = r * math.sin(ang / 2), r * math.cos(ang / 2)
problem = MoleculeDriver(
    atom=f"O 0 0 0; H {x:.6f} 0 {z:.6f}; H {-x:.6f} 0 {z:.6f}",
    basis="6-31g*").run()
print(f"RHF total energy: {problem.scf.energy_total:.6f} Ha "
      f"(published 6-31G*: -76.0107), "
      f"{problem.num_spatial_orbitals} spatial orbitals")

num_reduced_spin_orbitals = 12
n_act = num_reduced_spin_orbitals // 2
parts = problem.num_particles   # (5, 5)

ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))
result = FusedOptOrbVQE(num_spin_orbitals=num_reduced_spin_orbitals,
                        ansatz=ansatz, problem=problem,
                        maxiter=15).compute_minimum_energy()

e_total = float(result.eigenvalue) + problem.nuclear_repulsion_energy
print(f"OptOrbVQE total energy: {e_total:.8f} Ha "
      f"in {result.outer_iterations} outer iterations")
print(f"correlation captured in 12 spin orbitals: "
      f"{e_total - problem.scf.energy_total:.6f} Ha")
