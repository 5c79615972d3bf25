"""Second-row chemistry end to end: H2S STO-3G with a frozen sulfur core.

Round-3 capabilities on display:
  - third-row basis tables (S; validated against the literature H2S
    STO-3G RHF energy -394.3116 Ha),
  - the active-space / frozen-core transformer (the qiskit-nature
    ActiveSpaceTransformer role; reference base_opt_orb_solver.py:87-91
    ingests the transformed problem) folding the S 1s2s2p core into an
    effective one-body operator + scalar,
  - OptOrb reduction of the 12-spin-orbital valence window to 10 via the
    one-dispatch FusedOptOrbVQE in the determinant sector.
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.orbital_optimization import FusedOptOrbVQE
from esoo_tpu.sim import HartreeFock, UCCSD

problem = MoleculeDriver(
    atom="S 0 0 0; H 0 0.9617 0.9269; H 0 -0.9617 0.9269",
    basis="sto-3g").run()
print(f"H2S RHF total: "
      f"{problem.scf.energy_electronic + problem.nuclear_repulsion_energy:.6f} Ha")

active = problem.active_space()        # auto: S -> 5 frozen core orbitals
print(f"active space: {active.num_particles} electrons in "
      f"{active.num_spatial_orbitals} spatial orbitals, "
      f"E_core = {active.core_energy:.6f} Ha")

ansatz = UCCSD(5, active.num_particles,
               initial_state=HartreeFock(5, active.num_particles))
result = FusedOptOrbVQE(num_spin_orbitals=10, ansatz=ansatz,
                        problem=active, maxiter=8, vqe_maxiter=200,
                        simulation="sector").compute_minimum_energy()

total = (result.eigenvalue + active.core_energy
         + problem.nuclear_repulsion_energy)
print(f"OptOrbVQE active-space energy: {result.eigenvalue:.6f} Ha")
print(f"H2S total energy (12 -> 10 valence spin orbitals): {total:.6f} Ha")
