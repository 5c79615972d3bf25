"""OptOrbMCVQE on H2: CIS-initialized two states, 6-31G -> 4 spin orbitals.

Mirrors the reference example examples/H2_OptOrbMCVQE.py.
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.ops import JordanWignerMapper
from esoo_tpu.sim import Estimator, UCCSD
from esoo_tpu.solvers import L_BFGS_B, MCVQE
from esoo_tpu.orbital_optimization import (OptOrbMCVQE,
                                           PartialUnitaryProjectionOptimizer)

estimator = Estimator(approximation=True)
mapper = JordanWignerMapper()

q_molecule = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735",
                            basis="6-31G").run()
num_particles = q_molecule.num_particles
num_reduced_spin_orbitals = 4
k = 2

ansatz = UCCSD(num_spatial_orbitals=num_reduced_spin_orbitals // 2,
               num_particles=num_particles, reps=2)

partial_unitary_optimizer = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=10**-3, stopping_tolerance=10**-5, maxiter=10000)

mcvqe_instance = MCVQE(k=k,
                       ansatz=ansatz,
                       excitations="s",
                       num_particles=num_particles,
                       initial_point=np.zeros(ansatz.num_parameters),
                       optimizer=L_BFGS_B(),
                       estimator=estimator)

optorbmcvqe_instance = OptOrbMCVQE(
    num_spin_orbitals=num_reduced_spin_orbitals,
    excited_states_solver=mcvqe_instance,
    mapper=mapper,
    estimator=estimator,
    partial_unitary_optimizer=partial_unitary_optimizer,
    problem=q_molecule,
    maxiter=20,
    wavefuntion_real=True,
    spin_conserving=True)

result = optorbmcvqe_instance.compute_energies()
print(f"Orbital-optimized energies: {result.eigenvalues} Ha "
      f"(4 spin-orbitals)")
