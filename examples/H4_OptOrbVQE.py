"""OptOrbVQE on an H4 chain: cc-pVTZ (112 spin orbitals) -> 8 spin orbitals.

Mirrors the reference example examples/H4_OptOrbVQE.py: the larger-M
configuration exercising the two-electron transform at scale.
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.ops import JordanWignerMapper
from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
from esoo_tpu.solvers import L_BFGS_B, VQE
from esoo_tpu.orbital_optimization import (OptOrbVQE,
                                           PartialUnitaryProjectionOptimizer)

estimator = Estimator(approximation=True)
mapper = JordanWignerMapper()

bond = 1.23
q_molecule = MoleculeDriver(
    atom="; ".join(f"H 0 0 {n * bond}" for n in range(4)),
    basis="cc-pVTZ").run()
num_particles = q_molecule.num_particles
num_reduced_spin_orbitals = 8

HF_state = HartreeFock(num_spatial_orbitals=num_reduced_spin_orbitals // 2,
                       num_particles=num_particles)
ansatz = UCCSD(num_spatial_orbitals=num_reduced_spin_orbitals // 2,
               num_particles=num_particles,
               initial_state=HF_state)

partial_unitary_optimizer = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=10**-3, stopping_tolerance=10**-5, maxiter=10000)

vqe_instance = VQE(ansatz=ansatz,
                   initial_point=np.zeros(ansatz.num_parameters),
                   optimizer=L_BFGS_B(),
                   estimator=estimator)

optorbvqe_instance = OptOrbVQE(num_spin_orbitals=num_reduced_spin_orbitals,
                               ground_state_solver=vqe_instance,
                               mapper=mapper,
                               estimator=estimator,
                               partial_unitary_optimizer=partial_unitary_optimizer,
                               problem=q_molecule,
                               maxiter=20,
                               wavefuntion_real=True,
                               spin_conserving=True)

result = optorbvqe_instance.compute_minimum_energy()
print(f"Orbital-optimized ground state energy: {result.eigenvalue} Ha "
      f"({num_reduced_spin_orbitals} spin-orbitals)")
