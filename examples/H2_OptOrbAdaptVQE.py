"""OptOrbAdaptVQE on H2: adaptive ansatz growth, 6-31G -> 4 spin orbitals.

Mirrors the reference example examples/H2_OptOrbAdaptVQE.py.
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.ops import JordanWignerMapper
from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
from esoo_tpu.solvers import AdaptVQE, L_BFGS_B, VQE
from esoo_tpu.orbital_optimization import (OptOrbAdaptVQE,
                                           PartialUnitaryProjectionOptimizer)

estimator = Estimator(approximation=True)
mapper = JordanWignerMapper()

q_molecule = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735",
                            basis="6-31G").run()
num_particles = q_molecule.num_particles
num_reduced_spin_orbitals = 4

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

adapt_vqe_instance = AdaptVQE(vqe_instance)

optorbadaptvqe_instance = OptOrbAdaptVQE(
    num_spin_orbitals=num_reduced_spin_orbitals,
    ground_state_solver=adapt_vqe_instance,
    mapper=mapper,
    estimator=estimator,
    partial_unitary_optimizer=partial_unitary_optimizer,
    problem=q_molecule,
    maxiter=20,
    wavefuntion_real=True,
    spin_conserving=True)

result = optorbadaptvqe_instance.compute_minimum_energy()
print(f"Orbital-optimized ground state energy: {result.eigenvalue} Ha "
      f"(4 spin-orbitals)")
