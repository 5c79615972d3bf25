"""OptOrbSSVQE on H2: lowest two states, 6-31G -> 4 spin orbitals.

Mirrors the reference example examples/H2_OptOrbSSVQE.py.
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.ops import JordanWignerMapper
from esoo_tpu.sim import Estimator, HartreeFock, QuantumCircuit, UCCSD
from esoo_tpu.solvers import L_BFGS_B, SSVQE
from esoo_tpu.orbital_optimization import (OptOrbSSVQE,
                                           PartialUnitaryProjectionOptimizer)

estimator = Estimator(approximation=True)
mapper = JordanWignerMapper()

q_molecule = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735",
                            basis="6-31G").run()
num_particles = q_molecule.num_particles
num_reduced_spin_orbitals = 4
k = 2

HF_state = HartreeFock(num_spatial_orbitals=num_reduced_spin_orbitals // 2,
                       num_particles=num_particles)
excited_HF = QuantumCircuit(num_reduced_spin_orbitals)
excited_HF.x(1)
excited_HF.x(2)
initial_states = [HF_state, excited_HF]

ansatz = UCCSD(num_spatial_orbitals=num_reduced_spin_orbitals // 2,
               num_particles=num_particles, reps=2)

partial_unitary_optimizer = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=10**-3, stopping_tolerance=10**-5, maxiter=10000)

ssvqe_instance = SSVQE(k=k,
                       ansatz=ansatz,
                       initial_states=initial_states,
                       weight_vector=[2, 1],
                       initial_point=np.zeros(ansatz.num_parameters),
                       optimizer=L_BFGS_B(),
                       estimator=estimator)

optorbssvqe_instance = OptOrbSSVQE(
    num_spin_orbitals=num_reduced_spin_orbitals,
    excited_states_solver=ssvqe_instance,
    mapper=mapper,
    estimator=estimator,
    partial_unitary_optimizer=partial_unitary_optimizer,
    problem=q_molecule,
    maxiter=20,
    wavefuntion_real=True,
    spin_conserving=True)

result = optorbssvqe_instance.compute_energies()
print(f"Orbital-optimized energies: {result.eigenvalues} Ha "
      f"(4 spin-orbitals)")
