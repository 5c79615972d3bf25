"""OptOrbVQD on H2: deflation-based two states, 6-31G -> 4 spin orbitals.

Mirrors the reference example examples/H2_OptOrbVQD.py (per-state ansatz
extension included).
"""

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.ops import JordanWignerMapper
from esoo_tpu.sim import (ComputeUncompute, Estimator, HartreeFock,
                          QuantumCircuit, Sampler, UCCSD)
from esoo_tpu.solvers import L_BFGS_B, VQD
from esoo_tpu.orbital_optimization import (OptOrbVQD,
                                           PartialUnitaryProjectionOptimizer)

estimator = Estimator(approximation=True)
fidelity = ComputeUncompute(Sampler(shots=None))
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

ansatz_list = [
    UCCSD(num_spatial_orbitals=num_reduced_spin_orbitals // 2,
          num_particles=num_particles, reps=2, initial_state=state)
    for state in (HF_state, excited_HF)
]

partial_unitary_optimizer = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=10**-3, stopping_tolerance=10**-5, maxiter=10000)

vqd_instance = VQD(estimator=estimator,
                   fidelity=fidelity,
                   ansatz=ansatz_list,
                   optimizer=L_BFGS_B(),
                   k=k,
                   betas=[2, 2],
                   initial_point=[np.zeros(a.num_parameters)
                                  for a in ansatz_list])

optorbvqd_instance = OptOrbVQD(
    num_spin_orbitals=num_reduced_spin_orbitals,
    excited_states_solver=vqd_instance,
    mapper=mapper,
    estimator=estimator,
    partial_unitary_optimizer=partial_unitary_optimizer,
    problem=q_molecule,
    maxiter=20,
    wavefuntion_real=True,
    spin_conserving=True)

result = optorbvqd_instance.compute_energies()
print(f"Orbital-optimized energies: {result.eigenvalues} Ha "
      f"(4 spin-orbitals)")
