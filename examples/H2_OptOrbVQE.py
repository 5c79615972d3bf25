"""OptOrbVQE on H2: 6-31G starting basis reduced to 4 spin orbitals.

Mirrors the reference example examples/H2_OptOrbVQE.py (imports swapped to
the TPU-native stack; the solver API is the same).
"""

from time import perf_counter

import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.ops import JordanWignerMapper
from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
from esoo_tpu.solvers import L_BFGS_B, VQE
from esoo_tpu.orbital_optimization import (OptOrbVQE,
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

outer_iteration = 0
vqe_start_time = perf_counter()


def vqe_callback(eval_count, parameters, mean, std):
    global vqe_start_time
    print(f"Outer loop iteration: {outer_iteration}, function evaluation: "
          f"{eval_count}, energy: {mean}, "
          f"time = {perf_counter() - vqe_start_time}")
    vqe_start_time = perf_counter()


orbital_rotation_start_time = perf_counter()


def orbital_rotation_callback(orbital_rotation_iteration, energy):
    global orbital_rotation_start_time
    print(f"Outer loop iteration: {outer_iteration}, Iteration: "
          f"{orbital_rotation_iteration}, energy: {energy}, "
          f"time: {perf_counter() - orbital_rotation_start_time}")
    orbital_rotation_start_time = perf_counter()


def outer_loop_callback(optorb_iteration, vqe_result, optorb_result):
    global outer_iteration
    outer_iteration += 1


partial_unitary_optimizer = PartialUnitaryProjectionOptimizer(
    initial_BBstepsize=10**-3,
    stopping_tolerance=10**-5,
    maxiter=10000,
    gradient_method="autograd",
    callback=orbital_rotation_callback)

vqe_instance = VQE(ansatz=ansatz,
                   initial_point=np.zeros(ansatz.num_parameters),
                   optimizer=L_BFGS_B(),
                   estimator=estimator,
                   callback=vqe_callback)

optorbvqe_instance = OptOrbVQE(num_spin_orbitals=num_reduced_spin_orbitals,
                               ground_state_solver=vqe_instance,
                               mapper=mapper,
                               estimator=estimator,
                               partial_unitary_optimizer=partial_unitary_optimizer,
                               problem=q_molecule,
                               maxiter=20,
                               wavefuntion_real=True,
                               spin_conserving=True,
                               outer_loop_callback=outer_loop_callback)

ground_state_energy_result = optorbvqe_instance.compute_minimum_energy()
print(f"Orbital-optimized ground state energy: "
      f"{ground_state_energy_result.eigenvalue} Ha (4 spin-orbitals)")
print(f"Ground state energy in STO-3G basis: {-1.85727503} Ha "
      f"(4 spin-orbitals)")
