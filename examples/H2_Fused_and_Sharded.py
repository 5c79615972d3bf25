"""Production fast paths beyond the reference's API: the one-dispatch fused
solvers and the mesh-sharded inner loop.

Framework-specific capabilities (no reference counterpart): the entire
OptOrb outer loop compiles to a single XLA program, and for starting bases
beyond one chip's HBM the two-electron tensor shards over a device mesh.
"""

import numpy as np

import jax

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.sim import Estimator, HartreeFock, QuantumCircuit, UCCSD
from esoo_tpu.solvers import VQE, JaxBFGS
from esoo_tpu.orbital_optimization import (FusedOptOrbSSVQE, FusedOptOrbVQE,
                                           OptOrbVQE,
                                           PartialUnitaryProjectionOptimizer)
from esoo_tpu.parallel import make_orbital_mesh

problem = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="cc-pVTZ").run()
num_particles = problem.num_particles
n_red = 4

ansatz = UCCSD(n_red // 2, num_particles,
               initial_state=HartreeFock(n_red // 2, num_particles))

# --- 1. whole run in ONE device dispatch --------------------------------
fused = FusedOptOrbVQE(num_spin_orbitals=n_red, ansatz=ansatz,
                       problem=problem, maxiter=20)
result = fused.compute_minimum_energy()
print(f"FusedOptOrbVQE:  {result.eigenvalue:.10f} Ha "
      f"in {result.outer_iterations} outer iterations (one dispatch)")

# --- 2. excited states, also one dispatch --------------------------------
ssvqe_ansatz = UCCSD(n_red // 2, num_particles, reps=2)
excited_HF = QuantumCircuit(n_red)
excited_HF.x(1)
excited_HF.x(2)
fused_ss = FusedOptOrbSSVQE(
    num_spin_orbitals=n_red, ansatz=ssvqe_ansatz,
    initial_states=[HartreeFock(n_red // 2, num_particles), excited_HF],
    weight_vector=[2, 1], problem=problem, maxiter=20)
print("FusedOptOrbSSVQE:", fused_ss.compute_energies().eigenvalues, "Ha")

# --- 3. class-based solver with a sharded inner loop ----------------------
# (on one chip the mesh is trivial; on a pod slice the m^4 tensor splits
#  across devices with a single n^4 psum per energy evaluation)
mesh = make_orbital_mesh(min(2, len(jax.devices())))
vqe = VQE(Estimator(), ansatz, JaxBFGS(),
          initial_point=np.zeros(ansatz.num_parameters))
sharded = OptOrbVQE(
    num_spin_orbitals=n_red, ground_state_solver=vqe,
    partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
        1e-3, 1e-5, 10000),
    problem=problem, maxiter=20, mesh=mesh)
print(f"OptOrbVQE (mesh={mesh.shape}):",
      sharded.compute_minimum_energy().eigenvalue, "Ha")
