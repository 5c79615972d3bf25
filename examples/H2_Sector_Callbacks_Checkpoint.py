"""Round-2 capabilities on the fused fast path: particle-number-sector
simulation, live outer-loop callbacks, and checkpoint/resume.

Framework-specific (no reference counterpart):

  * `simulation='sector'` runs the UCC eigensolver in the C(n,na)*C(n,nb)
    determinant sector — gates are gather-only Givens rotation banks, the
    energy is one dense sector-Hamiltonian GEMV, and the RDMs come
    straight from sector amplitudes, so the 2^N space is never touched.
    Exactly equal to the full simulator (tests/test_sector.py).
  * `outer_loop_callback=` fires live per outer iteration from INSIDE the
    single compiled program (jax.debug.callback) — observability without
    giving up one-dispatch.
  * `checkpoint_dir=` writes a resumable .npz per outer iteration through
    the same mechanism; `resume_from=` warm-starts (U, theta).
"""

import glob
import os
import tempfile

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.orbital_optimization import FusedOptOrbVQE

problem = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="6-31g").run()
ansatz = UCCSD(2, problem.num_particles,
               initial_state=HartreeFock(2, problem.num_particles))

checkpoint_dir = tempfile.mkdtemp(prefix="esoo_ck_")


def monitor(iteration, energy):
    print(f"  outer iteration {iteration}: E = {energy:.8f} Ha")


result = FusedOptOrbVQE(
    num_spin_orbitals=4,
    ansatz=ansatz,
    problem=problem,
    maxiter=20,
    simulation="sector",
    outer_loop_callback=monitor,
    checkpoint_dir=checkpoint_dir,
).compute_minimum_energy()

print("converged:", result.eigenvalue, "Ha in", result.outer_iterations,
      "outer iterations")

checkpoints = sorted(glob.glob(os.path.join(checkpoint_dir, "*.npz")))
print("checkpoints written:", len(checkpoints))

# resume from the last checkpoint: warm-started (U, theta) converge
# immediately at (or below) the original optimum
resumed = FusedOptOrbVQE(
    num_spin_orbitals=4,
    ansatz=ansatz,
    problem=problem,
    maxiter=20,
    simulation="sector",
    resume_from=checkpoints[-1],
).compute_minimum_energy()
print("resumed:", resumed.eigenvalue, "Ha in", resumed.outer_iterations,
      "outer iterations")
