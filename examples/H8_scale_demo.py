"""Production-scale demonstration: H8 chain, cc-pVTZ (224 spin orbitals)
reduced to 16 spin orbitals.

No reference counterpart — the reference tops out at H4 (examples/H4_*.py).
This configuration exercises the design choices that exist for scale:
spatial-direct ingestion (the spin-orbital tensor would be 20 GB; the
spatial one is 1.26 GB), the string-factorized determinant-sector
simulator (the default, simulation='auto'), and the one-dispatch fused
loop.  Pass a TPU mesh via FusedOptOrbVQE(mesh=...) to shard the g
tensor.

On the shared-TPU backend, the measured production configuration for
this shape is dispatch='two', vqe_chunk=50 (bounded per-dispatch work;
the shared worker kills any single long-running dispatch): with the
string kernels it runs N=16 in 35.6 s cold / 28.1 s warm, N=20 in
208 s / 138 s, and N=24 in ~25 min on a v5e with no worker fault —
docs/PERF.md "Refined picture".  The defaults below are the right
choice on CPU and for dedicated (non-shared) TPU backends.
"""

import time

import jax.numpy as jnp
import numpy as np

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.orbital_optimization import FusedOptOrbVQE

bond = 1.23
t0 = time.perf_counter()
problem = MoleculeDriver(
    atom="; ".join(f"H 0 0 {n * bond}" for n in range(8)),
    basis="cc-pVTZ").run()
print(f"integrals + RHF: {time.perf_counter() - t0:.0f}s  "
      f"M={problem.num_spin_orbitals}  RHF={problem.scf.energy_total:.6f}")

num_reduced_spin_orbitals = 16
ansatz = UCCSD(num_reduced_spin_orbitals // 2, problem.num_particles,
               initial_state=HartreeFock(num_reduced_spin_orbitals // 2,
                                         problem.num_particles))
print(f"UCCSD: {ansatz.num_parameters} parameters, "
      f"{len(ansatz.gates)} gates")

solver = FusedOptOrbVQE(num_spin_orbitals=num_reduced_spin_orbitals,
                        ansatz=ansatz, problem=problem,
                        maxiter=6, stopping_tolerance=1e-4,
                        dtype=jnp.float32, vqe_maxiter=120)
t0 = time.perf_counter()
result = solver.compute_minimum_energy()
print(f"fused OptOrbVQE: {time.perf_counter() - t0:.0f}s, "
      f"{result.outer_iterations} outer iterations")
print("energy trajectory:",
      [f"{e:.5f}" for e in result.energy_convergence_list])
print(f"orbital-optimized electronic energy: {result.eigenvalue:.6f} Ha "
      f"({num_reduced_spin_orbitals} spin orbitals)")
print(f"RHF electronic reference: "
      f"{problem.scf.energy_electronic:.6f} Ha")
