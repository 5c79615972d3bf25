"""Post-line-search-fix scale probes (round 4):

  (a) H8 m=112 -> N=28 string-UCC ground state — a 1,002,001-determinant
      UCC eigensolver loop (the round-3 ladder stopped at N=24 because
      saturated f32 line searches made it hours-scale).
  (b) H8 m=112 -> N=20 fused SSVQE k=2 — excited states through the UCC
      sector path at 44,100 determinants.

Usage: python scripts/probe_h8_n28_excited.py [a|b|ab] [maxiter]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp
    from bench import h8_spatial_tensors
    from esoo_tpu.sim import UCCSD, HartreeFock

    h_sp, g_sp, parts, _ = h8_spatial_tensors()
    parts = (int(parts[0]), int(parts[1]))
    h_dev = jax.device_put(np.asarray(h_sp, np.float32))
    g_dev = jax.device_put(np.asarray(g_sp, np.float32))
    np.asarray(h_dev)
    log("tensors on device")

    class _P:
        def spatial_integral_tensors(self):
            return h_dev, g_dev

    if "a" in which:
        from esoo_tpu.orbital_optimization import FusedOptOrbVQE
        n_red = 28
        n_act = n_red // 2
        ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))
        log(f"N=28 UCC: K={ansatz.num_parameters}")

        def make():
            return FusedOptOrbVQE(num_spin_orbitals=n_red, ansatz=ansatz,
                                  problem=_P(), maxiter=maxiter,
                                  stopping_tolerance=1e-5,
                                  dtype=jnp.float32, simulation="sector",
                                  dispatch="two", vqe_chunk=50,
                                  diagnostics=False)

        t0 = time.perf_counter()
        r = make().compute_minimum_energy()
        cold = time.perf_counter() - t0
        log(f"N=28 UCC cold {cold:.1f}s E={float(r.eigenvalue):.6f} "
            f"({r.outer_iterations} outers)")
        t0 = time.perf_counter()
        r = make().compute_minimum_energy()
        warm = time.perf_counter() - t0
        log(f"N=28 UCC warm {warm:.1f}s E={float(r.eigenvalue):.6f} "
            f"({r.outer_iterations} outers)")

    if "b" in which:
        from esoo_tpu.orbital_optimization import FusedOptOrbSSVQE
        from esoo_tpu.sim import QuantumCircuit
        n_red = 20
        n_act = n_red // 2
        na, nb = parts
        ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))
        # second init: HOMO->LUMO alpha single (orthogonal determinant)
        init1 = QuantumCircuit(2 * n_act)
        for q in list(range(na - 1)) + [na]:
            init1.x(q)
        for q in range(n_act, n_act + nb):
            init1.x(q)
        inits = [HartreeFock(n_act, parts), init1]
        log(f"N=20 SSVQE k=2: K={ansatz.num_parameters}")

        def make():
            # NOTE: vqe_chunk is a FusedOptOrbVQE-only knob; with the
            # round-4 plateau stops the SSVQE eigensolver dispatch is
            # short enough to stay under the worker's dispatch budget
            return FusedOptOrbSSVQE(num_spin_orbitals=n_red, ansatz=ansatz,
                                    initial_states=inits,
                                    weight_vector=[2.0, 1.0],
                                    problem=_P(), maxiter=maxiter,
                                    stopping_tolerance=1e-5,
                                    dtype=jnp.float32, simulation="sector",
                                    dispatch="two",
                                    diagnostics=False)

        t0 = time.perf_counter()
        r = make().compute_energies()
        cold = time.perf_counter() - t0
        log(f"N=20 SSVQE cold {cold:.1f}s E={np.asarray(r.eigenvalues)}")
        t0 = time.perf_counter()
        r = make().compute_energies()
        warm = time.perf_counter() - t0
        log(f"N=20 SSVQE warm {warm:.1f}s E={np.asarray(r.eigenvalues)}")


if __name__ == "__main__":
    main()
