"""Round-3 flagship probe: H8 cc-pVTZ m=112 -> N=16 on the real TPU.

Runs the determinant-sector two-dispatch FusedOptOrbVQE (the N>=16 path,
CLAUDE.md) with host-chunked eigensolver dispatches so no single compiled
dispatch can exceed the shared worker's long-running-program budget.

Phases are logged with wall timestamps so a crash can be localized
(compile vs iteration k).  Waits for worker health before starting —
the 13:45 round-3 probe launched 58 min after a worker crash and its
failure is not attributable.

Usage: python scripts/probe_h8_n16.py [vqe_chunk] [maxiter] [n_red_so]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def worker_alive(timeout_s=120):
    """Trivial matmul in a child process (a hung tunnel can't wedge us)."""
    prog = ("import numpy as np, jax, jax.numpy as jnp;"
            "x = jnp.ones((256, 256));"
            "print('OK', float(np.asarray(x @ x)[0, 0]))")
    try:
        r = subprocess.run([sys.executable, "-c", prog],
                           capture_output=True, text=True, timeout=timeout_s)
        return "OK 256.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_red_so = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    if chunk <= 0:
        chunk = None

    for attempt in range(30):
        if worker_alive():
            log("worker alive")
            break
        log(f"worker down (probe {attempt + 1}); sleep 60")
        time.sleep(60)
    else:
        log("worker never came back; abort")
        sys.exit(2)

    import jax.numpy as jnp
    from bench import h8_spatial_tensors   # also sets the compile cache
    from esoo_tpu.sim import UCCSD, HartreeFock
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE

    log("building/loading H8 cc-pVTZ MO tensors")
    h_sp, g_sp, parts, e_nn = h8_spatial_tensors()
    parts = (int(parts[0]), int(parts[1]))
    log(f"tensors ready m={h_sp.shape[0]} parts={parts}")

    # one f32 device transfer (630 MB, minutes on the tunnel) shared by
    # the cold and warm solver instances — the ctor's jnp.asarray of an
    # on-device f32 array is a no-op
    import jax
    import numpy as np
    h_dev = jax.device_put(np.asarray(h_sp, np.float32))
    g_dev = jax.device_put(np.asarray(g_sp, np.float32))
    np.asarray(h_dev)  # force materialization before timing
    log("tensors on device")

    n_act = n_red_so // 2
    ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))

    class _P:
        def spatial_integral_tensors(self):
            return h_dev, g_dev

    def cb(it, e, *_):
        log(f"outer iteration {it}: E = {e:.6f}")

    solver = FusedOptOrbVQE(num_spin_orbitals=n_red_so, ansatz=ansatz,
                            problem=_P(), maxiter=maxiter,
                            stopping_tolerance=1e-5, dtype=jnp.float32,
                            simulation="sector", dispatch="two",
                            vqe_chunk=chunk, outer_loop_callback=cb)
    log(f"solver built (sector two-dispatch vqe_chunk={chunk}); cold run")
    t0 = time.perf_counter()
    r = solver.compute_minimum_energy()
    cold = time.perf_counter() - t0
    log(f"COLD DONE E={r.eigenvalue:.6f} iters={r.outer_iterations} "
        f"cold_s={cold:.1f}")

    t0 = time.perf_counter()
    r2 = FusedOptOrbVQE(num_spin_orbitals=n_red_so, ansatz=ansatz,
                        problem=_P(), maxiter=maxiter,
                        stopping_tolerance=1e-5, dtype=jnp.float32,
                        simulation="sector", dispatch="two",
                        vqe_chunk=chunk).compute_minimum_energy()
    warm = time.perf_counter() - t0
    out = dict(energy=r2.eigenvalue, cold_s=round(cold, 2),
               warm_s=round(warm, 2), outer_iters=r2.outer_iterations,
               e_nn=e_nn, simulation="sector", dispatch="two",
               n_red_so=n_red_so, vqe_chunk=chunk)
    print("H8JSON " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
