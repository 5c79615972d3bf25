"""Flagship probe: H8 cc-pVTZ m=112 -> N CASSCF on the real TPU.

FusedOptOrbCASSCF replaces the UCC eigensolver with exact Davidson
diagonalization of the determinant sector (no K-gate scan at all), so
the per-outer-iteration device work collapses to ~max_subspace string
sigma GEMMs + the orbital BB program.  Expected: the same N=20/24
shapes that take 138 s / 1,406 s warm with the string-UCC kernels run
in a fraction of that, at strictly LOWER (exact) active-space energies.

dispatch='two' keeps every compiled dispatch short (the shared worker's
documented kill is dispatch-length-bound) and logs live progress.

Usage: python scripts/probe_h8_casscf.py [maxiter] [n_red_so] [storage] [k] [tol] [ladder]

storage: 'auto' (default; compact int8-chunked stacks past nd=1.1M —
i.e. N>=32), 'dense', or 'compact' — the N=32 3.31M-determinant sector
only fits one v5e's 16 GB HBM via 'compact'.
k: number of states (default 1 = ground-state FusedOptOrbCASSCF;
k > 1 runs the state-averaged FusedOptOrbSACASSCF exact ladder).
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
    maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_red_so = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    storage = sys.argv[3] if len(sys.argv) > 3 else "auto"
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    tol = float(sys.argv[5]) if len(sys.argv) > 5 else 1e-5
    ladder = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False

    for attempt in range(30):
        if worker_alive():
            log("worker alive")
            break
        log(f"worker down (probe {attempt + 1}); sleep 60")
        time.sleep(60)
    else:
        log("worker never came back; abort")
        sys.exit(2)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import h8_spatial_tensors   # also sets the compile cache
    from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,
                                               FusedOptOrbSACASSCF)

    log("building/loading H8 cc-pVTZ MO tensors")
    h_sp, g_sp, parts, e_nn = h8_spatial_tensors()
    parts = (int(parts[0]), int(parts[1]))
    log(f"tensors ready m={h_sp.shape[0]} parts={parts}")

    h_dev = jax.device_put(np.asarray(h_sp, np.float32))
    g_dev = jax.device_put(np.asarray(g_sp, np.float32))
    np.asarray(h_dev)  # force materialization before timing
    log("tensors on device")

    class _P:
        num_particles = parts

        def spatial_integral_tensors(self):
            return h_dev, g_dev

    def cb(it, e, *_):
        log(f"outer iteration {it}: E = "
            f"{np.array2string(np.asarray(e), precision=6)}")

    log(f"solver config: CASSCF two-dispatch N={n_red_so} "
        f"storage={storage} k={k}; cold run")

    def energy_of(res):
        if k > 1:
            return [float(e) for e in np.asarray(res.eigenvalues)]
        return res.eigenvalue

    solver_holder = {}

    def run(callback=None):
        if k > 1:
            s = FusedOptOrbSACASSCF(
                num_spin_orbitals=n_red_so, k=k, problem=_P(),
                maxiter=maxiter, stopping_tolerance=tol,
                dtype=jnp.float32, dispatch="two",
                table_storage=storage,
                # bounded eigensolver dispatches: the monolithic k=3
                # N=32 solve is a multi-minute dispatch -> worker kill
                davidson_chunk=8,
                davidson_tol_ladder=ladder,
                outer_loop_callback=callback)
            solver_holder["s"] = s
            return s.compute_energies()
        s = FusedOptOrbCASSCF(
            num_spin_orbitals=n_red_so, problem=_P(), maxiter=maxiter,
            stopping_tolerance=tol, dtype=jnp.float32, dispatch="two",
            table_storage=storage,
            outer_loop_callback=callback)
        solver_holder["s"] = s
        return s.compute_minimum_energy()

    def stage_report(tag):
        st = getattr(solver_holder.get("s"), "stage_stats", None)
        if not st or not st["davidson_iters"]:
            return None
        log(f"{tag} stage profile: davidson_iters={st['davidson_iters']} "
            f"solve_s={[round(x, 1) for x in st['solve_s']]} "
            f"finish_s={[round(x, 1) for x in st['finish_s']]} "
            f"orb_s={[round(x, 1) for x in st['orb_s']]}")
        return {kk: ([round(x, 2) for x in vv] if kk != "davidson_iters"
                     else vv) for kk, vv in st.items()}

    t0 = time.perf_counter()
    r = run(callback=cb)
    cold = time.perf_counter() - t0
    log(f"COLD DONE E={energy_of(r)} iters={r.outer_iterations} "
        f"cold_s={cold:.1f}")
    stage_report("cold")

    t0 = time.perf_counter()
    r2 = run()
    warm = time.perf_counter() - t0
    out = dict(energy=energy_of(r2), cold_s=round(cold, 2),
               warm_s=round(warm, 2), outer_iters=r2.outer_iterations,
               e_nn=e_nn, solver="casscf" if k == 1 else f"sa-casscf-k{k}",
               dispatch="two", n_red_so=n_red_so, table_storage=storage,
               stopping_tolerance=tol,
               davidson_tol_ladder=ladder)
    stages = stage_report("warm")
    if stages is not None:
        out["stage_stats"] = stages
    print("H8JSON " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
