"""Stage-level timing of the H8 m=112 -> N two-dispatch outer iteration:
where do the seconds go at N=24?  Mirrors FusedOptOrbVQE._run_two_dispatch
but times each compiled dispatch (eigensolver init, each chunked L-BFGS
advance, RDM extraction, orbital BB program) separately so the N>=24
optimization target is measured, not guessed (round-3 PERF lesson:
measure before theorizing).

Usage: python scripts/probe_h8_stages.py [n_red_so] [outers] [chunk]
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
    n_red = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    outers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp
    from bench import h8_spatial_tensors
    from esoo_tpu.sim import UCCSD, HartreeFock
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE
    from esoo_tpu.orbital_optimization import fused as F
    from esoo_tpu.orbital_optimization.stiefel import orth

    h_sp, g_sp, parts, _ = h8_spatial_tensors()
    parts = (int(parts[0]), int(parts[1]))
    h_dev = jax.device_put(np.asarray(h_sp, np.float32))
    g_dev = jax.device_put(np.asarray(g_sp, np.float32))
    np.asarray(h_dev)
    log("tensors on device")

    n_act = n_red // 2
    ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))

    class _P:
        def spatial_integral_tensors(self):
            return h_dev, g_dev

    solver = FusedOptOrbVQE(num_spin_orbitals=n_red, ansatz=ansatz,
                            problem=_P(), maxiter=outers,
                            stopping_tolerance=1e-5, dtype=jnp.float32,
                            simulation="sector", dispatch="two",
                            vqe_chunk=chunk, diagnostics=False)
    log(f"solver built (N={n_red}, K={ansatz.num_parameters}, "
        f"nd={solver._sector.dim})")

    dtype = jnp.float32
    state_fn = solver._compiled.state_fn
    T = getattr(solver, "_sector_tables", None)
    if T is None and solver._sector.dim >= F._TABLED_MIN_ND:
        t0 = time.perf_counter()
        T = jax.device_put(solver._sector.device_tables(dtype))
        jax.tree_util.tree_map(lambda a: a.block_until_ready()
                               if hasattr(a, "block_until_ready") else a, T)
        log(f"tables device_put: {time.perf_counter() - t0:.2f}s")

    theta = solver._theta0
    U = orth(solver._U0)
    bb = jnp.asarray(solver.initial_BBstepsize, dtype)
    inner_tol = jnp.asarray(solver.inner_stopping_tolerance, dtype)
    decay = jnp.asarray(solver.decay_factor, dtype)

    for it in range(outers):
        t0 = time.perf_counter()
        state, cost_args = F._eig_chunk_init(state_fn, theta, U,
                                             h_dev, g_dev,
                                             sector=solver._sector,
                                             sector_tables=T)
        state.f.block_until_ready(); float(np.asarray(state.f))
        t_init = time.perf_counter() - t0
        n_disp = 0
        t_adv = 0.0
        prev_it, prev_fev = 0, int(np.asarray(state.nfev))
        while not bool(state.done):
            t0 = time.perf_counter()
            state = F._eig_chunk_advance(state_fn, state, cost_args,
                                         num_steps=chunk,
                                         vqe_maxiter=solver.vqe_maxiter,
                                         sector=solver._sector,
                                         sector_tables=T)
            float(np.asarray(state.f))
            t_adv += time.perf_counter() - t0
            n_disp += 1
            ci, cf = int(np.asarray(state.it)), int(np.asarray(state.nfev))
            log(f"  chunk {n_disp}: +{ci - prev_it} iters "
                f"+{cf - prev_fev} fevs  f={float(np.asarray(state.f)):.7f} "
                f"|g|={float(np.asarray(jnp.max(jnp.abs(state.g)))):.2e}")
            prev_it, prev_fev = ci, cf
        nit = int(np.asarray(state.it))
        nfev = int(np.asarray(state.nfev))
        t0 = time.perf_counter()
        gamma_s, Gamma_s = F._rdm_only_program(state_fn, n_act, state.x,
                                               sector=solver._sector,
                                               sector_tables=T)
        np.asarray(gamma_s)
        t_rdm = time.perf_counter() - t0
        t0 = time.perf_counter()
        U = F._orb_program(U, gamma_s, Gamma_s, h_dev, g_dev,
                           bb, inner_tol, decay,
                           inner_maxiter=solver.inner_maxiter)
        np.asarray(U[0, 0])
        t_orb = time.perf_counter() - t0
        theta = state.x
        log(f"outer {it}: E={float(np.asarray(state.f)):.6f} "
            f"eig_init {t_init:.2f}s + advance {t_adv:.2f}s "
            f"({n_disp} dispatches, {nit} iters, {nfev} fevs, "
            f"{t_adv / max(nit, 1) * 1e3:.0f} ms/iter) + rdm {t_rdm:.2f}s "
            f"+ orb {t_orb:.2f}s")


if __name__ == "__main__":
    main()
