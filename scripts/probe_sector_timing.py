"""Micro-timing decomposition of the sector eigensolver cost on the TPU.

The H8 m=112 -> N=16 flagship run (sector, dispatch='two', vqe_chunk=50)
completes in ~530 s warm on the v5e, almost all of it in the chunked
L-BFGS advance dispatches.  Each L-BFGS iteration is one value_and_grad
of the sector energy: a K=360-step Givens-bank gate scan (forward +
reverse) over nd=4900 determinant amplitudes plus the sparse quadform.
This probe times each constituent as ONE compiled dispatch containing a
data-dependent repeat chain (amortizing the ~tunnel RTT per dispatch),
so the per-op device cost is isolated from network noise.

All dispatches here are SHORT (seconds) — the class the shared worker
never kills (CLAUDE.md round-3 bisect).

Usage: python scripts/probe_sector_timing.py [n_act] [repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    n_act = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax
    import jax.numpy as jnp
    from esoo_tpu.sim import UCCSD, HartreeFock
    from esoo_tpu.sim.sector import SectorUCC

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    np.asarray(f(x))
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(x))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    log(f"tunnel RTT (median trivial dispatch): {rtt * 1e3:.1f} ms "
        f"— chained ms/op floors at RTT/R")

    parts = (4, 4)
    N = 2 * n_act
    ansatz = UCCSD(n_act, parts, initial_state=HartreeFock(n_act, parts))
    sector = SectorUCC(ansatz, N)
    K = ansatz.num_parameters
    nd = sector.dim
    log(f"N={N} spin orbitals, K={K} excitation gates, nd={nd} determinants")

    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=K) * 0.05, dtype=jnp.float32)
    h_so = rng.normal(size=(N, N))
    h_so = jnp.asarray((h_so + h_so.T) / 2, dtype=jnp.float32)
    g_so = rng.normal(size=(N, N, N, N)) / N
    g_so = jnp.asarray(g_so, dtype=jnp.float32)
    log(f"sector kernel: {sector.kernel}")
    vals = jax.tree_util.tree_map(
        lambda v: jnp.asarray(np.asarray(v)),
        jax.jit(sector.build_values)(h_so, g_so))
    v0 = jnp.asarray(rng.normal(size=nd + 1), dtype=jnp.float32)

    def timed(name, fn, *args, chain=True):
        """Compile, then time one dispatch of an R-long repeat chain."""
        f = jax.jit(fn)
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0])  # compile+warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
            best = min(best, time.perf_counter() - t0)
        per = best / R if chain else best
        log(f"{name:34s} {per * 1e3:9.3f} ms/op   (dispatch {best:.3f} s)")
        return per

    def chain(op):
        """R data-dependent repeats of op(theta-like) in one program."""
        def fn(theta):
            def body(c, _):
                out = op(theta + 1e-9 * c)
                return jnp.sum(out) * 1e-20 if out.ndim else out * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.zeros((), theta.dtype), None,
                                length=R)
            return c
        return fn

    # 1. forward gate scan (state preparation)
    timed("forward state (K-gate scan)", chain(sector.state), theta)

    # 2. full value_and_grad of the sector energy (the L-BFGS iterate)
    def e(th):
        return sector.energy_values(th, vals)
    vag = jax.value_and_grad(e)

    def vag_chain(theta):
        def body(c, _):
            val, g = vag(theta + 1e-9 * c)
            return val * 1e-20 + jnp.sum(g) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.zeros((), theta.dtype), None, length=R)
        return c
    timed("value_and_grad energy", vag_chain, theta)

    # 3. quadform alone (given amplitudes)
    timed("quadform <v|H|v>", chain(lambda v: sector.quadform_values(v, vals)),
          v0)

    # 4. build_values from integrals (per-outer cost, not per-iterate)
    def bv(h):
        leaves = jax.tree_util.tree_leaves(sector.build_values(h, g_so))
        return sum(jnp.sum(x) for x in leaves)
    timed("build_values (per outer)", chain(bv), h_so)

    # 5. isolate the gather: K sequential dense gathers, no FMA
    PARTNER = jnp.asarray(sector._PARTNER)

    def gather_only(v):
        def body(v, k):
            return v[PARTNER[k]], None
        v, _ = jax.lax.scan(body, v, jnp.arange(K), unroll=8)
        return v
    timed("K dense gathers (no FMA)", chain(gather_only), v0)

    # 6. isolate the elementwise part: same scan, no gather
    SFIELD = jnp.asarray(sector._SFIELD, dtype=jnp.float32)

    def ew_only(v):
        def body(v, k):
            return 0.999 * v + SFIELD[k] * v, None
        v, _ = jax.lax.scan(body, v, jnp.arange(K), unroll=8)
        return v
    timed("K elementwise steps (no gather)", chain(ew_only), v0)

    # 6b. unroll sweep on the forward scan: the per-step cost is overhead-
    # bound (N=12 probe: an elementwise-only step costs the same ~20 us as
    # the gather step), so deeper unrolling may amortize it further
    from esoo_tpu.sim.sector import _gate_step
    SF = jnp.asarray(sector._SFIELD, dtype=jnp.float32)

    for unroll in (8, 32, 128, K):
        def fwd_unroll(th, _u=unroll):
            def gate(v, xs):
                partner, sfield, t = xs
                return _gate_step(v, partner, sfield, t), None
            v0 = jnp.zeros(nd + 1, th.dtype).at[sector.init_index].set(1.0)
            v, _ = jax.lax.scan(gate, v0, (PARTNER, SF, th), unroll=_u)
            return v
        timed(f"forward scan unroll={unroll}", chain(fwd_unroll), theta)

    # 6c. sector-native RDM program (per-outer cost)
    def rdm_prog(th):
        gamma, Gamma = sector.rdms(sector.state(th))
        return jnp.sum(gamma) + jnp.sum(Gamma)
    timed("sector RDMs (per outer)", chain(rdm_prog), theta)

    # 6d. the orbital program at the H8 m=112 shape (per-outer cost),
    # only when the disk-cached MO tensors exist
    h8_cache = os.path.expanduser("~/.cache/esoo_jax/h8_ccpvtz_mo.npz")
    if os.path.exists(h8_cache) and N == 16:
        from esoo_tpu.orbital_optimization.fused import _orb_program
        with np.load(h8_cache) as z:
            h_sp = jnp.asarray(z["h_sp"], jnp.float32)
            g_sp = jnp.asarray(z["g_sp"], jnp.float32)
        m = h_sp.shape[0]
        U0 = jnp.asarray(np.eye(m)[:, :n_act], jnp.float32)
        gs = jnp.asarray(rng.normal(size=(n_act, n_act)), jnp.float32)
        gs = (gs + gs.T) / 2
        Gs = jnp.asarray(rng.normal(size=(n_act,) * 4) / n_act, jnp.float32)
        args = (U0, gs, Gs, h_sp, g_sp, jnp.asarray(1e-3, jnp.float32),
                jnp.asarray(1e-5, jnp.float32), jnp.asarray(0.8, jnp.float32))
        np.asarray(_orb_program(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(_orb_program(*args))
            best = min(best, time.perf_counter() - t0)
        log(f"{'orb program m=112 (per outer)':34s} {best:9.3f} s")

    # 7. one production 50-iteration chunked L-BFGS advance dispatch
    from esoo_tpu.solvers.lbfgs import lbfgs_init, lbfgs_advance

    def cost(th, vals):
        return sector.energy_values(th, vals)

    st = jax.jit(lambda x0, vals: lbfgs_init(cost, x0, args=(vals,)))(
        theta, vals)
    adv = jax.jit(lambda st, vals: lbfgs_advance(
        cost, st, num_steps=50, args=(vals,)))
    st2 = adv(st, vals)
    np.asarray(st2.x)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(adv(st, vals).x)
        best = min(best, time.perf_counter() - t0)
    log(f"{'50-iter L-BFGS advance dispatch':34s} {best:9.3f} s "
        f"({best / 50 * 1e3:.1f} ms/iter)")


if __name__ == "__main__":
    main()
