"""Probe: value_and_grad cost of the string-kernel L-BFGS iterate
(quadform of the gate scan) at the H8 active-space shapes — measures
the batched-backward optimization (one permutation-sandwich GEMM pair
per gate instead of three; sim/strings.py::_apply_rev_str_bwd).

Usage: python scripts/probe_scan_bwd.py [n_spatial ...] [--cpu]
Defaults: n = 8 10 12 (N = 16 20 24), parts (4, 4).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.sim import strings as S
from esoo_tpu.sim.sector import SectorUCC

NS = [int(a) for a in args] or [8, 10, 12]


def run(n, parts=(4, 4), reps=5):
    t0 = time.perf_counter()
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec = SectorUCC(ansatz, 2 * n, kernel="strings")
    st = sec._str_tabs
    nA, nB = len(st.A), len(st.B)
    K = ansatz.num_parameters
    tabs = {k: jnp.asarray(v) for k, v in st._asdict().items()}
    rng = np.random.default_rng(0)
    h = rng.normal(size=(2 * n, 2 * n)); h = (h + h.T) / 2
    g0 = rng.normal(size=(2 * n,) * 4)
    g = (g0 + g0.transpose(1, 0, 3, 2) + g0.transpose(2, 3, 0, 1)
         + g0.transpose(3, 2, 1, 0)) / 8
    ops = S.build_ops(jnp.asarray(h, jnp.float32),
                      jnp.asarray(g, jnp.float32), tabs)
    V0 = jnp.zeros((nB, nA), jnp.float32).at[0, 0].set(1.0)
    th = jnp.asarray(rng.normal(size=K) * 0.05, jnp.float32)
    build_s = time.perf_counter() - t0

    # tables/ops/state as ARGUMENTS (device buffers): baked constants of
    # this size break the remote-compile transport (CLAUDE.md gotcha).
    # The VAG is CHAINED (data-dependent scan) so per-iterate cost is
    # isolated from the ~27 ms tunnel RTT of a single dispatch.
    iters = max(2, min(20, 40_000_000 // (nA * nB * K // 100 + 1)))

    @jax.jit
    def chain(t, v0, tb, op):
        def body(carry, _):
            v, gr = jax.value_and_grad(
                lambda tt: S.quadform(S.apply_gates(v0, tt, tb),
                                      op, tb))(carry)
            return carry + 1e-9 * gr, v
        tfin, vs = jax.lax.scan(body, t, None, length=iters)
        return vs[-1]

    tabs = jax.device_put(tabs)
    ops = jax.device_put(ops)
    V0 = jax.device_put(V0)
    t0 = time.perf_counter()
    v = float(np.asarray(chain(th, V0, tabs, ops)))
    cold = time.perf_counter() - t0
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        v2 = chain(th + 1e-6 * i, V0, tabs, ops)
        np.asarray(v2)
        ts.append(time.perf_counter() - t0)
    warm = min(ts) / iters
    print(f"n={n} N={2*n} nA={nA} nd={nA*nB} K={K} chain={iters}: "
          f"build {build_s:.1f}s cold {cold:.2f}s "
          f"warm/iterate(min of {reps}) {warm*1e3:.1f} ms "
          f"({warm/K*1e6:.1f} us/gate)  value={v:.6f}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for n in NS:
        run(n)
