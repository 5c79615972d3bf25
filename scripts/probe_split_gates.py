"""Probe: the PRODUCTION string gate scan + quadform VAG with the
exact bf16-split kernels forced on vs off (ops/split_precision.py), at
the H8 active-space shapes.  Isolates (a) forward scan, (b) full
value_and_grad, per gate.

Run ON the TPU: python scripts/probe_split_gates.py [n_spatial ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from esoo_tpu.utils import xla_cache  # noqa: E402

xla_cache.setup(jax)

import esoo_tpu  # noqa: E402,F401
from esoo_tpu.ops import split_precision as sp  # noqa: E402
from esoo_tpu.sim import HartreeFock, UCCSD  # noqa: E402
from esoo_tpu.sim import strings as S  # noqa: E402
from esoo_tpu.sim.sector import SectorUCC  # noqa: E402

NS = [int(a) for a in sys.argv[1:]] or [10, 12]


def run(n, parts=(4, 4), reps=3):
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
    iters = max(2, min(20, 40_000_000 // (nA * nB * K // 100 + 1)))

    def chain_fwd(t, v0, tb):
        def body(carry, _):
            V = S.apply_gates(v0, carry, tb)
            return carry + 1e-12 * jnp.sum(V * V), jnp.sum(V)
        tf, vs = jax.lax.scan(body, t, None, length=iters)
        return vs[-1]

    def chain_vag(t, v0, tb, op):
        def body(carry, _):
            v, gr = jax.value_and_grad(
                lambda tt: S.quadform(S.apply_gates(v0, tt, tb),
                                      op, tb))(carry)
            return carry + 1e-9 * gr, v
        tfin, vs = jax.lax.scan(body, t, None, length=iters)
        return vs[-1]

    for mode in (False, True):
        sp.force_split(mode)
        jf = jax.jit(chain_fwd)
        jv = jax.jit(chain_vag)
        label = "split" if mode else "highest"
        for nm, fn, args in (("fwd", jf, (th, V0, tabs)),
                             ("vag", jv, (th, V0, tabs, ops))):
            np.asarray(fn(*args))
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                ts.append(time.perf_counter() - t0)
            per = min(ts) / iters
            print(f"n={n} N={2*n} K={K} {label:7s} {nm}: "
                  f"{per*1e3:7.2f} ms/iter ({per/K*1e6:6.1f} us/gate)",
                  flush=True)
    sp.force_split(None)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for n in NS:
        run(n)
