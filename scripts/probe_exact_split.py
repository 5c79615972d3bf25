"""Micro-probe: permutation-sandwich GEMM variants at the H8 N=24 string
shape (ns=495).  The round-4 exact-split kernels (ops/split_precision.py)
measured SLOWER than `highest` in the full VAG probe (85.3 vs 46.9
us/gate) despite halving the nominal MXU passes — this isolates where
the lowering goes wrong and which formulation of the exact 3-pass
product the TPU actually executes fast.

Variants (all computing EB @ V @ EA^T, EA/EB one-hot):
  highest      f32 dots under the global 'highest' default (status quo)
  default_f32  f32 dots, precision=DEFAULT (1 bf16 pass, LOSSY baseline
               for V generic — here V's parts make it exact, see split*)
  split_bf16   explicit bf16 part arrays, wide concat (current impl)
  split_f32    parts kept as f32 arrays, wide concat, precision=DEFAULT
               (XLA converts tiles to bf16 in VMEM — no explicit bf16
               buffers; exact because each part IS bf16-valued)
  split_sep    parts as f32, three separate DEFAULT dots per side

Run ON the TPU: python scripts/probe_exact_split.py [ns] [iters]
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

import esoo_tpu  # noqa: E402,F401  (forces highest matmul precision)

NS = int(sys.argv[1]) if len(sys.argv) > 1 else 495
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
DEF = jax.lax.Precision.DEFAULT


def split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(x.dtype)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def sandwich_highest(V, EA, EB):
    return EB @ V @ EA.T


def sandwich_default(V, EA, EB):
    t = jax.lax.dot_general(V, EA, (((1,), (1,)), ((), ())), precision=DEF)
    return jax.lax.dot_general(EB, t, (((1,), (0,)), ((), ())),
                               precision=DEF)


def _mmT_wide(X, E, cast):
    h, m, l = split3(X)
    if not cast:
        h, m, l = (p.astype(X.dtype) for p in (h, m, l))
    X3 = jnp.concatenate([h, m, l], axis=0)
    Y3 = jax.lax.dot_general(X3, E if cast else E.astype(X.dtype),
                             (((1,), (1,)), ((), ())), precision=DEF,
                             preferred_element_type=X.dtype)
    n = X.shape[0]
    return Y3[:n] + Y3[n:2 * n] + Y3[2 * n:]


def _mm_wide(E, X, cast):
    h, m, l = split3(X)
    if not cast:
        h, m, l = (p.astype(X.dtype) for p in (h, m, l))
    X3 = jnp.concatenate([h, m, l], axis=1)
    Y3 = jax.lax.dot_general(E if cast else E.astype(X.dtype), X3,
                             (((1,), (0,)), ((), ())), precision=DEF,
                             preferred_element_type=X.dtype)
    n = X.shape[1]
    return Y3[:, :n] + Y3[:, n:2 * n] + Y3[:, 2 * n:]


def sandwich_split_bf16(V, EA, EB):
    return _mm_wide(EB.astype(jnp.bfloat16),
                    _mmT_wide(V, EA.astype(jnp.bfloat16), True), True)


def sandwich_split_f32(V, EA, EB):
    return _mm_wide(EB, _mmT_wide(V, EA, False), False)


def sandwich_split_sep(V, EA, EB):
    def mmT(X, E):
        acc = None
        for p in split3(X):
            y = jax.lax.dot_general(p.astype(X.dtype), E,
                                    (((1,), (1,)), ((), ())),
                                    precision=DEF)
            acc = y if acc is None else acc + y
        return acc

    def mm(E, X):
        acc = None
        for p in split3(X):
            y = jax.lax.dot_general(E, p.astype(X.dtype),
                                    (((1,), (0,)), ((), ())),
                                    precision=DEF)
            acc = y if acc is None else acc + y
        return acc

    return mm(EB, mmT(V, EA))


def timed(fn, V, EA, EB):
    @jax.jit
    def chain(V):
        def body(carry, _):
            out = fn(carry, EA, EB)
            return out / jnp.max(jnp.abs(out)), None
        out, _ = jax.lax.scan(body, V, None, length=ITERS)
        return out

    r = np.asarray(chain(V))          # compile + run
    t0 = time.perf_counter()
    r = np.asarray(chain(V))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, r


def main():
    print(f"backend: {jax.default_backend()}  ns={NS} iters={ITERS}",
          flush=True)
    rng = np.random.default_rng(0)
    perm_a = rng.permutation(NS)
    perm_b = rng.permutation(NS)
    EA = jnp.asarray(np.eye(NS, dtype=np.float32)[perm_a])
    EB = jnp.asarray(np.eye(NS, dtype=np.float32)[perm_b])
    V = jnp.asarray(rng.normal(size=(NS, NS)), jnp.float32)
    V = V / jnp.max(jnp.abs(V))
    ref64 = None
    V64 = np.asarray(V, np.float64)
    ref64 = np.eye(NS)[perm_b] @ V64 @ np.eye(NS)[perm_a].T

    for name, fn in [("highest", sandwich_highest),
                     ("default_f32", sandwich_default),
                     ("split_bf16", sandwich_split_bf16),
                     ("split_f32", sandwich_split_f32),
                     ("split_sep", sandwich_split_sep)]:
        one = np.asarray(fn(V, EA, EB))
        err = np.abs(one - ref64).max()
        dt, _ = timed(fn, V, EA, EB)
        print(f"{name:12s} {dt * 1e6:8.1f} us/sandwich  "
              f"one-shot err vs f64: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
