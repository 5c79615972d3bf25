"""Why does the m=120 transform sit at ~390 GB/s (~48% of the v5e's
819 GB/s HBM peak)?  Round-3 verdict item 4: try precision tiers
(DEFAULT = 1-pass bf16, HIGH = 3-pass, HIGHEST = 6-pass) and a
lane-padded kron (n^2 -> 128 output columns) at m=120 n=8, forward only.
If HIGHEST's operand decomposition is the bandwidth hog, DEFAULT should
land near the 1.01 ms one-read floor.

Run ON the TPU: python scripts/probe_transform_precision.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from esoo_tpu.utils import xla_cache  # noqa: E402

xla_cache.setup(jax)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import esoo_tpu  # noqa: E402,F401  (forces highest matmul precision)

M, N = 120, 8
ITERS = 30


def timed(fn, g, u):
    @jax.jit
    def chain(g, u, s):
        def body(carry, _):
            out = fn(g, u + 1e-9 * carry)
            return jnp.sum(out * out) * 1e-20, None
        s, _ = jax.lax.scan(body, s, None, length=ITERS)
        return s

    s = jnp.zeros((), dtype=u.dtype)
    np.asarray(chain(g, u, s))
    t0 = time.perf_counter()
    np.asarray(chain(g, u, s))
    return (time.perf_counter() - t0) / ITERS


def kron_prec(prec):
    def fn(g, u):
        m, n = g.shape[0], u.shape[1]
        W = jnp.einsum("pi,qj->pqij", u, u).reshape(m * m, n * n)
        G2 = g.reshape(m * m, m * m)
        t = jax.lax.dot_general(G2, W, (((1,), (0,)), ((), ())),
                                precision=prec)
        out = jax.lax.dot_general(W, t, (((0,), (0,)), ((), ())),
                                  precision=prec)
        return out.reshape(n, n, n, n)
    return fn


def kron_padded(prec, width=128):
    """W zero-padded to `width` output columns: junk FLOPs, but the MXU
    streams g against a full 128-lane tile."""
    def fn(g, u):
        m, n = g.shape[0], u.shape[1]
        W = jnp.einsum("pi,qj->pqij", u, u).reshape(m * m, n * n)
        W = jnp.pad(W, ((0, 0), (0, width - n * n)))
        G2 = g.reshape(m * m, m * m)
        t = jax.lax.dot_general(G2, W, (((1,), (0,)), ((), ())),
                                precision=prec)
        out = jax.lax.dot_general(W, t, (((0,), (0,)), ((), ())),
                                  precision=prec)
        return out[: n * n, : n * n].reshape(n, n, n, n)
    return fn


def _split2(a):
    """f32 -> (hi, lo) bf16 pair with a == hi + lo to ~2^-16 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def kron_presplit(g_hi, g_lo):
    """bf16x3-equivalent with the g splits PRECOMPUTED as device arrays:
    out = g_hi W_hi + g_hi W_lo + g_lo W_hi (the g_lo W_lo term is
    ~2^-32 relative, dropped).  Floor: 3 bf16 g-operand reads = 1.24 GB
    at m=120 — tests whether XLA's HIGH pays avoidable split overhead."""
    def fn(_, u):
        m, n = g_hi.shape[0], u.shape[1]
        W = jnp.einsum("pi,qj->pqij", u, u).reshape(m * m, n * n)
        W_hi, W_lo = _split2(W)
        G2h = g_hi.reshape(m * m, m * m)
        G2l = g_lo.reshape(m * m, m * m)
        dot = lambda A, B: jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        t = dot(G2h, W_hi) + dot(G2h, W_lo) + dot(G2l, W_hi)
        t_hi, t_lo = _split2(t)
        dot2 = lambda A, B: jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        out = dot2(W_hi, t_hi) + dot2(W_hi, t_lo) + dot2(W_lo, t_hi)
        return out.reshape(n, n, n, n)
    return fn


def main():
    print(f"backend: {jax.default_backend()}  m={M} n={N}", flush=True)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(M,) * 4) / M, dtype=jnp.float32)
    u = jnp.asarray(np.linalg.qr(rng.normal(size=(M, N)))[0],
                    dtype=jnp.float32)
    hbm = 4.0 * M**4
    P = jax.lax.Precision
    ref = np.asarray(kron_prec(P.HIGHEST)(g, u))
    g_hi, g_lo = jax.device_put(_split2(g))
    rows = []
    import os as _os
    sel = _os.environ.get("PROBE_VARIANTS", "all")
    allv = [
        ("kron HIGHEST", kron_prec(P.HIGHEST)),
        ("kron HIGH", kron_prec(P.HIGH)),
        ("kron DEFAULT", kron_prec(P.DEFAULT)),
        ("kron presplit bf16x3", kron_presplit(g_hi, g_lo)),
        ("kron HIGHEST pad128", kron_padded(P.HIGHEST)),
        ("kron HIGH pad128", kron_padded(P.HIGH)),
        ("kron HIGHEST pad256", kron_padded(P.HIGHEST, 256)),
    ]
    if sel != "all":
        names = sel.split(";")
        allv = [v for v in allv if any(nm in v[0] for nm in names)]
    for name, fn in allv:
        out = np.asarray(fn(g, u))
        err = float(np.max(np.abs(out - ref))
                    / max(1e-30, float(np.max(np.abs(ref)))))
        dt = timed(fn, g, u)
        rows.append((name, dt))
        print(f"{name:22s} {dt * 1e3:7.3f} ms  {hbm / dt / 1e9:6.0f} GB/s "
              f" rel_err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
