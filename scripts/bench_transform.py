"""TPU microbenchmark: two-electron 4-index transform variants.

Evidence base for the hot-path kernel decision (VERDICT r1 item 3):
measures ms/transform and TFLOP/s (staged-GEMM FLOP count 2(m^4 n + m^3 n^2
+ m^2 n^3 + m n^4)) plus effective HBM bandwidth (m^4 reads) for each
variant, fwd and value_and_grad-of-energy, at the bench-relevant sizes.

Run ON the TPU (default backend under axon):  python scripts/bench_transform.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from esoo_tpu.utils import xla_cache  # noqa: E402

xla_cache.setup(jax)  # host-fingerprinted (foreign AOT entries SIGILL)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import esoo_tpu  # noqa: E402,F401  (forces highest matmul precision)
from esoo_tpu.orbital_optimization.kernels import (  # noqa: E402
    rotate_two_body, rotate_two_body_kron, rotate_two_body_minor)


VARIANTS = {
    "staged_leading": rotate_two_body,
    "staged_minor": rotate_two_body_minor,
    "kron": rotate_two_body_kron,
}


def _flops(m, n):
    return 2.0 * (m**4 * n + m**3 * n**2 + m**2 * n**3 + m * n**4)


def time_fwd(fn, g, u, iters=30):
    """Data-dependent chain forces sequential execution; np.asarray
    materializes (block_until_ready does not round-trip on axon)."""
    @jax.jit
    def chain(g, u, s):
        def body(carry, _):
            out = fn(g, u + 1e-9 * carry)
            return jnp.sum(out * out) * 1e-20, None
        s, _ = jax.lax.scan(body, s, None, length=iters)
        return s

    s = jnp.zeros((), dtype=u.dtype)
    np.asarray(chain(g, u, s))          # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(g, u, s))
    return (time.perf_counter() - t0) / iters


def time_vag(fn, g, u, Gam, iters=30):
    def energy(u, g, Gam):
        return jnp.sum(fn(g, u) * Gam)

    vag = jax.value_and_grad(energy)

    @jax.jit
    def chain(g, u, Gam, s):
        # g/Gam passed as arguments: closing over them would embed the
        # m^4 tensor as a program constant (HTTP 413 on remote compile)
        def body(carry, _):
            e, gr = vag(u + 1e-9 * carry, g, Gam)
            return e * 1e-20 + jnp.sum(gr) * 1e-20, None
        s, _ = jax.lax.scan(body, s, None, length=iters)
        return s

    s = jnp.zeros((), dtype=u.dtype)
    np.asarray(chain(g, u, Gam, s))
    t0 = time.perf_counter()
    np.asarray(chain(g, u, Gam, s))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="56:4,112:8,120:8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    rows = []
    for size in args.sizes.split(","):
        m, n = (int(x) for x in size.split(":"))
        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.normal(size=(m, m, m, m)) / m, dtype=jnp.float32)
        u = jnp.asarray(np.linalg.qr(rng.normal(size=(m, n)))[0],
                        dtype=jnp.float32)
        Gam = jnp.asarray(rng.normal(size=(n, n, n, n)) / n,
                          dtype=jnp.float32)
        fl = _flops(m, n)
        hbm = m**4 * 4  # one f32 read of g
        # correctness cross-check vs the oracle ordering
        ref = np.asarray(rotate_two_body(g, u))
        for name in args.variants.split(","):
            fn = VARIANTS[name]
            out = np.asarray(fn(g, u))
            err = float(np.max(np.abs(out - ref)) / max(1e-30,
                        float(np.max(np.abs(ref)))))
            t_f = time_fwd(fn, g, u, args.iters)
            t_g = time_vag(fn, g, u, Gam, args.iters)
            row = dict(variant=name, m=m, n=n,
                       fwd_ms=round(t_f * 1e3, 3),
                       fwd_tflops=round(fl / t_f / 1e12, 2),
                       fwd_hbm_gbs=round(hbm / t_f / 1e9, 0),
                       vag_ms=round(t_g * 1e3, 3),
                       vag_hbm_gbs=round(2 * hbm / t_g / 1e9, 0),
                       rel_err=f"{err:.1e}")
            rows.append(row)
            print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()
