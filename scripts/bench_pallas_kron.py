"""TPU experiment: Pallas narrow-N GEMM for the kron-form 2e transform.

The kron path's cost is one (n^2, m^2) x (m^2, m^2) GEMM that reads the
m^4 tensor once; XLA measured ~2.4 ms at m=112 (42% of the ~1.0 ms HBM
bound).  This measures matmul_pallas on the same shape (several tilings)
plus accuracy vs the XLA `highest` result.
"""

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

import esoo_tpu  # noqa: E402,F401
from esoo_tpu.ops.pallas_kernels import matmul_pallas  # noqa: E402


def time_op(fn, *args, iters=20):
    @jax.jit
    def chain(a, b, s):
        def body(carry, _):
            out = fn(a + 1e-12 * carry, b)
            return jnp.sum(out * out) * 1e-20, None
        s, _ = jax.lax.scan(body, s, None, length=iters)
        return s

    s = jnp.zeros((), dtype=jnp.float32)
    np.asarray(chain(*args, s))
    t0 = time.perf_counter()
    np.asarray(chain(*args, s))
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend: {jax.default_backend()}")
    for m, n in [(112, 8), (120, 8)]:
        rng = np.random.default_rng(0)
        g = rng.normal(size=(m, m, m, m)).astype(np.float32) / m
        u = np.linalg.qr(rng.normal(size=(m, n)))[0].astype(np.float32)
        W = np.einsum("pi,qj->pqij", u, u).reshape(m * m, n * n)
        WT = jnp.asarray(np.ascontiguousarray(W.T))
        G2 = jnp.asarray(g.reshape(m * m, m * m))

        def xla_mm(a, b):
            return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)

        ref = np.asarray(xla_mm(WT, G2))
        t_xla = time_op(xla_mm, WT, G2)
        hbm = (m ** 4) * 4
        print(json.dumps(dict(variant="xla_highest", m=m,
                              ms=round(t_xla * 1e3, 3),
                              hbm_gbs=round(hbm / t_xla / 1e9))))
        for (tm, tk, tn) in [(64, 512, 128), (64, 1024, 128),
                             (64, 512, 256), (128, 512, 512)]:
            try:
                def pl_mm(a, b, tm=tm, tk=tk, tn=tn):
                    return matmul_pallas(a, b, tm=tm, tk=tk, tn=tn)
                out = np.asarray(pl_mm(WT, G2))
                err = float(np.max(np.abs(out - ref))
                            / max(1e-30, float(np.max(np.abs(ref)))))
                t = time_op(pl_mm, WT, G2)
                print(json.dumps(dict(
                    variant=f"pallas_{tm}_{tk}_{tn}", m=m,
                    ms=round(t * 1e3, 3),
                    hbm_gbs=round(hbm / t / 1e9), rel_err=f"{err:.1e}")))
            except Exception as e:
                print(json.dumps(dict(variant=f"pallas_{tm}_{tk}_{tn}",
                                      m=m, error=repr(e)[:200])))


if __name__ == "__main__":
    main()
