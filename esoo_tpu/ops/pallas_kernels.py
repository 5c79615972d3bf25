"""Pallas TPU kernels for the integral-transform hot path.

The two-electron transform is four staged GEMMs (kernels.rotate_two_body);
XLA already lowers each stage onto the MXU.  This module provides a
hand-tiled Pallas alternative for the dominant first stage — a
(m^3 x m) @ (m x n) contraction — and a general tiled matmul used by the
remaining stages:

  * MXU-aligned 128x128 output tiles with a fori_loop over K tiles,
  * float32 accumulation in a VMEM scratch regardless of input dtype,
  * inputs zero-padded to tile multiples (cheap: one-time per shape).

Activated via `rotate_two_body_pallas` (opt-in; `kernels.rotate_two_body`
remains the default and the correctness oracle — the active dimension n of
chemistry problems is small enough that XLA's lowering is already at the
HBM-bandwidth roofline, so the Pallas path matters for large-n active
spaces and serves as the template for further fusion work).

Falls back transparently to the jnp path on non-TPU backends (Pallas CPU
lowering supports interpret mode only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _matmul_kernel(x_ref, y_ref, o_ref, acc_ref, *, k_tiles: int):
    """One (TM, TN) output tile; loops the K dimension in TK chunks."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], y_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tk", "tn", "interpret"))
def matmul_pallas(x: jnp.ndarray, y: jnp.ndarray,
                  tm: int = 256, tk: int = 512, tn: int = 128,
                  interpret: bool = False) -> jnp.ndarray:
    """Tiled (M, K) @ (K, N) with f32 accumulation on the MXU.

    f64 inputs dispatch to the XLA path: the f32 VMEM accumulator would
    silently degrade f64 chemistry tensors to f32 accuracy (ADVICE r1).

    interpret=True runs the kernel BODY through the Pallas interpreter
    (any backend) — the CI correctness gate for the kernel itself, not
    just its fallback.
    """
    M, K = x.shape
    K2, N = y.shape
    assert K == K2
    if jnp.dtype(x.dtype).itemsize > 4 or jnp.dtype(y.dtype).itemsize > 4:
        return jnp.dot(x, y, precision=jax.lax.Precision.HIGHEST)
    Mp, Kp, Np = _round_up(M, tm), _round_up(K, tk), _round_up(N, tn)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    yp = jnp.pad(y, ((0, Kp - K), (0, Np - N)))
    k_tiles = Kp // tk

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, k_tiles=k_tiles),
        grid=(Mp // tm, Np // tn, k_tiles),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=(Mp * Kp + Kp * Np + Mp * Np) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, yp)
    return out[:M, :N]


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def rotate_two_body_pallas(g: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """4-index transform with each contraction as a Pallas tiled GEMM.

    g_rot[i,j,k,l] = sum_pqrs g[p,q,r,s] u[p,i] u[q,j] u[r,k] u[s,l]

    Identical contraction order to kernels.rotate_two_body; dispatches to
    the jnp path off-TPU.
    """
    if not _on_tpu():
        from ..orbital_optimization.kernels import rotate_two_body
        return rotate_two_body(g, u)
    m = g.shape[0]
    n = u.shape[1]
    t = matmul_pallas(g.reshape(m, m * m * m).T, u)          # (qrs, i)
    t = t.reshape(m, m * m * n)
    t = matmul_pallas(t.T, u)                                 # (rsi, j)
    t = t.reshape(m, m * n * n)
    t = matmul_pallas(t.T, u)                                 # (sij, k)
    t = t.reshape(m, n * n * n)
    t = matmul_pallas(t.T, u)                                 # (ijk, l)
    return t.reshape(n, n, n, n)
