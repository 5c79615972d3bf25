"""Exact bf16-split matmuls for sign-structured operands (TPU MXU).

The TPU MXU multiplies bf16 natively; an f32 matmul under the package's
forced ``highest`` precision is emulated with SIX bf16 passes (each f32
operand is decomposed into three bf16 terms and the cross products are
accumulated).  The string-factorized sector kernels (sim/strings.py)
spend almost all of their FLOPs multiplying by matrices whose entries
are JW signs in {0, +-1} — one-hot partner permutations EA/EB and the
one-body operator stacks MA/MB.  Those operands are EXACTLY
representable in bf16, so half of ``highest``'s passes multiply by an
all-zero low part.  Splitting only the *generic* operand into three
bf16 terms

    x = hi + mid + lo,   hi = bf16(x), mid = bf16(x - hi), ...

reconstructs every f32 element to ~2^-27 relative (bf16 carries 8
mantissa bits per term and shares f32's exponent range), so

    E @ x = E @ hi + E @ mid + E @ lo

is exact at f32 working precision in THREE bf16 passes — issued as ONE
GEMM of 3x width (the parts are stacked along the non-contracted axis),
which also keeps the sequential K-gate scan at one launch per sandwich
side.  Measured round-4 motivation: the H8 N=24 UCC value-and-grad is
compute-bound in these GEMMs at 46.9 us/gate (scripts/probe_scan_bwd.py),
i.e. bound by ``highest``'s pass count, not by data movement.

Gradients: a plain 3-split is NOT autodiff-safe — d(x - bf16(x))/dx = 0,
so JAX routes the whole cotangent through the hi branch at bf16
precision (2^-9 relative error in the gradient).  ``exact_mm`` /
``exact_mmT`` therefore carry custom VJPs that recurse into the same
exact-split kernel (the adjoint of multiplying by a sign matrix is
multiplying by its transpose — again sign-structured).  Higher-order
autodiff is not supported (first-order is all the L-BFGS/Davidson
stacks use).

Only valid when the generic operand is float32 and the sign operand is
exactly bf16-representable; callers fall back to the ``highest`` path
for f64 (the oracle precision) and on backends without fast bf16
matmuls (CPU).  Reference anchor: no counterpart — the reference's
torch-CUDA path has native f32 tensor cores; this is the TPU-native
answer to the same precision/throughput trade (SURVEY.md section 2.3,
torch ATen role).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["split3", "exact_mm", "exact_mmT", "exact_einsum",
           "use_split", "force_split"]

_DEFAULT = jax.lax.Precision.DEFAULT


def split3(x):
    """f32 -> (hi, mid, lo) bf16 triple with hi + mid + lo == x to
    ~2^-27 relative (exact reconstruction at f32 working precision)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(x.dtype)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def _zeros_ct(a):
    """Zero cotangent for a (possibly integer) constant operand."""
    if jnp.issubdtype(a.dtype, jnp.integer):
        return np.zeros(a.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(a)


# -- E @ X (split X, parts stacked along X's column axis) ---------------------

@jax.custom_vjp
def exact_mm(E, X):
    """``E @ X`` exactly at f32 working precision, E sign-structured
    (entries exactly bf16-representable), X float32.  One bf16 GEMM of
    3x column width.  VJP: dX = exact_mm(E.T, ct) (exact recursion)."""
    h, m, l = split3(X)
    X3 = jnp.concatenate([h, m, l], axis=1)           # (k, 3n)
    Y3 = jax.lax.dot_general(E.astype(jnp.bfloat16), X3,
                             (((1,), (0,)), ((), ())),
                             precision=_DEFAULT,
                             preferred_element_type=X.dtype)
    n = X.shape[1]
    return Y3[:, :n] + Y3[:, n:2 * n] + Y3[:, 2 * n:]


def _exact_mm_fwd(E, X):
    return exact_mm(E, X), E


def _exact_mm_bwd(E, ct):
    return _zeros_ct(E), exact_mm(E.T, ct)


exact_mm.defvjp(_exact_mm_fwd, _exact_mm_bwd)


# -- X @ E^T (split X, parts stacked along X's row axis) ----------------------

@jax.custom_vjp
def exact_mmT(X, E):
    """``X @ E.T`` exactly at f32 working precision, E sign-structured,
    X float32.  One bf16 GEMM of 3x row height.  VJP: dX = ct @ E =
    exact_mmT(ct, E.T)."""
    h, m, l = split3(X)
    X3 = jnp.concatenate([h, m, l], axis=0)           # (3m, k)
    Y3 = jax.lax.dot_general(X3, E.astype(jnp.bfloat16),
                             (((1,), (1,)), ((), ())),
                             precision=_DEFAULT,
                             preferred_element_type=X.dtype)
    m_ = X.shape[0]
    return Y3[:m_] + Y3[m_:2 * m_] + Y3[2 * m_:]


def _exact_mmT_fwd(X, E):
    return exact_mmT(X, E), E


def _exact_mmT_bwd(E, ct):
    return exact_mmT(ct, E.T), _zeros_ct(E)


exact_mmT.defvjp(_exact_mmT_fwd, _exact_mmT_bwd)


# -- generic einsum form (the sigma/RDM operator-stack contractions) ----------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def exact_einsum(spec, bwd_spec, E, X):
    """``einsum(spec, E, X)`` exactly at f32 working precision, with the
    sign-structured operand E first and the generic float32 operand X
    split into three bf16 terms (three DEFAULT-precision einsum calls,
    accumulated in f32 — XLA keeps full layout freedom, unlike the
    hand-flattened GEMM forms above).  ``bwd_spec`` is the einsum
    contracting E with the OUTPUT cotangent back to X's indices, e.g.
    spec='qji,bi->qbj' has bwd_spec='qji,qbj->bi'; the VJP recurses into
    exact_einsum so first-order gradients are exact too (second-order is
    not supported)."""
    Eb = E.astype(jnp.bfloat16)
    out = None
    for p in split3(X):
        y = jnp.einsum(spec, Eb, p, precision=_DEFAULT,
                       preferred_element_type=X.dtype)
        out = y if out is None else out + y
    return out


def _ee_fwd(spec, bwd_spec, E, X):
    return exact_einsum(spec, bwd_spec, E, X), E


def _ee_bwd(spec, bwd_spec, E, ct):
    return _zeros_ct(E), exact_einsum(bwd_spec, spec, E, ct)


exact_einsum.defvjp(_ee_fwd, _ee_bwd)


# -- dispatch policy -----------------------------------------------------------

_FORCE = None          # tests / callers may force True or False


def force_split(flag):
    """Force the split path on (True), off (False), or restore the
    backend-based auto policy (None).  Returns the previous setting.
    The policy is read at TRACE time, so toggling clears JAX's jit
    caches (a cached program would otherwise keep the old path)."""
    global _FORCE
    prev = _FORCE
    if flag != prev:
        _FORCE = flag
        jax.clear_caches()
    return prev


def use_split(dtype) -> bool:
    """Whether the exact bf16-split kernels should run.  OFF by default
    everywhere — measured on the v5e (scripts/probe_split_gates.py,
    2026-08-19): the production gate scan is SLOWER with the split
    kernels (N=24 forward 25.8 vs 13.0 us/gate, value_and_grad 85.4 vs
    47.0), because XLA's `highest` f32 GEMM emitter already runs at the
    ~3-pass-equivalent rate (~37 TFLOP/s effective at the (495, 495)
    sandwich shape) — the nominal 6-pass model the split targets does
    not describe this backend, so the split only adds part/concat
    overhead.  Kept as a tested opt-in (force_split(True)) for backends
    where the f32 emulation really is pass-bound; f64 (the oracle
    precision) never takes it."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if _FORCE is not None:
        return bool(_FORCE)
    return False
