"""Jittable L-BFGS (two-loop recursion, Armijo backtracking line search).

Written for the fused one-dispatch programs: jax.scipy.optimize.minimize's
BFGS reproducibly crashes the v5e TPU worker at ~360 parameters with a
long-scan cost function (its zoom line search; measured round 2, see
docs/PERF.md), and its dense P x P inverse-Hessian estimate scales poorly
to >10^3-parameter ansaetze.  This implementation is a plain
lax.while_loop over fixed-shape (memory, P) curvature buffers — safe to
nest inside other while_loops (the fused outer loops) and linear-memory
in P.

Semantics: minimizes fun(x, *args) from x0; terminates on ||grad||_inf <=
gtol or maxiter iterations; the line search backtracks geometrically and
accepts the last candidate even if Armijo fails (standard safeguard, keeps
the loop total).

The optimizer is RESUMABLE: `lbfgs_init` builds an `LBFGSState`,
`lbfgs_advance` runs up to `num_steps` further iterations and returns the
updated state, and `lbfgs_minimize(...)` == init + one full-length
advance (bit-identical to the round-2 single-loop implementation).
Chunked advancing lets callers bound the wall-time of a single compiled
dispatch — the shared axon TPU worker kills dispatches that run too long
(the H8 m=112 -> N=16 eigensolver subproblem, docs/PERF.md round-3
findings) — while keeping the optimizer state entirely on device between
dispatches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    nit: jnp.ndarray
    nfev: jnp.ndarray
    grad_norm: jnp.ndarray


class LBFGSState(NamedTuple):
    """Resumable optimizer state (a pytree of arrays; device-resident)."""
    it: jnp.ndarray        # iterations completed
    k: jnp.ndarray         # curvature pairs stored (monotone counter)
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    S: jnp.ndarray         # (memory, P) step buffer
    Y: jnp.ndarray         # (memory, P) gradient-difference buffer
    rho: jnp.ndarray       # (memory,) 1/s.y
    nfev: jnp.ndarray
    done: jnp.ndarray


def lbfgs_init(fun, x0, args=(), gtol: float = 1e-8,
               memory: int = 10) -> LBFGSState:
    """Evaluate fun/grad at x0 and build the initial resumable state."""
    dtype = jnp.asarray(x0).dtype
    P = x0.shape[0]
    f0, g0 = jax.value_and_grad(fun)(x0, *args)
    return LBFGSState(
        it=jnp.asarray(0), k=jnp.asarray(0), x=x0, f=f0, g=g0,
        S=jnp.zeros((memory, P), dtype), Y=jnp.zeros((memory, P), dtype),
        rho=jnp.zeros((memory,), dtype), nfev=jnp.asarray(1),
        done=jnp.max(jnp.abs(g0)) <= gtol)


def lbfgs_advance(fun, state: LBFGSState, args=(), num_steps: int = 1,
                  maxiter: int = 200, gtol: float = 1e-8,
                  max_backtracks: int = 25,
                  armijo_c1: float = 1e-4) -> LBFGSState:
    """Run up to `num_steps` more L-BFGS iterations (or until convergence
    / `maxiter` TOTAL iterations), returning the updated state.  Jittable;
    repeated calls with the same static config hit the jit cache."""
    vag = jax.value_and_grad(fun)
    dtype = jnp.asarray(state.x).dtype
    m = state.S.shape[0]
    eps = jnp.asarray(1e-30, dtype)

    def two_loop(g, S, Y, rho, k):
        """H_k @ g via the standard two-loop recursion over the valid
        window of the circular (m, P) buffers."""
        idx = (k - 1 - jnp.arange(m)) % m        # newest -> oldest
        valid = jnp.arange(m) < jnp.minimum(k, m)

        def bwd(carry, i):
            q, alphas = carry
            v = valid[i]
            j = idx[i]
            a = rho[j] * jnp.dot(S[j], q)
            a = jnp.where(v, a, 0.0)
            q = q - a * Y[j]
            return (q, alphas.at[i].set(a)), None

        (q, alphas), _ = jax.lax.scan(bwd, (g, jnp.zeros(m, dtype)),
                                      jnp.arange(m))
        # initial scaling gamma = s.y / y.y of the newest pair
        newest = (k - 1) % m
        sy = jnp.dot(S[newest], Y[newest])
        yy = jnp.dot(Y[newest], Y[newest])
        gamma = jnp.where(k > 0, sy / (yy + eps), jnp.asarray(1.0, dtype))
        r = gamma * q

        def fwd(r, i2):
            i = m - 1 - i2                       # oldest -> newest
            v = valid[i]
            j = idx[i]
            b = rho[j] * jnp.dot(Y[j], r)
            r = r + jnp.where(v, alphas[i] - b, 0.0) * S[j]
            return r, None

        r, _ = jax.lax.scan(fwd, r, jnp.arange(m))
        return r

    def line_search(x, f, g, d):
        """Backtracking Armijo: t = 1, halve while f(x + t d) > f + c1 t g.d."""
        gd = jnp.dot(g, d)

        def cond(c):
            t, ft, xt, n, done = c
            return jnp.logical_and(jnp.logical_not(done), n < max_backtracks)

        def body(c):
            t, ft, xt, n, done = c
            xt_new = x + t * d
            ft_new = fun(xt_new, *args)
            ok = ft_new <= f + armijo_c1 * t * gd
            return (jnp.where(ok, t, t * 0.5),
                    jnp.where(ok, ft_new, ft),
                    jnp.where(ok, xt_new, xt),
                    n + 1, ok)

        t0 = jnp.asarray(1.0, dtype)
        # evaluate the first candidate inside the loop (done=False entry)
        t, ft, xt, n, done = jax.lax.while_loop(
            cond, body, (t0, f, x, jnp.asarray(0), jnp.asarray(False)))
        # if never accepted, take the smallest step tried anyway
        xt = jnp.where(done, xt, x + t * d)
        ft = jnp.where(done, ft, fun(xt, *args))
        return xt, ft, n + jnp.where(done, 0, 1)

    stop_at = state.it + num_steps

    def cond(c):
        return jnp.logical_and(jnp.logical_not(c.done), c.it < stop_at)

    def body(c):
        it, k, x, f, g, S, Y, rho, nfev, done = c
        d = -two_loop(g, S, Y, rho, k)
        # fall back to steepest descent if d is not a descent direction
        desc = jnp.dot(g, d) < 0
        d = jnp.where(desc, d, -g)
        x_new, f_new, ls_evals = line_search(x, f, g, d)
        _, g_new = vag(x_new, *args)
        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        slot = k % m
        good = sy > 1e-10   # curvature condition: only store useful pairs
        S = S.at[slot].set(jnp.where(good, s, S[slot]))
        Y = Y.at[slot].set(jnp.where(good, y, Y[slot]))
        rho = rho.at[slot].set(jnp.where(good, 1.0 / (sy + eps), rho[slot]))
        k = k + jnp.where(good, 1, 0)
        converged = jnp.max(jnp.abs(g_new)) <= gtol
        diverged = jnp.logical_not(jnp.isfinite(f_new))
        no_move = jnp.max(jnp.abs(s)) <= 0.0
        hit_max = (it + 1) >= maxiter
        done = converged | diverged | hit_max | no_move
        return LBFGSState(it + 1, k, x_new, f_new, g_new, S, Y, rho,
                          nfev + ls_evals + 1, done)

    return jax.lax.while_loop(cond, body, state)


def lbfgs_minimize(fun, x0, args=(), maxiter: int = 200,
                   gtol: float = 1e-8, memory: int = 10,
                   max_backtracks: int = 25,
                   armijo_c1: float = 1e-4) -> LBFGSResult:
    """Jittable L-BFGS.  `fun(x, *args)` must be jax-traceable."""
    state = lbfgs_init(fun, x0, args=args, gtol=gtol, memory=memory)
    state = lbfgs_advance(fun, state, args=args, num_steps=maxiter,
                          maxiter=maxiter, gtol=gtol,
                          max_backtracks=max_backtracks,
                          armijo_c1=armijo_c1)
    return LBFGSResult(x=state.x, fun=state.f, nit=state.it,
                       nfev=state.nfev,
                       grad_norm=jnp.max(jnp.abs(state.g)))
