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
gtol, maxiter iterations, an f-plateau (`ftol`, scipy L-BFGS-B-style
relative decrease test with a consecutive-iteration patience), or a
stalled line search (one fully exhausted Armijo search leaves x unchanged
and the no-move test stops the solve — at f32 the gradient-noise floor
makes gtol unreachable, so without these stops every solve burns maxiter;
measured H8 N=24: 200/200 iterations with nfev/nit ~ 21,
scripts/probe_h8_stages.py, round 4).  The line search is
quadratic-interpolation backtracking (fit f(0), f'(0), f(t) and jump to
the model minimizer, clamped to [0.1 t, 0.5 t]) — the pure-halving search
needed ~10-20 evals to walk down from overshooting steps that
interpolation reaches in 1-2.

Every line-search trial evaluates value_and_grad, not just the value
(round 5): with interpolation the search accepts at t = 1 almost always,
so the old fun(x_trial)-then-vag(x_accepted) split recomputed the
accepted point's forward pass every iteration — measured ~20 % of
inner-loop time at H8 N>=24 (fun ~ 25 ms vs vag ~ 67 ms; the break-even
is ~0.6 REJECTED trials per iteration, and the plateau/no-move stops
bound rejection-heavy stretches).  The accepted gradient now falls out
of the search, matching the reference PUPO's one-autograd-call-per-
iterate economy (partial_unitary_projection_optimizer.py:331); nfev
counts value_and_grad evaluations, so nfev ~ nit + 1 on an
accept-at-t=1 run.

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
    plateau: jnp.ndarray   # consecutive iterations below the ftol decrease


def default_ftol(dtype) -> float:
    """Relative per-iteration decrease below which progress counts as
    noise for the plateau stop: 32 ulps at f32 (~3.8e-6 — the working
    precision whose gradient-noise floor makes gtol unreachable,
    measured H8 N>=20), DISABLED (0.0) at f64 — the oracle precision
    keeps pure gtol/maxiter semantics so reference-parity paths are
    never stopped early.  The plateau stop needs `plateau_patience`
    consecutive below-threshold iterations, so a momentary slow step
    does not end the solve."""
    if jnp.finfo(dtype).bits >= 64:
        return 0.0
    return 32.0 * float(jnp.finfo(dtype).eps)


_PLATEAU_PATIENCE = 3


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
        done=jnp.max(jnp.abs(g0)) <= gtol,
        plateau=jnp.asarray(0))


def lbfgs_advance(fun, state: LBFGSState, args=(), num_steps: int = 1,
                  maxiter: int = 200, gtol: float = 1e-8,
                  max_backtracks: int = 25,
                  armijo_c1: float = 1e-4,
                  ftol: float = None,
                  plateau_patience: int = _PLATEAU_PATIENCE) -> LBFGSState:
    """Run up to `num_steps` more L-BFGS iterations (or until convergence
    / `maxiter` TOTAL iterations), returning the updated state.  Jittable;
    repeated calls with the same static config hit the jit cache.
    `ftol` is the relative per-iteration decrease below which progress
    counts toward the plateau stop (None -> default_ftol(dtype));
    `plateau_patience` is how many consecutive below-ftol iterations end
    the solve.  Set ftol=0.0 to disable the plateau stop entirely
    (pure gtol/maxiter/no-move semantics)."""
    vag = jax.value_and_grad(fun)
    dtype = jnp.asarray(state.x).dtype
    m = state.S.shape[0]
    eps = jnp.asarray(1e-30, dtype)
    ftol_v = jnp.asarray(default_ftol(dtype) if ftol is None else ftol,
                         dtype)

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
        """Quadratic-interpolation backtracking Armijo: start at t = 1;
        on failure jump to the minimizer of the quadratic through f(0),
        f'(0) and f(t) (clamped to [0.1 t, 0.5 t] — the halving search
        needed ~10-20 evals to walk down from an overshoot that the
        model reaches in 1-2; measured H8 N=24 nfev/nit ~ 21, round 4).
        Each trial evaluates value_and_grad so the accepted point's
        gradient is produced by the search itself (see module
        docstring).  Returns (x_t, f_t, g_t, evals, accepted); on a
        fully exhausted search x/f/g are UNCHANGED (the caller stops
        instead of taking a garbage step that pollutes the curvature
        pairs)."""
        gd = jnp.dot(g, d)

        def cond(c):
            t, ft, xt, gt, n, done = c
            return jnp.logical_and(jnp.logical_not(done), n < max_backtracks)

        def body(c):
            t, ft, xt, gt, n, done = c
            xt_new = x + t * d
            ft_new, gt_new = vag(xt_new, *args)
            ok = ft_new <= f + armijo_c1 * t * gd
            # minimizer of the quadratic model q(s): q(0)=f, q'(0)=gd,
            # q(t)=ft_new  ->  s* = -gd t^2 / (2 (ft_new - f - t gd))
            denom = 2.0 * (ft_new - f - t * gd)
            t_q = -gd * t * t / jnp.where(denom > 0, denom, 1.0)
            t_next = jnp.where(jnp.isfinite(ft_new) & (denom > 0),
                               jnp.clip(t_q, 0.1 * t, 0.5 * t),
                               0.1 * t)
            return (jnp.where(ok, t, t_next),
                    jnp.where(ok, ft_new, ft),
                    jnp.where(ok, xt_new, xt),
                    jnp.where(ok, gt_new, gt),
                    n + 1, ok)

        t0 = jnp.asarray(1.0, dtype)
        t, ft, xt, gt, n, done = jax.lax.while_loop(
            cond, body, (t0, f, x, g, jnp.asarray(0), jnp.asarray(False)))
        return xt, ft, gt, n, done

    stop_at = state.it + num_steps

    def cond(c):
        return jnp.logical_and(jnp.logical_not(c.done), c.it < stop_at)

    def body(c):
        (it, k, x, f, g, S, Y, rho, nfev, done, plateau) = c
        d = -two_loop(g, S, Y, rho, k)
        # fall back to steepest descent if d is not a descent direction
        desc = jnp.dot(g, d) < 0
        d = jnp.where(desc, d, -g)
        # with no curvature pairs the raw gradient step overshoots by
        # the curvature scale: normalize the first direction to unit
        # inf-norm (scipy L-BFGS-B's first-step convention)
        scale = jnp.where(k > 0, jnp.asarray(1.0, dtype),
                          1.0 / jnp.maximum(
                              jnp.asarray(1.0, dtype),
                              jnp.max(jnp.abs(d))))
        d = d * scale
        x_new, f_new, g_new, ls_evals, accepted = line_search(x, f, g, d)
        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        slot = k % m
        good = sy > 1e-10   # curvature condition: only store useful pairs
        S = S.at[slot].set(jnp.where(good, s, S[slot]))
        Y = Y.at[slot].set(jnp.where(good, y, Y[slot]))
        rho = rho.at[slot].set(jnp.where(good, 1.0 / (sy + eps), rho[slot]))
        k = k + jnp.where(good, 1, 0)
        # plateau: consecutive iterations whose decrease is noise-level
        small = (f - f_new) <= ftol_v * jnp.maximum(
            jnp.maximum(jnp.abs(f), jnp.abs(f_new)),
            jnp.asarray(1.0, dtype))
        plateau = jnp.where(accepted & jnp.logical_not(small),
                            0, plateau + 1)
        converged = jnp.max(jnp.abs(g_new)) <= gtol
        diverged = jnp.logical_not(jnp.isfinite(f_new))
        # an exhausted line search leaves x unchanged: stop (f32 noise
        # floor) rather than burn max_backtracks evals every iteration
        no_move = jnp.max(jnp.abs(s)) <= 0.0
        hit_max = (it + 1) >= maxiter
        done = (converged | diverged | hit_max | no_move
                | (plateau >= plateau_patience))
        return LBFGSState(it + 1, k, x_new, f_new, g_new, S, Y, rho,
                          nfev + ls_evals, done, plateau)

    return jax.lax.while_loop(cond, body, state)


def lbfgs_minimize(fun, x0, args=(), maxiter: int = 200,
                   gtol: float = 1e-8, memory: int = 10,
                   max_backtracks: int = 25,
                   armijo_c1: float = 1e-4,
                   ftol: float = None,
                   plateau_patience: int = _PLATEAU_PATIENCE) -> LBFGSResult:
    """Jittable L-BFGS.  `fun(x, *args)` must be jax-traceable."""
    state = lbfgs_init(fun, x0, args=args, gtol=gtol, memory=memory)
    state = lbfgs_advance(fun, state, args=args, num_steps=maxiter,
                          maxiter=maxiter, gtol=gtol,
                          max_backtracks=max_backtracks,
                          armijo_c1=armijo_c1, ftol=ftol,
                          plateau_patience=plateau_patience)
    return LBFGSResult(x=state.x, fun=state.f, nit=state.it,
                       nfev=state.nfev,
                       grad_norm=jnp.max(jnp.abs(state.g)))
