"""Jittable Davidson eigensolver for the string-sector Hamiltonian.

Exact lowest-eigenpair solver over an implicitly-represented symmetric
operator (matvec + exact diagonal): the workhorse of classical string-CI
codes, here as a fixed-shape JAX program so the whole OptOrb outer loop
— rotate integrals, diagonalize the active space exactly, extract RDMs,
BB/Stiefel descent — stays inside one compiled XLA program
(orbital_optimization/casscf.py FusedOptOrbCASSCF).

Design notes (TPU-first):
  * Fixed subspace dimension `max_subspace` with implicit restarting —
    all shapes static, the whole search is one `lax.while_loop`.
  * One matvec per iteration (the restart reuses the Ritz vector's
    H-image from the subspace, no extra matvec).
  * Rayleigh-Ritz on the (m, m) projected matrix via `jnp.linalg.eigh`
    with +LARGE padding on unused diagonal slots, so the lowest Ritz
    pair always comes from the active subspace.
  * The preconditioner is the EXACT sector diagonal
    (sim/strings.py `diagonal`), the standard Davidson choice for
    determinant-basis Hamiltonians (huge diagonal spread).

No reference counterpart: the reference's only exact-solver object is
the FCI *initializer* (configuration_interaction_states.py, host scipy);
it has no exact eigensolver in the optimization loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DavidsonResult(NamedTuple):
    eigenvalue: jnp.ndarray      # lowest Ritz value
    eigenvector: jnp.ndarray     # (dim,) normalized Ritz vector
    iterations: jnp.ndarray      # matvec count actually performed
    residual_norm: jnp.ndarray   # ||H x - E x|| at exit


@partial(jax.jit, static_argnames=("matvec", "max_subspace", "maxiter"))
def davidson_ground(matvec: Callable,
                    diag: jnp.ndarray,
                    v0: jnp.ndarray,
                    max_subspace: int = 16,
                    maxiter: int = 200,
                    tol: float = 1e-8) -> DavidsonResult:
    """Lowest eigenpair of the symmetric operator `matvec` (flat vectors
    (dim,) -> (dim,)) with exact diagonal `diag`, started from `v0`.

    Convergence: ||H x - E x|| < tol * max(1, |E|).  On stagnation of
    the preconditioned correction (numerically inside the subspace) the
    loop exits with the current Ritz pair.
    """
    dim = v0.shape[0]
    dt = v0.dtype
    m = max_subspace
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)

    v0 = v0 / jnp.linalg.norm(v0)

    def _ritz_pad(G, cnt):
        """Set inactive diagonal slots (zero rows of B -> zero Gram
        entries) to max(active diag) + 1: strictly above the lowest
        eigenvalue (lambda_min <= min diag <= max diag) while keeping
        ||G|| at spectrum scale — a finfo-max pad makes the TPU's f32
        eigh lose the active block entirely (measured: Davidson
        returned the unconverged start vector on the v5e)."""
        inactive = (jnp.arange(m) >= cnt).astype(dt)
        dG = jnp.diagonal(G)
        mx = jnp.max(jnp.where(inactive > 0, -jnp.inf, dG))
        return G + jnp.diag(inactive * (mx + 1.0))

    def body(c):
        B, HB, cnt, it, E, x, hx, rn, stop = c
        # Rayleigh-Ritz on the active subspace
        G = B @ HB.T
        G = (G + G.T) / 2.0
        G = _ritz_pad(G, cnt)
        w, Y = jnp.linalg.eigh(G)
        y = Y[:, 0]
        E = w[0]
        x = y @ B
        hx = y @ HB
        r = hx - E * x
        rn = jnp.linalg.norm(r)
        converged = rn < tol * jnp.maximum(1.0, jnp.abs(E))

        # Davidson correction: t = r / (diag - E), guarded near zero
        den = diag - E
        den = jnp.where(jnp.abs(den) < 1e-2, jnp.where(den < 0, -1e-2,
                                                       1e-2), den)
        t = r / den
        # orthogonalize against the basis (two Gram-Schmidt passes;
        # inactive rows are zero so they project out nothing)
        t = t - (B @ t) @ B
        t = t - (B @ t) @ B
        tn = jnp.linalg.norm(t)
        stagnant = tn < 64 * eps
        t = t / jnp.maximum(tn, eps)

        # restart when the subspace is full: collapse to [x, t]
        full = cnt >= m

        def do_restart(_):
            Bn = jnp.zeros_like(B).at[0].set(x / jnp.linalg.norm(x))
            HBn = jnp.zeros_like(HB).at[0].set(hx / jnp.linalg.norm(x))
            # re-orthogonalize t against the collapsed basis
            t2 = t - jnp.dot(Bn[0], t) * Bn[0]
            t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), eps)
            return (Bn.at[1].set(t2), HBn, jnp.asarray(2, cnt.dtype), t2)

        def do_append(_):
            return (B.at[cnt].set(t), HB, cnt + 1, t)

        B, HB, cnt, t_new = jax.lax.cond(full, do_restart, do_append,
                                         operand=None)
        HB = HB.at[cnt - 1].set(matvec(t_new))
        stop = jnp.logical_or(converged, stagnant)
        return (B, HB, cnt, it + 1, E, x, hx, rn, stop)

    def cond(c):
        _, _, _, it, _, _, _, _, stop = c
        return jnp.logical_and(jnp.logical_not(stop), it < maxiter)

    B0 = jnp.zeros((m, dim), dt).at[0].set(v0)
    HB0 = jnp.zeros((m, dim), dt).at[0].set(matvec(v0))
    c0 = (B0, HB0, jnp.asarray(1), jnp.asarray(1),
          jnp.asarray(0.0, dt), v0, HB0[0],
          jnp.asarray(jnp.inf, dt), jnp.asarray(False))
    B, HB, cnt, it, E, x, hx, rn, stop = jax.lax.while_loop(cond, body, c0)
    # final Rayleigh-Ritz so the returned pair reflects the last append
    G = B @ HB.T
    G = (G + G.T) / 2.0
    G = _ritz_pad(G, cnt)
    w, Y = jnp.linalg.eigh(G)
    y = Y[:, 0]
    E2 = w[0]
    x2 = y @ B
    hx2 = y @ HB
    rn2 = jnp.linalg.norm(hx2 - E2 * x2)
    better = rn2 <= rn
    E = jnp.where(better, E2, E)
    x = jnp.where(better, x2, x)
    rn = jnp.where(better, rn2, rn)
    x = x / jnp.linalg.norm(x)
    return DavidsonResult(eigenvalue=E, eigenvector=x, iterations=it,
                          residual_norm=rn)


class BlockDavidsonResult(NamedTuple):
    eigenvalues: jnp.ndarray     # (k,) lowest Ritz values, ascending
    eigenvectors: jnp.ndarray    # (k, dim) orthonormal Ritz vectors
    iterations: jnp.ndarray      # outer Davidson iterations performed
    residual_norm: jnp.ndarray   # max_i ||H x_i - E_i x_i|| at exit


def _block_fns(matvec, diag, k, m, tol, dt, sequential_mv):
    """Shared block-Davidson machinery: (bmv, gs_rows, ritz, body).
    The loop carry is (B, HB, cnt, it, ws, X, HX, rn, stop) — a pure
    array pytree, so a search can round-trip through the host between
    bounded `davidson_block_advance` dispatches (the chunked mode that
    keeps each compiled dispatch short on kill-prone shared workers)."""
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)

    # sequential_mv=True: lax.map instead of vmap — identical results,
    # k-fold smaller transient memory (needed when one matvec's working
    # set is HBM-scale, e.g. the compact-table sigma at nd ~ millions
    # whose (q_pad, nd) T half is GBs).  On this path a DEAD row (zero
    # correction: its root locked by per-root convergence, or a
    # stagnated direction) skips the matvec entirely via lax.cond — the
    # sigma GEMMs cost the same on a zero vector, and at SA N=32 one
    # matvec is seconds (round-5 SA-ladder work, VERDICT r4 item 5).
    # The vmap path keeps the plain batched matvec (vmapped cond
    # executes both branches as a select; small-size path anyway).
    if sequential_mv:
        def _mv_live(x):
            live = jnp.linalg.norm(x) > 0.5    # gs_rows: live rows unit
            return jax.lax.cond(live, matvec,
                                lambda v: jnp.zeros_like(v), x)

        bmv = lambda X: jax.lax.map(_mv_live, X)
    else:
        bmv = jax.vmap(matvec)

    def _gs_rows(X, B, cnt):
        mask = (jnp.arange(B.shape[0]) < cnt).astype(dt)
        rows = []
        for i in range(X.shape[0]):
            x = X[i]
            for _ in range(2):
                x = x - ((B @ x) * mask) @ B
                for r in rows:
                    x = x - jnp.dot(r, x) * r
            nx = jnp.linalg.norm(x)
            ok = nx > 256 * eps
            x = jnp.where(ok, x / jnp.maximum(nx, eps), jnp.zeros_like(x))
            rows.append(x)
        return jnp.stack(rows)

    def _ritz(B, HB, cnt):
        G = B @ HB.T
        G = (G + G.T) / 2.0
        # a slot is inactive if beyond cnt OR a dead (zeroed) correction
        # row inside the window — dead rows otherwise contribute
        # spurious zero Ritz pairs, which rank into the lowest k (and
        # fake rn = 0 convergence) whenever the spectrum straddles zero
        dead = (jnp.linalg.norm(B, axis=1) < 0.5).astype(dt)
        inactive = jnp.maximum((jnp.arange(m) >= cnt).astype(dt), dead)
        dG = jnp.diagonal(G)
        mx = jnp.max(jnp.where(inactive > 0, -jnp.inf, dG))
        G = G + jnp.diag(inactive * (mx + 1.0))
        w, Y = jnp.linalg.eigh(G)
        X = Y[:, :k].T @ B           # (k, dim) Ritz vectors
        HX = Y[:, :k].T @ HB
        return w[:k], X, HX

    def body(c):
        B, HB, cnt, it, ws, X, HX, rn, stop = c
        ws, X, HX = _ritz(B, HB, cnt)
        R = HX - ws[:, None] * X
        rns = jnp.linalg.norm(R, axis=1)
        rn = jnp.max(rns)
        converged = rn < tol * jnp.maximum(1.0, jnp.max(jnp.abs(ws)))

        den = diag[None, :] - ws[:, None]
        den = jnp.where(jnp.abs(den) < 1e-2,
                        jnp.where(den < 0, -1e-2, 1e-2), den)
        # per-root locking: a root whose own residual is already below
        # tolerance contributes no correction this iteration (its Ritz
        # vector stays in the basis; the exit test is unchanged, so the
        # converged result is identical within tol) — on the
        # sequential_mv path the zeroed row also skips its matvec
        root_locked = rns < tol * jnp.maximum(1.0, jnp.abs(ws))
        T = (R / den) * (1.0 - root_locked.astype(dt))[:, None]

        full = cnt + k > m

        def do_restart(_):
            Bn = jnp.zeros_like(B).at[:k].set(X)
            HBn = jnp.zeros_like(HB).at[:k].set(HX)
            return Bn, HBn, jnp.asarray(k, cnt.dtype)

        def no_restart(_):
            return B, HB, cnt

        B2, HB2, cnt2 = jax.lax.cond(full, do_restart, no_restart, None)
        Tn = _gs_rows(T, B2, cnt2)
        alive = (jnp.linalg.norm(Tn, axis=1) > 0.5).astype(dt)
        stagnant = jnp.sum(alive) < 0.5
        HT = bmv(Tn) * alive[:, None]
        idx = cnt2 + jnp.arange(k)
        B3 = B2.at[idx].set(Tn)      # dead rows are zero: inert
        HB3 = HB2.at[idx].set(HT)
        cnt3 = cnt2 + jnp.asarray(k, cnt2.dtype)
        stop = jnp.logical_or(converged, stagnant)
        return (B3, HB3, cnt3, it + 1, ws, X, HX, rn, stop)

    def init(V0):
        dim = V0.shape[1]
        V0 = _gs_rows(V0, jnp.zeros((m, dim), dt), jnp.asarray(0))
        B0 = jnp.zeros((m, dim), dt).at[:k].set(V0)
        HB0 = jnp.zeros((m, dim), dt).at[:k].set(bmv(V0))
        ws0 = jnp.zeros((k,), dt)
        return (B0, HB0, jnp.asarray(k), jnp.asarray(1), ws0, V0,
                HB0[:k], jnp.asarray(jnp.inf, dt), jnp.asarray(False))

    def finish(c):
        B, HB, cnt, it, ws, X, HX, rn, stop = c
        ws2, X2, HX2 = _ritz(B, HB, cnt)
        R2 = HX2 - ws2[:, None] * X2
        rn2 = jnp.max(jnp.linalg.norm(R2, axis=1))
        better = rn2 <= rn
        ws = jnp.where(better, ws2, ws)
        X = jnp.where(better, X2, X)
        rn = jnp.where(better, rn2, rn)
        X = X / jnp.linalg.norm(X, axis=1, keepdims=True)
        return BlockDavidsonResult(eigenvalues=ws, eigenvectors=X,
                                   iterations=it, residual_norm=rn)

    return bmv, _gs_rows, _ritz, body, init, finish


@partial(jax.jit, static_argnames=("matvec", "k", "max_subspace",
                                   "maxiter", "sequential_mv"))
def davidson_block(matvec: Callable,
                   diag: jnp.ndarray,
                   V0: jnp.ndarray,
                   k: int,
                   max_subspace: int = 24,
                   maxiter: int = 200,
                   tol: float = 1e-8,
                   sequential_mv: bool = False) -> BlockDavidsonResult:
    """Lowest k eigenpairs of the symmetric operator `matvec` by block
    Davidson: per iteration, Rayleigh-Ritz over the subspace, k
    preconditioned residual corrections appended (orthonormalized
    against the basis and each other), restart collapsing to the k Ritz
    vectors when the subspace fills.  `V0` is (k, dim) (rows need not be
    orthonormal; they are orthonormalized).  One batched k-vector
    matvec per iteration.  Exactness vs dense eigh: tests/test_casscf.py.
    """
    dt = V0.dtype
    m = max_subspace
    if m < 2 * k:
        raise ValueError(f"max_subspace={m} must be >= 2k={2 * k}")
    _, _, _, body, init, finish = _block_fns(matvec, diag, k, m, tol,
                                             dt, sequential_mv)

    def cond(c):
        it, stop = c[3], c[8]
        return jnp.logical_and(jnp.logical_not(stop), it < maxiter)

    c = jax.lax.while_loop(cond, body, init(V0))
    return finish(c)


@partial(jax.jit, static_argnames=("matvec", "k", "max_subspace",
                                   "sequential_mv"))
def davidson_block_init(matvec: Callable,
                        diag: jnp.ndarray,
                        V0: jnp.ndarray,
                        k: int,
                        max_subspace: int = 24,
                        tol: float = 1e-8,
                        sequential_mv: bool = False):
    """Initial carry for a chunked block-Davidson search (see
    davidson_block_advance)."""
    dt = V0.dtype
    if max_subspace < 2 * k:
        raise ValueError(
            f"max_subspace={max_subspace} must be >= 2k={2 * k}")
    _, _, _, _, init, _ = _block_fns(matvec, diag, k, max_subspace,
                                     tol, dt, sequential_mv)
    return init(V0)


@partial(jax.jit, static_argnames=("matvec", "iters", "sequential_mv"))
def davidson_block_advance(matvec: Callable,
                           diag: jnp.ndarray,
                           state,
                           iters: int,
                           tol: float = 1e-8,
                           sequential_mv: bool = False):
    """Advance a block-Davidson search by at most `iters` iterations
    from `state` (an init/advance carry) and return the new carry.
    Identical math to davidson_block's loop — the chunked driver for
    dispatch-length-limited backends: each advance is one SHORT
    compiled dispatch, the (m, dim) basis stays on device between
    dispatches, and the host reads only the scalar stop flag
    (state[-1]) to decide whether to continue.  k and max_subspace are
    recovered from the carry shapes."""
    B, ws = state[0], state[4]
    m, k = B.shape[0], ws.shape[0]
    dt = B.dtype
    _, _, _, body, _, _ = _block_fns(matvec, diag, k, m, tol, dt,
                                     sequential_mv)

    def cond(c):
        it0, c = c
        stop = c[8]
        return jnp.logical_and(jnp.logical_not(stop),
                               c[3] - it0 < iters)

    def body2(c):
        it0, cc = c
        return (it0, body(cc))

    _, c = jax.lax.while_loop(cond, body2, (state[3], state))
    return c


@partial(jax.jit, static_argnames=("matvec", "sequential_mv"))
def davidson_block_finish(matvec: Callable,
                          diag: jnp.ndarray,
                          state,
                          tol: float = 1e-8,
                          sequential_mv: bool = False) -> BlockDavidsonResult:
    """Final Rayleigh-Ritz polish of a chunked search carry — the same
    exit block as davidson_block, so init + advance* + finish computes
    the identical result."""
    B, ws = state[0], state[4]
    m, k = B.shape[0], ws.shape[0]
    dt = B.dtype
    _, _, _, _, _, finish = _block_fns(matvec, diag, k, m, tol, dt,
                                       sequential_mv)
    return finish(state)
