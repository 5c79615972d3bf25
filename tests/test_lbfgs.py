"""Unit tests for the jittable L-BFGS (solvers/lbfgs.py) — the fused
programs' eigensolver optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

from esoo_tpu.solvers.lbfgs import (lbfgs_advance, lbfgs_init,
                                    lbfgs_minimize)


def test_rosenbrock_10d():
    def rosen(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    r = jax.jit(lambda x0: lbfgs_minimize(rosen, x0, maxiter=500,
                                          gtol=1e-8))(jnp.zeros(10))
    assert float(r.fun) < 1e-12
    np.testing.assert_allclose(np.asarray(r.x), np.ones(10), atol=1e-5)


def test_quadratic_matches_closed_form():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(50, 50))
    A = A @ A.T + np.eye(50)
    b = rng.normal(size=50)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    r = lbfgs_minimize(lambda x: 0.5 * x @ Aj @ x - bj @ x,
                       jnp.zeros(50), maxiter=400, gtol=1e-10)
    np.testing.assert_allclose(np.asarray(r.x), np.linalg.solve(A, b),
                               atol=1e-6)


def test_extra_args_and_f32():
    A = jnp.eye(8, dtype=jnp.float32) * 3.0

    def f(x, A, c):
        return 0.5 * x @ A @ x + c * jnp.sum(x)

    r = lbfgs_minimize(f, jnp.ones(8, dtype=jnp.float32),
                       args=(A, jnp.asarray(2.0, jnp.float32)),
                       maxiter=100, gtol=1e-6)
    np.testing.assert_allclose(np.asarray(r.x), -2.0 / 3.0 * np.ones(8),
                               atol=1e-5)
    assert r.x.dtype == jnp.float32


def test_chunked_advance_bitwise_equals_single_shot():
    """init + repeated bounded advances must reproduce lbfgs_minimize
    EXACTLY (same iterates, same eval counts) — the host-chunked
    dispatch mode the N=16 TPU path relies on cannot change semantics."""
    def rosen(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    maxiter, gtol = 137, 1e-8
    ref = lbfgs_minimize(rosen, jnp.zeros(6), maxiter=maxiter, gtol=gtol)

    step = jax.jit(lambda s: lbfgs_advance(rosen, s, num_steps=7,
                                           maxiter=maxiter, gtol=gtol))
    s = lbfgs_init(rosen, jnp.zeros(6), gtol=gtol)
    hops = 0
    while not bool(s.done) and hops < 1 + maxiter:
        s = step(s)
        hops += 1
    assert hops > 3            # genuinely chunked, not one pass
    assert int(s.it) == int(ref.nit)
    assert int(s.nfev) == int(ref.nfev)
    np.testing.assert_array_equal(np.asarray(s.x), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(s.f), np.asarray(ref.fun))


def test_converges_inside_outer_while_loop():
    """Nesting inside another lax.while_loop (the fused outer-loop shape)."""
    A = jnp.diag(jnp.arange(1.0, 6.0))

    def inner(shift):
        r = lbfgs_minimize(lambda x: 0.5 * x @ A @ x + shift * jnp.sum(x),
                           jnp.zeros(5), maxiter=100, gtol=1e-10)
        return r.fun

    def body(c):
        i, acc = c
        return i + 1, acc + inner(jnp.asarray(1.0) * i)

    @jax.jit
    def run():
        return jax.lax.while_loop(lambda c: c[0] < 3, body,
                                  (jnp.asarray(0), jnp.asarray(0.0)))

    i, acc = run()
    # sum_i min_x [x^T A x / 2 + i 1.x] = sum_i (-i^2/2) sum_k 1/a_k
    want = sum(-0.5 * i * i * np.sum(1.0 / np.arange(1.0, 6.0))
               for i in range(3))
    np.testing.assert_allclose(float(acc), want, atol=1e-8)


def test_plateau_stop_on_noise_floor():
    """An f32 objective whose decreases sink below the noise floor stops
    via the plateau rule LONG before maxiter instead of burning
    max_backtracks evals per iteration (the measured H8 N>=20 stall:
    200/200 iterations at nfev/nit ~ 21, scripts/probe_h8_stages.py)."""
    A = jnp.diag(jnp.linspace(1.0, 50.0, 40).astype(jnp.float32))

    def f(x):
        # f32 quadratic: near the minimum the true decrease per step is
        # below 32 ulp * |f|, so progress is numerically over
        return 0.5 * x @ A @ x - jnp.sum(x) + 100.0

    x0 = jnp.zeros(40, jnp.float32)
    res = lbfgs_minimize(f, x0, maxiter=500, gtol=1e-12)
    # converged in float terms...
    assert float(res.fun) < 100.0 - 0.5 * float(jnp.sum(1.0 / jnp.diag(A))) \
        + 1e-3
    # ...and did NOT spin to maxiter with a saturated line search
    assert int(res.nit) < 200
    assert int(res.nfev) < 6 * int(res.nit) + 10


def test_stalled_line_search_stops_without_moving():
    """When no step can decrease f (objective already at its exact
    minimum and flat to machine precision), the exhausted line search
    leaves x unchanged and terminates."""
    def f(x):
        return jnp.asarray(0.0, jnp.float32) * jnp.sum(x) + 1.0

    x0 = jnp.ones(7, jnp.float32)
    res = lbfgs_minimize(f, x0, maxiter=100)
    np.testing.assert_array_equal(np.asarray(res.x), np.ones(7, np.float32))
    assert int(res.nit) <= 2


def test_interpolation_line_search_converges_f64():
    """The quadratic-interpolation backtracking converges a badly scaled
    f64 quadratic to the numerical-floor region cheaply (~2 evals per
    iteration).  Note the no-representable-decrease stop bounds the
    reachable gradient norm by the f-resolution along the search
    direction (~sqrt(ulp(f)*curvature)) — tighter than scipy
    L-BFGS-B's default factr=1e7 stop, but not arbitrarily deep, so the
    assertion is 1e-5, not ulp-level."""
    A = jnp.diag(jnp.asarray(np.geomspace(1.0, 100.0, 30)))

    def f(x):
        return 0.5 * x @ A @ x - jnp.sum(x)

    res = lbfgs_minimize(f, jnp.zeros(30), maxiter=2000, gtol=1e-9)
    want = jnp.asarray(1.0) / jnp.diag(A)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(want),
                               atol=1e-5)
    assert float(res.grad_norm) < 1e-5
    # interpolation keeps the search cheap: ~1 vag per iteration
    assert int(res.nfev) < 3 * int(res.nit) + 30


def test_one_vag_per_accepted_iteration():
    """Round-5 line-search economy: every trial IS a value_and_grad, so
    an accept-at-t=1 run costs ~nit+1 evals total — no duplicate
    forward pass at the accepted point (the ~20 % inner-loop waste the
    round-4 profile measured at H8 N>=24; VERDICT r4 item 2).  Pinned
    on both a smooth nonconvex (Rosenbrock) and an ill-conditioned
    quadratic: backtracks are rare, so nfev stays within ~15 % of nit."""
    def rosen(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    r = lbfgs_minimize(rosen, jnp.zeros(10), maxiter=500, gtol=1e-8)
    assert int(r.nfev) <= int(1.2 * int(r.nit)) + 3

    A = jnp.diag(jnp.asarray(np.geomspace(1.0, 100.0, 30)))
    r2 = lbfgs_minimize(lambda x: 0.5 * x @ A @ x - jnp.sum(x),
                        jnp.zeros(30), maxiter=2000, gtol=1e-9)
    assert int(r2.nfev) <= int(1.2 * int(r2.nit)) + 3


def test_plateau_patience_and_ftol_kwargs():
    """`ftol`/`plateau_patience` are caller-controllable: ftol=0 restores
    pure gtol/maxiter/no-move semantics even at f32 (the advisor's
    round-4 ask — a steady-but-slow f32 objective must be able to opt
    out of the auto plateau stop)."""
    A = jnp.diag(jnp.linspace(1.0, 50.0, 40).astype(jnp.float32))

    def f(x):
        return 0.5 * x @ A @ x - jnp.sum(x) + 100.0

    x0 = jnp.zeros(40, jnp.float32)
    auto = lbfgs_minimize(f, x0, maxiter=500, gtol=1e-12)
    off = lbfgs_minimize(f, x0, maxiter=500, gtol=1e-12, ftol=0.0)
    # with the plateau stop disabled the solve runs strictly longer
    # (until the no-move stop or maxiter), never shorter
    assert int(off.nit) >= int(auto.nit)
    assert float(off.fun) <= float(auto.fun) + 1e-6
    # a huge patience behaves like a disabled plateau too
    pat = lbfgs_minimize(f, x0, maxiter=500, gtol=1e-12,
                         plateau_patience=10 ** 6)
    assert int(pat.nit) >= int(auto.nit)
