"""Exact bf16-split kernels (ops/split_precision.py) — the f32 TPU fast
path that halves MXU passes on sign-structured GEMMs.  Contract: at f32
working precision the split path is as accurate as the forced-`highest`
f32 path (both measured against the f64 oracle), for values AND
first-order gradients, across every wired-in call site (gate scan,
sigma/quadform, RDMs, compact int8 stacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esoo_tpu.ops import split_precision as sp
from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.sim import strings as S
from esoo_tpu.sim.sector import SectorCI, SectorUCC

jax.config.update("jax_enable_x64", True)


@pytest.fixture
def forced_split():
    """Force the split path on for the test body (CPU would otherwise
    never take it), restoring the auto policy afterwards."""
    prev = sp.force_split(True)
    yield
    sp.force_split(prev)


def _random_integrals(N, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(N, N))
    h = (h + h.T) / 2
    g0 = rng.normal(size=(N, N, N, N))
    g = (g0 + g0.transpose(1, 0, 3, 2) + g0.transpose(2, 3, 0, 1)
         + g0.transpose(3, 2, 1, 0))
    return h, g


def _sector(n=4, parts=(2, 2)):
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec = SectorUCC(ansatz, 2 * n, kernel="strings")
    assert sec.kernel == "strings"
    return ansatz, sec


def test_exact_mm_helpers_match_f64():
    """exact_mm / exact_mmT / exact_einsum reproduce the f64 product to
    f32 rounding — no worse than the native f32 product's own error."""
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.integers(-1, 2, size=(33, 47)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(47, 21)), jnp.float32)
    ref = np.asarray(E, np.float64) @ np.asarray(X, np.float64)
    scale = np.abs(ref).max()
    err_split = np.abs(np.asarray(sp.exact_mm(E, X)) - ref).max()
    err_f32 = np.abs(np.asarray(E @ X, np.float64) - ref).max()
    assert err_split <= 3 * err_f32 + 1e-9 * scale

    Y = jnp.asarray(rng.normal(size=(21, 47)), jnp.float32)
    refT = np.asarray(Y, np.float64) @ np.asarray(E, np.float64).T
    errT = np.abs(np.asarray(sp.exact_mmT(Y, E)) - refT).max()
    errT_f32 = np.abs(np.asarray(Y @ E.T, np.float64) - refT).max()
    assert errT <= 3 * errT_f32 + 1e-9 * np.abs(refT).max()

    M = jnp.asarray(rng.integers(-1, 2, size=(6, 9, 11)), jnp.int8)
    V = jnp.asarray(rng.normal(size=(5, 11)), jnp.float32)
    got = np.asarray(sp.exact_einsum("qji,bi->qbj", "qji,qbj->bi", M, V))
    re_ = np.einsum("qji,bi->qbj", np.asarray(M, np.float64),
                    np.asarray(V, np.float64))
    assert np.abs(got - re_).max() < 1e-6


def test_exact_einsum_gradient_is_exact_not_bf16():
    """The custom VJP recurses into the exact-split kernel: the gradient
    matches f64 to f32 rounding.  (A plain 3-split would route the whole
    cotangent through the hi branch at bf16 precision — 2^-9 relative.)"""
    rng = np.random.default_rng(1)
    M = jnp.asarray(rng.integers(-1, 2, size=(6, 9, 11)), jnp.int8)
    V = jnp.asarray(rng.normal(size=(5, 11)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(6, 5, 9)), jnp.float32)

    g_split = np.asarray(jax.grad(lambda v: jnp.sum(
        W * sp.exact_einsum("qji,bi->qbj", "qji,qbj->bi", M, v)))(V))
    M64 = jnp.asarray(M, jnp.float64)
    g_64 = np.asarray(jax.grad(lambda v: jnp.sum(
        jnp.asarray(W, jnp.float64)
        * jnp.einsum("qji,bi->qbj", M64, v)))(jnp.asarray(V, jnp.float64)))
    rel = np.abs(g_split - g_64).max() / np.abs(g_64).max()
    assert rel < 1e-6, rel


def test_use_split_policy():
    """f64 never takes the split path; force_split overrides the
    backend default and restores cleanly."""
    assert not sp.use_split(jnp.float64)
    prev = sp.force_split(True)
    try:
        assert sp.use_split(jnp.float32)
        assert not sp.use_split(jnp.float64)
        sp.force_split(False)
        assert not sp.use_split(jnp.float32)
    finally:
        sp.force_split(prev)


def test_gate_scan_split_as_accurate_as_highest(forced_split):
    """apply_gates at f32 with the split sandwiches is as close to the
    f64 state as the f32 `highest` path is, and the reversible custom
    VJP stays consistent (value_and_grad of the quadform)."""
    ansatz, sec = _sector()
    tabs64 = sec.device_tables(np.float64)
    tabs32 = sec.device_tables(np.float32)
    st = sec._str_tabs
    nA, nB = len(st.A), len(st.B)
    rng = np.random.default_rng(3)
    V0 = rng.normal(size=(nB, nA))
    V0 = V0 / np.linalg.norm(V0)
    th = rng.normal(size=ansatz.num_parameters) * 0.4

    ref = np.asarray(S.apply_gates(jnp.asarray(V0, jnp.float64),
                                   jnp.asarray(th, jnp.float64), tabs64))
    got_split = np.asarray(S.apply_gates(jnp.asarray(V0, jnp.float32),
                                         jnp.asarray(th, jnp.float32),
                                         tabs32))
    sp.force_split(False)
    got_hi = np.asarray(S.apply_gates(jnp.asarray(V0, jnp.float32),
                                      jnp.asarray(th, jnp.float32),
                                      tabs32))
    sp.force_split(True)
    err_split = np.abs(got_split - ref).max()
    err_hi = np.abs(got_hi - ref).max()
    assert err_split <= 3 * err_hi + 1e-6

    h, g = _random_integrals(2 * 4, seed=7)
    ops64 = S.build_ops(jnp.asarray(h), jnp.asarray(g), tabs64)
    ops32 = S.build_ops(jnp.asarray(h, jnp.float32),
                        jnp.asarray(g, jnp.float32), tabs32)

    def vag(dtype, tabs, ops):
        f = lambda t: S.quadform(
            S.apply_gates(jnp.asarray(V0, dtype), t, tabs), ops, tabs)
        return jax.value_and_grad(f)(jnp.asarray(th, dtype))

    v64, g64 = vag(jnp.float64, tabs64, ops64)
    v32, g32 = vag(jnp.float32, tabs32, ops32)
    sp.force_split(False)
    vhi, ghi = vag(jnp.float32, tabs32, ops32)
    sp.force_split(True)
    assert abs(float(v32) - float(v64)) <= 3 * abs(float(vhi)
                                                   - float(v64)) + 1e-5
    gerr_split = np.abs(np.asarray(g32) - np.asarray(g64)).max()
    gerr_hi = np.abs(np.asarray(ghi) - np.asarray(g64)).max()
    assert gerr_split <= 3 * gerr_hi + 1e-5


def test_sigma_and_rdms_split_match_f64(forced_split):
    """Dense-path sigma, quadform and RDMs at f32+split match the f64
    oracle to f32 rounding."""
    n, parts = 4, (2, 2)
    _, sec = _sector(n, parts)
    tabs64 = sec.device_tables(np.float64)
    tabs32 = sec.device_tables(np.float32)
    h, g = _random_integrals(2 * n, seed=5)
    ops64 = S.build_ops(jnp.asarray(h), jnp.asarray(g), tabs64)
    ops32 = S.build_ops(jnp.asarray(h, jnp.float32),
                        jnp.asarray(g, jnp.float32), tabs32)
    st = sec._str_tabs
    rng = np.random.default_rng(9)
    V = rng.normal(size=(len(st.B), len(st.A)))
    V = V / np.linalg.norm(V)

    s64 = np.asarray(S.sigma(jnp.asarray(V, jnp.float64), ops64, tabs64))
    s32 = np.asarray(S.sigma(jnp.asarray(V, jnp.float32), ops32, tabs32))
    assert np.abs(s32 - s64).max() < 5e-5 * max(1.0, np.abs(s64).max())

    q64 = float(S.quadform(jnp.asarray(V, jnp.float64), ops64, tabs64))
    q32 = float(S.quadform(jnp.asarray(V, jnp.float32), ops32, tabs32))
    assert abs(q32 - q64) < 5e-5 * max(1.0, abs(q64))

    maps = S.build_rdm_maps(n, q_pad=tabs64["MA"].shape[0])
    gam64, Gam64 = S.rdms(jnp.asarray(V, jnp.float64), tabs64, maps)
    gam32, Gam32 = S.rdms(jnp.asarray(V, jnp.float32), tabs32, maps)
    assert np.abs(np.asarray(gam32) - np.asarray(gam64)).max() < 2e-5
    assert np.abs(np.asarray(Gam32) - np.asarray(Gam64)).max() < 2e-5


def test_compact_split_matches_dense_f64(forced_split):
    """Compact int8-stack kernels at f32+split (sigma, quadform, RDMs)
    match the dense f64 oracle — the N>=32 capacity path keeps its
    accuracy with the halved-pass kernels."""
    n, parts = 4, (2, 2)
    sec = SectorCI(2 * n, parts)
    h, g = _random_integrals(2 * n, seed=13)
    dense64 = sec.device_tables(np.float64)
    comp32 = sec.device_tables(np.float32, storage="compact")
    ops64 = S.build_ops(jnp.asarray(h), jnp.asarray(g), dense64)
    ops32 = S.build_ops(jnp.asarray(h, jnp.float32),
                        jnp.asarray(g, jnp.float32), comp32)
    rng = np.random.default_rng(2)
    V = rng.normal(size=(sec.nB, sec.nA))
    V = V / np.linalg.norm(V)

    s64 = np.asarray(S.sigma(jnp.asarray(V, jnp.float64), ops64, dense64))
    s32 = np.asarray(S.sigma(jnp.asarray(V, jnp.float32), ops32, comp32))
    assert np.abs(s32 - s64).max() < 5e-5 * max(1.0, np.abs(s64).max())

    maps_d = S.build_rdm_maps(n, q_pad=dense64["MA"].shape[0])
    maps_c = S.build_rdm_maps(n, q_pad=comp32["MA8"].shape[0])
    gam64, Gam64 = S.rdms(jnp.asarray(V, jnp.float64), dense64, maps_d)
    gam32, Gam32 = S.rdms(jnp.asarray(V, jnp.float32), comp32, maps_c)
    assert np.abs(np.asarray(gam32) - np.asarray(gam64)).max() < 2e-5
    assert np.abs(np.asarray(Gam32) - np.asarray(Gam64)).max() < 2e-5
