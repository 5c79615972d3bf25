"""String-factorized sector kernels (sim/strings.py) vs the pairwise
oracles of sim/sector.py — exact-equality contracts for the MXU fast
path (state, sigma/quadform, gradients, tabled variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esoo_tpu.sim import HartreeFock, UCCSD
from esoo_tpu.sim import strings as S
from esoo_tpu.sim.sector import SectorUCC

jax.config.update("jax_enable_x64", True)


def _random_integrals(N, seed=0):
    """Spin-orbital (h, g) with the physicist symmetries the package's
    ingestion produces (real orbitals)."""
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(N, N))
    h = jnp.asarray((h + h.T) / 2)
    g0 = rng.normal(size=(N, N, N, N))
    g = (g0 + g0.transpose(1, 0, 3, 2) + g0.transpose(2, 3, 0, 1)
         + g0.transpose(3, 2, 1, 0))
    return h, jnp.asarray(g)


SHAPES = [(2, (1, 1)), (4, (2, 2)), (3, (2, 1)), (4, (1, 1)),
          (4, (3, 2))]


@pytest.mark.parametrize("n,parts", SHAPES)
def test_factorization_exists_and_state_exact(n, parts):
    """Every UCCSD sector factorizes (incl. open shells), and the
    factorized gate scan reproduces the pairwise scan exactly."""
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec_s = SectorUCC(ansatz, 2 * n, kernel="strings")
    sec_p = SectorUCC(ansatz, 2 * n, kernel="pairs")
    assert sec_s.kernel == "strings"
    rng = np.random.default_rng(3)
    th = jnp.asarray(rng.normal(size=ansatz.num_parameters) * 0.4)
    np.testing.assert_array_equal(np.asarray(sec_s.state(th)),
                                  np.asarray(sec_p.state(th)))


@pytest.mark.parametrize("n,parts", SHAPES)
def test_sigma_matrix_equals_dense_hamiltonian(n, parts):
    """The string sigma operator, materialized column by column, IS the
    sector Hamiltonian (machine precision, random symmetric g)."""
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec = SectorUCC(ansatz, 2 * n, kernel="strings")
    sec_p = SectorUCC(ansatz, 2 * n, kernel="pairs")
    N = 2 * n
    h, g = _random_integrals(N, seed=n * 10 + parts[0])
    tabs = sec._str_tabs._asdict()
    ops = S.build_ops(h, g, tabs)
    nA, nB = len(sec._str_tabs.A), len(sec._str_tabs.B)
    nd = sec.dim
    Hs = np.zeros((nd, nd))
    for i in range(nd):
        e = np.zeros(nd)
        e[i] = 1.0
        Hs[:, i] = np.asarray(
            S.sigma(jnp.asarray(e.reshape(nB, nA)), ops, tabs)).reshape(-1)
    Hd = np.asarray(sec_p.build_hamiltonian(h, g))
    np.testing.assert_allclose(Hs, Hd, atol=1e-12)


@pytest.mark.parametrize("n,parts", [(4, (2, 2)), (3, (2, 1))])
def test_energy_and_gradient_match_pairs(n, parts):
    """energy_values value_and_grad through the string kernels (incl.
    the reversible custom VJP of the gate scan) equals the pairwise
    path."""
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec_s = SectorUCC(ansatz, 2 * n, kernel="strings")
    sec_p = SectorUCC(ansatz, 2 * n, kernel="pairs")
    N = 2 * n
    h, g = _random_integrals(N, seed=7)
    th = jnp.asarray(
        np.random.default_rng(5).normal(size=ansatz.num_parameters) * 0.3)
    vs, gs = jax.value_and_grad(
        lambda t: sec_s.energy_values(t, sec_s.build_values(h, g)))(th)
    vp, gp = jax.value_and_grad(
        lambda t: sec_p.energy_values(t, sec_p.build_values(h, g)))(th)
    np.testing.assert_allclose(float(vs), float(vp), atol=1e-11)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gp), atol=1e-10)


def test_reversible_vjp_equals_autodiff():
    """The O(1)-residual reversible VJP of the factorized gate scan
    equals plain autodiff through the un-decorated scan."""
    n, parts = 4, (2, 2)
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec = SectorUCC(ansatz, 2 * n, kernel="strings")
    st = sec._str_tabs
    nA, nB = len(st.A), len(st.B)
    tabs = st._asdict()
    rng = np.random.default_rng(11)
    th = jnp.asarray(rng.normal(size=ansatz.num_parameters) * 0.5)
    V0 = jnp.asarray(rng.normal(size=(nB, nA)))
    V0 = V0 / jnp.linalg.norm(V0)
    W = jnp.asarray(rng.normal(size=(nB, nA)))

    def loss_rev(v0, t):
        return jnp.sum(W * S.apply_gates(v0, t, tabs))

    def loss_plain(v0, t):
        return jnp.sum(W * S._apply_gates_str(v0, t, tabs))

    gv_r, gt_r = jax.grad(loss_rev, argnums=(0, 1))(V0, th)
    gv_p, gt_p = jax.grad(loss_plain, argnums=(0, 1))(V0, th)
    np.testing.assert_allclose(np.asarray(gv_r), np.asarray(gv_p),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_p),
                               atol=1e-11)


def test_tabled_arguments_path_exact():
    """device_tables-as-arguments variants equal the constants kernels
    (value, gradient, rdms) — the N>=16 transport path."""
    n, parts = 4, (2, 2)
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec = SectorUCC(ansatz, 2 * n)
    assert sec.kernel == "strings"
    N = 2 * n
    h, g = _random_integrals(N, seed=13)
    T = jax.device_put(sec.device_tables())
    # the string tables are ~100x smaller than the pairwise set: no
    # (K, nd) gate fields, no (nd, maxdeg) row tables
    assert "PARTNER" not in T and "VIDX" not in T
    th = jnp.asarray(
        np.random.default_rng(17).normal(size=ansatz.num_parameters) * 0.3)

    def e_const(t):
        return sec.energy_values(t, sec.build_values(h, g))

    def e_tab(t):
        return sec.energy_values(t, sec.build_values(h, g, tables=T),
                                 tables=T)

    v1, g1 = jax.value_and_grad(e_const)(th)
    v2, g2 = jax.value_and_grad(e_tab)(th)
    np.testing.assert_allclose(float(v1), float(v2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)
    r1 = sec.rdms(sec.state(th))
    r2 = sec.rdms(sec.state(th, tables=T), tables=T)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))


def test_vmapped_quadform_and_superposition_apply():
    """The excited-state paths vmap quadform_values over states and
    apply gates to non-HF superposition initial vectors."""
    n, parts = 4, (2, 2)
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec_s = SectorUCC(ansatz, 2 * n, kernel="strings")
    sec_p = SectorUCC(ansatz, 2 * n, kernel="pairs")
    N = 2 * n
    h, g = _random_integrals(N, seed=19)
    rng = np.random.default_rng(23)
    th = jnp.asarray(rng.normal(size=ansatz.num_parameters) * 0.3)
    v0 = np.zeros(sec_s.dim + 1)
    v0[0] = v0[3] = 1 / np.sqrt(2)    # determinant superposition
    v0 = jnp.asarray(v0)
    a_s = sec_s.apply(v0, th)
    a_p = sec_p.apply(v0, th)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_p),
                               atol=1e-12)
    vals_s = sec_s.build_values(h, g)
    vals_p = sec_p.build_values(h, g)
    vs = jnp.stack([sec_s.state(th), a_s])
    es = jax.vmap(lambda v: sec_s.quadform_values(v, vals_s))(vs)
    ep = jax.vmap(lambda v: sec_p.quadform_values(v, vals_p))(vs)
    np.testing.assert_allclose(np.asarray(es), np.asarray(ep), atol=1e-11)


@pytest.mark.parametrize("n,parts", [(4, (2, 2)), (3, (2, 1)),
                                     (4, (3, 2))])
def test_string_rdms_match_pairs(n, parts):
    """The GEMM-based string RDMs (T-tensor pair correlations + the
    two operator identities) equal the gather-table RDMs bit-for-bit,
    constants and tabled variants."""
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec_s = SectorUCC(ansatz, 2 * n, kernel="strings")
    sec_p = SectorUCC(ansatz, 2 * n, kernel="pairs")
    th = jnp.asarray(
        np.random.default_rng(41).normal(size=ansatz.num_parameters) * 0.4)
    v = sec_s.state(th)
    g1, G1 = sec_s.rdms(v)
    g2, G2 = sec_p.rdms(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-12)
    T = jax.device_put(sec_s.device_tables())
    assert "rdm_SRC" not in T
    g3, G3 = sec_s.rdms(sec_s.state(th, tables=T), tables=T)
    np.testing.assert_array_equal(np.asarray(g3), np.asarray(g1))
    np.testing.assert_array_equal(np.asarray(G3), np.asarray(G1))


def test_explicit_pairs_vals_still_dispatch():
    """quadform_values dispatches on the vals pytree type: Slater-Condon
    triples keep running the pairwise kernel even on a strings-kernel
    instance (oracle access)."""
    n, parts = 3, (2, 1)
    ansatz = UCCSD(n, parts, initial_state=HartreeFock(n, parts))
    sec = SectorUCC(ansatz, 2 * n)
    N = 2 * n
    h, g = _random_integrals(N, seed=29)
    th = jnp.asarray(
        np.random.default_rng(31).normal(size=ansatz.num_parameters) * 0.3)
    v = sec.state(th)
    triple = sec.build_values_pairs(h, g)
    ops = sec.build_values(h, g)
    assert isinstance(ops, dict)
    np.testing.assert_allclose(float(sec.quadform_values(v, triple)),
                               float(sec.quadform_values(v, ops)),
                               atol=1e-11)


# -- compact (int8-stack, operator-chunked) kernels ---------------------------


@pytest.mark.parametrize("n,parts", [(4, (2, 2)), (6, (3, 3)), (4, (3, 2))])
def test_compact_kernels_equal_dense(n, parts):
    """The int8-stack operator-chunked kernel variants (strings.py
    compact section — the single-chip path past ~1M determinants) are
    numerically equal to the dense kernels: build_ops folds, sigma,
    quadform, exact diagonal, and RDMs.  n=6 exercises multi-chunk
    scans plus operator-axis padding (q=36 -> 64)."""
    from esoo_tpu.sim.sector import SectorCI

    N = 2 * n
    sec = SectorCI(N, parts)
    h, g = _random_integrals(N, seed=7 * n + parts[0])
    dense = sec.device_tables(np.float64)
    comp = sec.device_tables(np.float64, storage="compact")
    assert comp["MA8"].dtype == np.int8
    assert comp["MA8"].shape[0] % S._OP_CHUNK == 0
    assert "MA" not in comp

    ops_d = S.build_ops(h, g, dense)
    ops_c = S.build_ops(h, g, comp)
    np.testing.assert_allclose(np.asarray(ops_c["FA"]),
                               np.asarray(ops_d["FA"]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ops_c["FB"]),
                               np.asarray(ops_d["FB"]), atol=1e-12)

    rng = np.random.default_rng(5)
    V = jnp.asarray(rng.normal(size=(sec.nB, sec.nA)))
    V = V / jnp.linalg.norm(V)
    np.testing.assert_allclose(
        np.asarray(S.sigma(V, ops_c, comp)),
        np.asarray(S.sigma(V, ops_d, dense)), atol=1e-11)
    np.testing.assert_allclose(
        float(S.quadform(V, ops_c, comp)),
        float(S.quadform(V, ops_d, dense)), atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(S.diagonal(ops_c, comp)),
        np.asarray(S.diagonal(ops_d, dense)), atol=1e-11)

    maps_d = S.build_rdm_maps(n, q_pad=dense["MA"].shape[0])
    maps_c = S.build_rdm_maps(n, q_pad=comp["MA8"].shape[0])
    gam_d, Gam_d = S.rdms(V, dense, maps_d)
    gam_c, Gam_c = S.rdms(V, comp, maps_c)
    np.testing.assert_allclose(np.asarray(gam_c), np.asarray(gam_d),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(Gam_c), np.asarray(Gam_d),
                               atol=1e-11)


def test_compact_tables_jit_arguments():
    """Compact tables pass through jit as argument pytrees (the
    large-sector program-argument transport) with key-based dispatch."""
    from esoo_tpu.sim.sector import SectorCI

    n, parts = 4, (2, 2)
    sec = SectorCI(2 * n, parts)
    h, g = _random_integrals(2 * n, seed=11)
    comp = sec.device_tables(np.float64, storage="compact")
    dense = sec.device_tables(np.float64)

    @jax.jit
    def energy(h, g, V, tabs):
        ops = S.build_ops(h, g, tabs)
        return S.quadform(V, ops, tabs)

    rng = np.random.default_rng(2)
    V = jnp.asarray(rng.normal(size=(sec.nB, sec.nA)))
    V = V / jnp.linalg.norm(V)
    np.testing.assert_allclose(float(energy(h, g, V, comp)),
                               float(energy(h, g, V, dense)),
                               atol=1e-11)
