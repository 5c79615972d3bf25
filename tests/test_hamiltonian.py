"""Unit tests: active-space Hamiltonian builder (ops/hamiltonian.py)."""

import numpy as np

from conftest import random_hermitian_tensors
from esoo_tpu.ops import (ActiveSpaceHamiltonianBuilder, FermionicOp,
                          JordanWignerMapper)


def brute_force_matrix(h, g):
    """Direct JW mapping of each term — independent oracle."""
    N = h.shape[0]
    mapper = JordanWignerMapper()
    dim = 1 << N
    H = np.zeros((dim, dim), dtype=complex)
    for p in range(N):
        for q in range(N):
            if abs(h[p, q]) > 0:
                H += h[p, q] * mapper.map(
                    FermionicOp({f"+_{p} -_{q}": 1.0}, N)).to_matrix()
    for p in range(N):
        for q in range(N):
            for r in range(N):
                for s in range(N):
                    if abs(g[p, q, r, s]) > 0:
                        H += g[p, q, r, s] * mapper.map(FermionicOp(
                            {f"+_{p} +_{q} -_{s} -_{r}": 1.0}, N)).to_matrix()
    return H


def test_builder_vs_brute_force_random():
    h, g = random_hermitian_tensors(3, seed=7)
    built = ActiveSpaceHamiltonianBuilder(3).build(h, g).to_matrix()
    np.testing.assert_allclose(built, brute_force_matrix(h, g), atol=1e-11)


def test_h2_sto3g_spectrum(h2_sto3g):
    """Ground state matches the published H2/STO-3G FCI electronic energy
    (reference README.md:95, tests/test_ssvqe.py:87)."""
    h, g = h2_sto3g.integral_tensors()
    H = ActiveSpaceHamiltonianBuilder(4).build(h, g).to_matrix()
    w = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(w[0], -1.85727503, atol=1e-6)


def test_fermionic_tag_attached(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    op = ActiveSpaceHamiltonianBuilder(4).build(h, g)
    th, tg = op.fermionic
    np.testing.assert_allclose(th, h)
    np.testing.assert_allclose(tg, g)
