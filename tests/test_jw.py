"""Unit tests: Jordan-Wigner mapping (ops/jw.py, ops/fermion.py)."""

import numpy as np

from esoo_tpu.ops import FermionicOp, JordanWignerMapper

mapper = JordanWignerMapper()
N = 4


def ladder_matrix(p, creation):
    op = FermionicOp({("+_" if creation else "-_") + str(p): 1.0}, N)
    return mapper.map(op).to_matrix()


def test_canonical_anticommutation():
    for p in range(N):
        for q in range(N):
            a_p = ladder_matrix(p, False)
            adag_q = ladder_matrix(q, True)
            acomm = a_p @ adag_q + adag_q @ a_p
            want = np.eye(1 << N) if p == q else np.zeros((1 << N, 1 << N))
            np.testing.assert_allclose(acomm, want, atol=1e-13)


def test_nilpotency():
    for p in range(N):
        a_p = ladder_matrix(p, False)
        np.testing.assert_allclose(a_p @ a_p, 0.0, atol=1e-14)


def test_number_operator():
    # a+_p a_p has eigenvalues {0, 1}: diagonal with bit p of the index
    for p in range(N):
        num = mapper.map(FermionicOp({f"+_{p} -_{p}": 1.0}, N)).to_matrix()
        want = np.diag([(i >> p) & 1 for i in range(1 << N)]).astype(complex)
        np.testing.assert_allclose(num, want, atol=1e-13)


def test_fermionic_adjoint():
    op = FermionicOp({"+_0 +_1 -_3 -_2": 1.5, "+_2 -_0": -0.5}, N)
    m = mapper.map(op).to_matrix()
    madj = mapper.map(op.adjoint()).to_matrix()
    np.testing.assert_allclose(madj, m.conj().T, atol=1e-13)
