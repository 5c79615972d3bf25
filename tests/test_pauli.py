"""Unit tests: bitmask Pauli algebra (ops/pauli.py)."""

import numpy as np
import pytest

from esoo_tpu.ops.pauli import (SparsePauliOp, label_to_masks, masks_to_label,
                                pauli_mul)

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.diag([1.0, -1.0]).astype(complex)
MATS = {"I": I2, "X": X, "Y": Y, "Z": Z}


def label_matrix(label):
    out = np.eye(1)
    for ch in label:
        out = np.kron(out, MATS[ch])
    return out


def test_label_mask_roundtrip():
    for label in ["IXYZ", "ZZZZ", "IIII", "YXIZ", "XY"]:
        x, z = label_to_masks(label)
        assert masks_to_label(x, z, len(label)) == label


@pytest.mark.parametrize("a", ["I", "X", "Y", "Z"])
@pytest.mark.parametrize("b", ["I", "X", "Y", "Z"])
def test_pauli_mul_single_qubit(a, b):
    xa, za = label_to_masks(a)
    xb, zb = label_to_masks(b)
    x, z, phase = pauli_mul(xa, za, xb, zb)
    got = phase * label_matrix(masks_to_label(x, z, 1))
    want = MATS[a] @ MATS[b]
    np.testing.assert_allclose(got, want, atol=1e-14)


def test_to_matrix_vs_kron():
    op = SparsePauliOp.from_list([("XYZI", 0.5), ("ZZII", -1.25),
                                  ("IIXY", 2.0 + 1.0j)])
    want = (0.5 * label_matrix("XYZI") - 1.25 * label_matrix("ZZII")
            + (2.0 + 1.0j) * label_matrix("IIXY"))
    np.testing.assert_allclose(op.to_matrix(), want, atol=1e-13)


def test_compose_matches_matrix_product():
    a = SparsePauliOp.from_list([("XY", 1.0), ("ZI", 0.5j)])
    b = SparsePauliOp.from_list([("YX", -2.0), ("IZ", 1.0)])
    np.testing.assert_allclose((a @ b).to_matrix(),
                               a.to_matrix() @ b.to_matrix(), atol=1e-13)


def test_adjoint_and_hermiticity():
    herm = SparsePauliOp.from_list([("XX", 1.0), ("YY", -0.5)])
    assert herm.is_hermitian()
    nonherm = SparsePauliOp.from_list([("XX", 1.0j)])
    assert not nonherm.is_hermitian()
    np.testing.assert_allclose(nonherm.adjoint().to_matrix(),
                               nonherm.to_matrix().conj().T, atol=1e-14)


def test_simplify_merges_and_drops():
    op = SparsePauliOp.from_list([("XZ", 1.0), ("XZ", -1.0), ("IZ", 2.0)])
    s = op.simplify()
    assert len(s) == 1
    assert s.to_list()[0][0] == "IZ"


def test_equiv():
    a = SparsePauliOp.from_list([("XZ", 1.0), ("IZ", 2.0)])
    b = SparsePauliOp.from_list([("IZ", 2.0), ("XZ", 1.0)])
    assert a.equiv(b)
    assert not a.equiv(b * 1.0000001)
