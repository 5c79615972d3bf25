"""Tests: native C++ integral engine vs the pure-Python oracle."""

import numpy as np
import pytest

from esoo_tpu.chem.basis import ATOMIC_NUMBERS, build_shells
from esoo_tpu.chem.integrals import IntegralEngine
from esoo_tpu.native import native_available


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ unavailable")


@pytest.mark.parametrize("basis", ["sto-3g", "6-31g", "cc-pvdz", "cc-pvtz"])
def test_native_eri_matches_python(basis):
    shells, symbols, coords = build_shells("H 0 0 0; H 0 0 0.735", basis)
    charges = np.array([ATOMIC_NUMBERS[s] for s in symbols], dtype=float)
    eng = IntegralEngine(shells, charges, coords)
    g_native = eng.eri(use_native=True)
    g_python = eng.eri(use_native=False)
    np.testing.assert_allclose(g_native, g_python, atol=1e-13)


def test_native_eri_heteronuclear_sto3g():
    shells, symbols, coords = build_shells("Li 0 0 0; H 0 0 1.6", "sto-3g")
    charges = np.array([ATOMIC_NUMBERS[s] for s in symbols], dtype=float)
    eng = IntegralEngine(shells, charges, coords)
    np.testing.assert_allclose(eng.eri(use_native=True),
                               eng.eri(use_native=False), atol=1e-13)


@pytest.mark.slow
def test_native_eri_f_shells():
    """cc-pVQZ includes l=3 (f) shells — highest-angular-momentum path."""
    shells, symbols, coords = build_shells("H 0 0 0; H 0 0 0.735", "cc-pvqz")
    charges = np.array([ATOMIC_NUMBERS[s] for s in symbols], dtype=float)
    eng = IntegralEngine(shells, charges, coords)
    np.testing.assert_allclose(eng.eri(use_native=True),
                               eng.eri(use_native=False), atol=1e-12)
