"""Smoke tests: the shipped examples must run verbatim (user surface)."""

import contextlib
import io
import runpy

import numpy as np
import pytest


def _run(path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        runpy.run_path(path, run_name="__main__")
    return buf.getvalue()


@pytest.mark.slow
def test_h2_optorbvqe_example():
    out = _run("examples/H2_OptOrbVQE.py")
    energy = float(out.strip().splitlines()[-2].split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(energy, -1.8661, atol=5e-4)


@pytest.mark.slow
def test_h2_fused_and_sharded_example():
    out = _run("examples/H2_Fused_and_Sharded.py")
    assert "FusedOptOrbVQE" in out and "FusedOptOrbSSVQE" in out
    line = [ln for ln in out.splitlines() if ln.startswith("FusedOptOrbVQE")][0]
    energy = float(line.split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(energy, -1.87115, atol=5e-4)
