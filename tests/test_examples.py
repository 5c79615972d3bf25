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


@pytest.mark.slow
def test_lih_optorbvqe_example():
    out = _run("examples/LiH_OptOrbVQE.py")
    tot = [ln for ln in out.splitlines()
           if ln.startswith("OptOrbVQE total energy")][0]
    e_total = float(tot.split(":")[1].split("Ha")[0])
    assert -8.0087 - 1e-3 < e_total < -7.98368   # between full FCI and RHF


@pytest.mark.slow
def test_h3_open_shell_example():
    out = _run("examples/H3_OpenShell_OptOrbVQE.py")
    line = [ln for ln in out.splitlines()
            if ln.startswith("OptOrbVQE electronic energy")][0]
    e = float(line.split(":")[1].split("Ha")[0])
    assert e < -3.0399   # beats the full STO-3G sector optimum


@pytest.mark.slow
def test_h2o_optorbvqe_example():
    out = _run("examples/H2O_OptOrbVQE.py")
    rhf = float([ln for ln in out.splitlines()
                 if ln.startswith("RHF total")][0].split(":")[1].split("Ha")[0])
    tot = float([ln for ln in out.splitlines()
                 if ln.startswith("OptOrbVQE total")][0].split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(rhf, -76.0107, atol=5e-4)
    assert tot < rhf - 5e-3      # captures >5 mHa of correlation
    assert tot > -76.5           # sane (variational, not absurd)


def test_h2_sector_callbacks_checkpoint_example():
    out = _run("examples/H2_Sector_Callbacks_Checkpoint.py")
    assert "checkpoints written:" in out and "resumed:" in out
    line = [ln for ln in out.splitlines() if ln.startswith("converged:")][0]
    energy = float(line.split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(energy, -1.8661, atol=5e-4)


@pytest.mark.slow
def test_h2s_frozen_core_example():
    out = _run("examples/H2S_FrozenCore_OptOrbVQE.py")
    line = [ln for ln in out.splitlines() if ln.startswith("H2S total")][0]
    total = float(line.split(":")[1].split("Ha")[0])
    # below the RHF total (correlation), above a generous bound
    assert -394.9 < total < -394.3116


def test_custom_basis_gbs_example():
    out = _run("examples/Custom_Basis_GBS.py")
    assert "identical" in out


@pytest.mark.slow
def test_h4_casscf_example():
    out = _run("examples/H4_CASSCF.py")
    line = [ln for ln in out.splitlines()
            if ln.startswith("FusedOptOrbCASSCF")][0]
    energy = float(line.split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(energy, -4.032159, atol=5e-4)
    assert "FusedOptOrbSACASSCF" in out


def test_lih_spectrum_properties_example():
    out = _run("examples/LiH_Spectrum_Properties.py")
    # the example asserts the exact spin selection rule internally;
    # anchor the allowed X->A oscillator strength here
    line = [ln for ln in out.splitlines() if "allowed X->A" in ln][0]
    f = float(line.split("f =")[1])
    np.testing.assert_allclose(f, 0.1768, atol=2e-3)


@pytest.mark.slow
def test_lih_geometry_optimization_example():
    out = _run("examples/LiH_Geometry_Optimization.py")
    line = [ln for ln in out.splitlines()
            if ln.startswith("equilibrium bond length")][0]
    r_angstrom = float(line.split("=")[1].split("A")[0])
    # FCI/STO-3G LiH equilibrium ~1.55 A
    np.testing.assert_allclose(r_angstrom, 1.548, atol=0.02)


@pytest.mark.slow
def test_h2o_geometry_frequencies_example():
    out = _run("examples/H2O_Geometry_Frequencies.py")
    # FCI/STO-3G water: r(OH) ~1.028 A, angle ~96.8 deg, three real modes
    line = [ln for ln in out.splitlines() if ln.startswith("r(OH)")][0]
    r = float(line.split("=")[1].split("/")[0])
    np.testing.assert_allclose(r, 1.0285, atol=0.01)
    bend = float([ln for ln in out.splitlines() if "bend" in ln][0]
                 .split(":")[1].split("cm")[0])
    assert 1800 < bend < 2300


def test_h2_spectroscopy_thermo_example():
    out = _run("examples/H2_Spectroscopy_Thermo.py")
    # Raman-active (mutual exclusion asserted inside the example), and
    # the RRHO standard entropy lands by the JANAF value
    raman = float([ln for ln in out.splitlines()
                   if "Raman activity" in ln][0]
                  .split(":")[1].split("A^4")[0])
    assert raman > 1.0
    s = float([ln for ln in out.splitlines() if "S(total)" in ln][0]
              .split("=")[1].split("J")[0])
    np.testing.assert_allclose(s, 130.68, atol=1.5)


@pytest.mark.slow   # ~47 s; the MP2/active-space contract is pinned
# by test_mp2.py + test_active_space.py in the fast tier
def test_mp2_activespace_example():
    out = _run("examples/MP2_ActiveSpace_OptOrbVQE.py")
    # the MP2-selected compressed space must beat MP2 itself
    # (asserted inside the example); check the printed recovery
    pct = float([ln for ln in out.splitlines()
                 if "correlation recovered" in ln][0]
                .split("(")[1].split("%")[0])
    assert pct > 100.0
    assert "selected active space: 6 spatial" in out
    assert "(Li core)" in out and "(Li-H bond)" in out


@pytest.mark.slow
def test_h3_reaction_barrier_example():
    out = _run("examples/H3_Reaction_Barrier.py")
    b = float([ln for ln in out.splitlines()
               if ln.startswith("classical barrier")][0]
              .split(":")[1].split("kcal")[0])
    np.testing.assert_allclose(b, 20.57, atol=0.3)
    assert "1 negative mode" in out
    assert "imaginary (reaction coordinate)" in out


def test_h2o_method_ladder_example():
    out = _run("examples/H2O_Method_Ladder.py")
    # CCSD recovers ~99.8% of the exact correlation, CCSD(T) more
    pct = {ln.split()[0]: float(ln.split()[-1])
           for ln in out.splitlines()
           if ln.strip().startswith(("HF", "MP2", "CISD", "CCSD"))}
    assert pct["MP2"] > 60
    assert pct["MP2"] < pct["CISD"] < pct["CCSD"]
    assert pct["CCSD"] > 99
    assert pct["CCSD(T)"] > pct["CCSD"]


def test_h2_dissociation_curve_example():
    out = _run("examples/H2_Dissociation_Curve.py")
    # exact atomic limit, RHF catastrophe, MP2 collapse (asserted
    # inside); spot-check the printed diagnostics
    assert "FCI reaches the atomic limit to 0.000 mHa" in out
    assert "ionic-term catastrophe" in out


@pytest.mark.slow
def test_n2_ccpvdz_casscf_ucc_example():
    out = _run("examples/N2_ccpVDZ_CASSCF_UCC.py")
    line = [ln for ln in out.splitlines() if "OptOrb-CASSCF" in ln][0]
    energy = float(line.split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(energy, -109.102359, atol=5e-4)
    line = [ln for ln in out.splitlines() if "OptOrb-UCCSD" in ln][0]
    energy = float(line.split(":")[1].split("Ha")[0])
    np.testing.assert_allclose(energy, -109.100871, atol=5e-4)
