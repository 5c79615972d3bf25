"""Water: FCI-quality geometry optimization + harmonic frequencies.

The complete quantum-chemistry workflow on the native stack — no PySCF,
no qiskit, no reference counterpart (the reference consumes one fixed
problem and reports energies only): exact full-space CASSCF (= FCI,
441 determinants for H2O/STO-3G) totals drive BFGS over the nuclear
coordinates, then a finite-difference Hessian with mass-weighting and
translation/rotation projection yields the three normal modes (bend,
symmetric stretch, asymmetric stretch).

Run: python examples/H2O_Geometry_Frequencies.py   (~1-2 min on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from esoo_tpu.chem import (casscf_energy_fn,  # noqa: E402
                           harmonic_frequencies, optimize_geometry)
from esoo_tpu.chem.basis import parse_geometry  # noqa: E402


def main():
    energy = casscf_energy_fn(basis="sto-3g")    # full space = FCI

    print("optimizing H2O (FCI/STO-3G):")
    res = optimize_geometry(
        "O 0 0 0.12; H 0 0.76 -0.47; H 0 -0.76 -0.47", energy,
        callback=lambda atom, e, g: print(
            f"  E = {e:+.8f} Ha   max|dE/dR| = {np.abs(g).max():.2e}"))
    assert res["converged"]

    _, c = parse_geometry(res["atom"])
    r1 = np.linalg.norm(c[1] - c[0])
    r2 = np.linalg.norm(c[2] - c[0])
    cosang = (c[1] - c[0]) @ (c[2] - c[0]) / (r1 * r2)
    angle = np.degrees(np.arccos(cosang))
    print(f"\nE = {res['energy']:.8f} Ha")
    print(f"r(OH) = {r1 * 0.52917721092:.4f} / "
          f"{r2 * 0.52917721092:.4f} A,  angle = {angle:.2f} deg")

    print("\nharmonic analysis:")
    vib = harmonic_frequencies(res["atom"], energy)
    f = vib["frequencies_cm1"]
    print(f"  projected trans/rot residuals: "
          f"max {np.abs(f[:-3]).max():.1f} cm^-1")
    labels = ["bend", "symmetric stretch", "asymmetric stretch"]
    for lab, nu in zip(labels, sorted(f[-3:])):
        print(f"  {lab:>20}: {nu:8.1f} cm^-1")

    assert vib["n_vibrations"] == 3
    assert (f[-3:] > 500).all()


if __name__ == "__main__":
    main()
