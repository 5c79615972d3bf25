"""H2: the complete vibrational-spectroscopy + thermochemistry workflow.

Everything downstream of one FCI-quality potential-energy surface, all
on the native stack (the reference computes no observables beyond the
energy): geometry optimization, harmonic frequencies, IR intensities,
Raman activities, and ideal-gas RRHO thermochemistry.  H2 is the
textbook showcase for the centrosymmetric MUTUAL-EXCLUSION rule — its
one vibration is exactly IR-dark but Raman-active, and the s-only
STO-3G basis makes the depolarization ratio exactly 1/3.

Run: python examples/H2_Spectroscopy_Thermo.py   (~1 min on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from esoo_tpu.chem import (casscf_dipole_fn,  # noqa: E402
                           casscf_energy_fn, casscf_polarizability_fn,
                           harmonic_frequencies, ir_intensities,
                           optimize_geometry, raman_activities,
                           thermochemistry)


def main():
    energy = casscf_energy_fn(basis="sto-3g")      # full space = FCI

    print("optimizing H2 (FCI/STO-3G):")
    res = optimize_geometry("H 0 0 0; H 0 0 0.80", energy)
    assert res["converged"]
    print(f"  E_min = {res['energy']:.8f} Ha at {res['atom']}")

    print("\nharmonic analysis:")
    vib = harmonic_frequencies(res["atom"], energy)
    nu = float(vib["frequencies_cm1"][vib["vib_mask"]].max())
    print(f"  stretch: {nu:.1f} cm^-1")

    print("\nspectroscopy (mutual exclusion in a centrosymmetric "
          "molecule):")
    ir = ir_intensities(res["atom"], casscf_dipole_fn(basis="sto-3g"),
                        vib)
    acts, depol = raman_activities(
        res["atom"], casscf_polarizability_fn(basis="sto-3g"), vib)
    k = np.where(vib["vib_mask"])[0][-1]
    print(f"  IR intensity  : {ir[k]:10.4f} km/mol   (exactly dark)")
    print(f"  Raman activity: {acts[k]:10.4f} A^4/amu "
          f"(rho = {depol[k]:.4f})")
    assert ir[k] < 1e-9        # homonuclear: dark to FD noise
    assert acts[k] > 1.0
    assert abs(depol[k] - 1.0 / 3.0) < 1e-6     # s-only basis: exact

    print("\nideal-gas RRHO thermochemistry (298.15 K, 1 bar):")
    t = thermochemistry(res["atom"], vib, symmetry_number=2,
                        pressure=1e5, electronic_energy=res["energy"])
    print(f"  ZPE            = {t['zpe']:.6f} Ha "
          f"({t['zpe'] * 627.5094740631:.2f} kcal/mol)")
    print(f"  S(total)       = {t['entropy_J_mol_K']:.2f} J/(mol K)  "
          f"[JANAF: 130.68]")
    print(f"  H(298)         = {t['enthalpy']:.6f} Ha")
    print(f"  G(298)         = {t['gibbs_free_energy']:.6f} Ha")
    assert t["n_imaginary"] == 0
    assert t["gibbs_free_energy"] < t["enthalpy"]
    # mass + geometry dominate S; the FCI/STO-3G surface lands within
    # a J/(mol K) of the tabulated standard entropy
    assert abs(t["entropy_J_mol_K"] - 130.68) < 1.5


if __name__ == "__main__":
    main()
