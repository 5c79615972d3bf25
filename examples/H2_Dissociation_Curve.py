"""H2 dissociation: where mean-field and perturbation theory fail.

The textbook bond-breaking story computed entirely in-package: along
the H2/STO-3G dissociation curve, restricted HF overshoots the atomic
limit by ~0.25 Ha (it cannot separate the ionic terms), MP2 dives
BELOW the exact curve (non-variational perturbation theory on a
vanishing HOMO-LUMO gap), while the exact sector diagonalization
(casscf_energy_fn = FCI) dissociates cleanly to two free hydrogen
atoms.  For two electrons CCSD is exact, so it reproduces FCI at every
point — printed as the consistency column.

Run: python examples/H2_Dissociation_Curve.py   (~30 s on CPU)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from esoo_tpu.chem import (MoleculeDriver, casscf_energy_fn,  # noqa: E402
                           ccsd, mp2)


def main():
    e_fci = casscf_energy_fn(basis="sto-3g")
    e_h = casscf_energy_fn(basis="sto-3g", spin=1)("H 0 0 0")
    print(f"2 x E(H atom) = {2 * e_h:.6f} Ha (the exact limit)\n")
    print(f"{'r (A)':>6} {'HF':>11} {'MP2':>11} {'CCSD':>11} "
          f"{'FCI':>11}")

    rows = []
    for r in (0.735, 1.2, 2.0, 3.0, 5.0, 8.0):
        atom = f"H 0 0 0; H 0 0 {r}"
        p = MoleculeDriver(atom, basis="sto-3g").run()
        nre = p.nuclear_repulsion_energy
        hf = p.scf.energy_electronic + nre
        m = mp2(p)["e_total"]
        cc = ccsd(p)["e_total"]
        fci = e_fci(atom)
        rows.append((r, hf, m, cc, fci))
        print(f"{r:6.2f} {hf:11.6f} {m:11.6f} {cc:11.6f} {fci:11.6f}")

    r8 = rows[-1]
    print(f"\nat r = 8 A:")
    print(f"  FCI reaches the atomic limit to "
          f"{abs(r8[4] - 2 * e_h) * 1000:.3f} mHa")
    print(f"  RHF overshoots it by {(r8[1] - 2 * e_h):.4f} Ha "
          f"(the ionic-term catastrophe)")
    print(f"  MP2 lands {(r8[2] - r8[4]):.4f} Ha BELOW the exact "
          f"energy (non-variational collapse)")

    assert abs(r8[4] - 2 * e_h) < 1e-4          # FCI limit exact
    assert r8[1] - 2 * e_h > 0.1                # RHF catastrophe
    assert r8[2] < r8[4] - 0.05                 # MP2 collapse
    for r, hf, m, cc, fci in rows:              # CCSD == FCI (2e)
        assert abs(cc - fci) < 1e-7


if __name__ == "__main__":
    main()
