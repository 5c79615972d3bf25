"""On-chip measurement of the N2 cc-pVDZ heavier-molecule showcase
(round-5 verdict item 4): frozen-core N2, OptOrb 52 -> 16 spin orbitals,
FusedOptOrbCASSCF (exact) and string-UCC FusedOptOrbVQE, f32 on the
default device (v5e under axon).  Prints one JSON line; results go into
docs/PERF.md "Round-5 N2 showcase".

Run standalone (NEVER concurrently with bench — a worker crash kills
every in-flight client):  python scripts/probe_n2_showcase.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.makedirs(os.path.expanduser("~/.cache/esoo_jax"), exist_ok=True)
import jax  # noqa: E402

from esoo_tpu.utils import xla_cache  # noqa: E402

xla_cache.setup(jax)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from esoo_tpu.chem import MoleculeDriver  # noqa: E402
from esoo_tpu.orbital_optimization import (FusedOptOrbCASSCF,  # noqa: E402
                                           FusedOptOrbVQE)
from esoo_tpu.sim import HartreeFock, UCCSD  # noqa: E402


def main():
    out = {"probe": "n2_ccpvdz_showcase", "device": str(jax.devices()[0])}
    t0 = time.perf_counter()
    p = MoleculeDriver(atom="N 0 0 0; N 0 0 1.0977",
                       basis="cc-pvdz").run()
    active = p.active_space()
    offset = active.core_energy + p.nuclear_repulsion_energy
    out["build_s"] = round(time.perf_counter() - t0, 1)
    out["rhf_total"] = p.scf.energy_electronic + p.nuclear_repulsion_energy

    # device-put the m=26 active tensors once (tiny vs H8, but keeps the
    # ctor transfer out of the timings)
    h_sp, g_sp = active.spatial_integral_tensors()
    h_dev = jax.device_put(np.asarray(h_sp, np.float32))
    g_dev = jax.device_put(np.asarray(g_sp, np.float32))
    parts = tuple(int(x) for x in active.num_particles)

    class _P:
        num_particles = parts

        def spatial_integral_tensors(self):
            return h_dev, g_dev

    def cas_make():
        return FusedOptOrbCASSCF(num_spin_orbitals=16, problem=_P(),
                                 maxiter=12, stopping_tolerance=1e-6,
                                 dtype=jnp.float32, diagnostics=False)

    t0 = time.perf_counter()
    r = cas_make().compute_minimum_energy()
    out["casscf_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    r = cas_make().compute_minimum_energy()
    out["casscf_warm_s"] = round(time.perf_counter() - t0, 2)
    out["casscf_total"] = float(r.eigenvalue + offset)
    out["casscf_outers"] = int(r.outer_iterations)

    ansatz = UCCSD(8, parts, initial_state=HartreeFock(8, parts))

    def ucc_make():
        return FusedOptOrbVQE(num_spin_orbitals=16, ansatz=ansatz,
                              problem=_P(), maxiter=10,
                              stopping_tolerance=1e-5,
                              simulation="sector", dtype=jnp.float32,
                              diagnostics=False)

    t0 = time.perf_counter()
    r = ucc_make().compute_minimum_energy()
    out["ucc_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    r = ucc_make().compute_minimum_energy()
    out["ucc_warm_s"] = round(time.perf_counter() - t0, 2)
    out["ucc_total"] = float(r.eigenvalue + offset)
    out["ucc_outers"] = int(r.outer_iterations)
    out["ucc_minus_cas_mha"] = round(
        (out["ucc_total"] - out["casscf_total"]) * 1e3, 3)
    print("N2JSON " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
