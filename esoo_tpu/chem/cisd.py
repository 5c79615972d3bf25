"""CISD: configuration interaction with singles and doubles (+Q).

Completes the CI rung of the classical method ladder between MP2 and
CCSD, reusing the package's Slater-Condon machinery
(initializations/ci.py — the same determinant convention every solver
shares; reference role: the classical-CI layer of
configuration_interaction_states.py:354, which the reference uses only
for MCVQE initial states, never as an energy method).

CISD is variational (E_FCI <= E_CISD <= E_HF) but famously NOT
size-consistent: E_CISD(A...B at infinity) > E_CISD(A) + E_CISD(B),
because products of monomer doubles are dimer quadruples the truncated
space lacks.  The renormalized Davidson correction
E_Q = (1 - c0^2)/c0^2 * E_corr estimates the missing quadruples from
the ground-state HF-determinant weight c0; the size-consistency test
pins both the failure and the fix.
"""

from typing import Tuple

import numpy as np

__all__ = ["cisd"]


def cisd(problem, k: int = 1) -> dict:
    """CISD through exact diagonalization of the singles+doubles space.

    Args:
        problem: an ElectronicStructureProblem (closed or open shell;
            frozen cores via `problem.active_space(...)` first).
        k: number of CISD roots to report in `energies`.

    Returns a dict:
        e_hf    — electronic energy of the reference determinant
        e_corr  — E_CISD - E_HF (the CISD correlation energy)
        e_elec  — ground-state CISD electronic energy
        e_total — e_elec + nuclear repulsion + core_energy
        c0      — |coefficient of the HF determinant| in the ground state
        davidson_q       — renormalized Davidson correction
                           (1-c0^2)/c0^2 * e_corr
        e_total_q        — e_total + davidson_q  (CISD+Q)
        energies         — the lowest k CISD electronic eigenvalues
        n_determinants   — size of the CISD space
    """
    from ..initializations.ci import (ci_matrix, enumerate_determinants,
                                      hf_determinant)

    # pure-numpy path (like mp2/ccsd): never dispatch through JAX —
    # under the axon backend that would ride the remote-TPU tunnel
    h_so, g_so = problem.integral_tensors()
    n_so = h_so.shape[0]
    num_particles: Tuple[int, int] = tuple(problem.num_particles)
    dets = enumerate_determinants(n_so, num_particles, 2)
    if not 1 <= k <= len(dets):
        raise ValueError(
            f"k={k} outside the CISD space of {len(dets)} determinants")
    H = ci_matrix(dets, h_so, g_so)
    w, v = np.linalg.eigh(H)
    hf_idx = dets.index(hf_determinant(n_so, num_particles))
    e_hf = float(H[hf_idx, hf_idx])
    e_elec = float(w[0])
    e_corr = e_elec - e_hf
    c0 = float(abs(v[hf_idx, 0]))
    dq = (1.0 - c0 * c0) / (c0 * c0) * e_corr
    offset = (problem.nuclear_repulsion_energy
              + getattr(problem, "core_energy", 0.0))
    return {
        "e_hf": e_hf,
        "e_corr": e_corr,
        "e_elec": e_elec,
        "e_total": e_elec + offset,
        "c0": c0,
        "davidson_q": dq,
        "e_total_q": e_elec + dq + offset,
        "energies": np.asarray(w[:k], dtype=np.float64),
        "n_determinants": len(dets),
    }
