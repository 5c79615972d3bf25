"""Restricted Hartree-Fock with DIIS (host-side, numpy float64).

Produces the MO coefficients that define the "large starting basis" the
OptOrb solvers reduce from — the role PySCF's SCF played upstream of the
reference library (its examples run PySCFDriver which performs RHF before
handing integrals to qiskit-nature; see /root/reference/examples/H2_OptOrbVQE.py:18-22).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.linalg import eigh


@dataclasses.dataclass
class SCFResult:
    energy_total: float
    energy_electronic: float
    nuclear_repulsion: float
    mo_coeff: np.ndarray       # (nbf, nmo)
    mo_energy: np.ndarray
    converged: bool
    n_iter: int


def nuclear_repulsion(charges, centers) -> float:
    e = 0.0
    n = len(charges)
    for i in range(n):
        for j in range(i):
            e += charges[i] * charges[j] / np.linalg.norm(centers[i] - centers[j])
    return float(e)


def rhf(S, hcore, eri, n_electrons, charges, centers,
        max_iter: int = 100, conv_tol: float = 1e-10,
        diis_size: int = 8) -> SCFResult:
    """Closed-shell restricted Hartree-Fock.

    Args:
        S: overlap matrix (nbf, nbf).
        hcore: T + V core Hamiltonian.
        eri: two-electron integrals (pq|rs), chemist notation.
        n_electrons: total electron count (must be even).
    """
    if n_electrons % 2:
        raise ValueError("rhf requires an even number of electrons")
    nocc = n_electrons // 2
    e_nn = nuclear_repulsion(charges, centers)

    # symmetric orthogonalization with linear-dependency screening
    sval, svec = np.linalg.eigh(S)
    keep = sval > 1e-10
    X = svec[:, keep] / np.sqrt(sval[keep])

    def fock(D):
        J = np.einsum("pqrs,rs->pq", eri, D, optimize=True)
        K = np.einsum("prqs,rs->pq", eri, D, optimize=True)
        return hcore + 2.0 * J - K

    def solve(F):
        Fp = X.T @ F @ X
        eps, Cp = np.linalg.eigh(Fp)
        C = X @ Cp
        return eps, C

    eps, C = solve(hcore)
    D = C[:, :nocc] @ C[:, :nocc].T

    diis_F, diis_err = [], []
    e_old = 0.0
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        F = fock(D)
        # DIIS extrapolation
        err = F @ D @ S - S @ D @ F
        diis_F.append(F.copy())
        diis_err.append(err.copy())
        if len(diis_F) > diis_size:
            diis_F.pop(0)
            diis_err.pop(0)
        if len(diis_F) > 1:
            m = len(diis_F)
            B = -np.ones((m + 1, m + 1))
            B[m, m] = 0.0
            for i in range(m):
                for j in range(m):
                    B[i, j] = np.sum(diis_err[i] * diis_err[j])
            rhs = np.zeros(m + 1)
            rhs[m] = -1.0
            try:
                w = np.linalg.solve(B, rhs)[:m]
                F = sum(wi * Fi for wi, Fi in zip(w, diis_F))
            except np.linalg.LinAlgError:
                pass
        eps, C = solve(F)
        D = C[:, :nocc] @ C[:, :nocc].T
        e_elec = float(np.sum(D * (hcore + fock(D))))
        if abs(e_elec - e_old) < conv_tol and it > 2:
            converged = True
            break
        e_old = e_elec

    e_elec = float(np.sum(D * (hcore + fock(D))))
    return SCFResult(
        energy_total=e_elec + e_nn,
        energy_electronic=e_elec,
        nuclear_repulsion=e_nn,
        mo_coeff=C,
        mo_energy=eps,
        converged=converged,
        n_iter=it,
    )
