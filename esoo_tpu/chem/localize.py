"""Orbital localization: Pipek-Mezey and Foster-Boys.

Localized molecular orbitals (cores / lone pairs / two-center bonds)
are the standard chemically-motivated starting point for choosing an
OptOrb/CASSCF active space, complementing the MP2-natural-orbital
selector (chem.mp2).  The reference outsources every orbital-machinery
role to PySCF (`pyscf.lo`; ingestion seam at reference
base_opt_orb_solver.py:87-91) — this is the native equivalent.

Both localizers maximize a diagonal-dominance metric over orthogonal
rotations W of a chosen MO window by classic 2x2 Jacobi sweeps
(Edmiston-Ruedenberg style closed-form angle):

- Pipek-Mezey: maximize sum_i sum_A [Q^A_ii]^2, with Q^A the Mulliken
  atomic charge matrix of atom A (Pipek & Mezey, JCP 90, 4916 (1989)).
- Foster-Boys: maximize sum_i |<i|r|i>|^2 — equivalent to minimizing
  the summed orbital spread sum_i (<r^2>_i - <r>_i^2), since the trace
  of r in the rotated window is invariant (Foster & Boys, Rev. Mod.
  Phys. 32, 300 (1960)).

Because the rotation is unitary within the window, the determinant
(and hence any observable of a state occupying that window — SCF
density, energy, dipole) is exactly invariant; tests pin this.
"""

from typing import Optional, Sequence

import numpy as np

__all__ = ["localize_orbitals"]


def _jacobi_maximize(M: np.ndarray, max_sweeps: int, tol: float):
    """Maximize sum_a sum_i M[a, i, i]^2 over orthogonal congruences
    M[a] <- W.T M[a] W by 2x2 Jacobi rotations.

    For a pair (s, t) and angle alpha the metric change is
    A + A*cos(4a) ... with the standard closed form: defining
      A_st = sum_a [ M[a,s,t]^2 - (M[a,s,s] - M[a,t,t])^2 / 4 ]
      B_st = sum_a [ M[a,s,t] * (M[a,s,s] - M[a,t,t]) ]
    the optimal 4*alpha = atan2(B, -A) and the metric gain is
    A + sqrt(A^2 + B^2) >= 0.

    Returns (W, history, converged, sweeps): W (k, k) orthogonal with
    the final M[a] = W.T M0[a] W, history the metric after each sweep
    (history[0] is the initial metric), converged bool.
    """
    M = np.array(M, dtype=np.float64, copy=True)
    k = M.shape[1]
    W = np.eye(k)
    history = [float(np.sum(M.diagonal(axis1=1, axis2=2) ** 2))]
    converged = k < 2
    sweeps = 0
    for sweep in range(max_sweeps if k >= 2 else 0):
        sweeps = sweep + 1
        gain_total = 0.0
        for s in range(k - 1):
            for t in range(s + 1, k):
                mst = M[:, s, t]
                d = M[:, s, s] - M[:, t, t]
                A = float(np.sum(mst * mst - 0.25 * d * d))
                B = float(np.sum(mst * d))
                r = np.hypot(A, B)
                gain = A + r
                if gain <= 1e-15:
                    continue
                alpha = 0.25 * np.arctan2(B, -A)
                c, sn = np.cos(alpha), np.sin(alpha)
                # columns of W
                ws, wt = W[:, s].copy(), W[:, t].copy()
                W[:, s] = c * ws + sn * wt
                W[:, t] = -sn * ws + c * wt
                # congruence update of every M[a] on rows+cols (s, t)
                Ms, Mt = M[:, :, s].copy(), M[:, :, t].copy()
                M[:, :, s] = c * Ms + sn * Mt
                M[:, :, t] = -sn * Ms + c * Mt
                Ms, Mt = M[:, s, :].copy(), M[:, t, :].copy()
                M[:, s, :] = c * Ms + sn * Mt
                M[:, t, :] = -sn * Ms + c * Mt
                gain_total += gain
        history.append(float(np.sum(M.diagonal(axis1=1, axis2=2) ** 2)))
        if gain_total < tol:
            converged = True
            break
    return W, M, np.asarray(history), converged, sweeps


def localize_orbitals(problem,
                      orbitals: Optional[Sequence[int]] = None,
                      method: str = "pipek",
                      max_sweeps: int = 200,
                      tol: float = 1e-10) -> dict:
    """Localize a window of the problem's molecular orbitals.

    Args:
        problem: a MoleculeDriver problem (needs `mo_coeff_ao` and
            `ao_basis`; bare-tensor/FCIDUMP problems carry no AO
            structure and raise).
        orbitals: MO indices (into the problem's MO window) to mix.
            Default: the doubly-occupied spatial orbitals of the
            reference determinant.  Rotations never leave this window,
            so occupied-window localization preserves the SCF state
            exactly.
        method: 'pipek' (Mulliken-charge localization; keeps
            sigma/pi separation) or 'boys' (dipole-centroid
            localization).
        max_sweeps / tol: Jacobi sweep limit and per-sweep metric-gain
            convergence threshold.

    Returns a dict:
        coefficients: (nbf, k) AO-basis localized orbitals
            C_loc = C[:, orbitals] @ rotation.
        rotation: (k, k) orthogonal W.
        metric_history: localization metric after each sweep
            (index 0 = canonical orbitals); nondecreasing.
        converged, sweeps.
        populations: (k, natom) per-orbital Mulliken atomic
            populations of each localized orbital (rows sum to 1).
        centroids: (k, 3) dipole centroids <i|r|i> in bohr.
    """
    C_all = getattr(problem, "mo_coeff_ao", None)
    ao = getattr(problem, "ao_basis", None)
    if C_all is None or ao is None:
        raise ValueError(
            "problem carries no AO-basis structure (mo_coeff_ao / "
            "ao_basis); build it with chem.MoleculeDriver")
    C_all = np.asarray(C_all, dtype=np.float64)
    if orbitals is None:
        n_docc = min(problem.num_particles)
        orbitals = np.arange(n_docc)
    orbitals = np.asarray(orbitals, dtype=int)
    if orbitals.size and (orbitals.min() < 0
                          or orbitals.max() >= C_all.shape[1]):
        raise ValueError(
            f"orbital indices {orbitals} outside the problem's MO "
            f"window of {C_all.shape[1]} orbitals")
    C = np.ascontiguousarray(C_all[:, orbitals])
    k = C.shape[1]
    S = np.asarray(ao.overlap, dtype=np.float64)
    atoms = np.asarray(ao.ao_atoms)
    natom = len(ao.symbols)

    # Mulliken charge matrices Q^A_ij = 1/2 sum_{mu in A}
    #   [C_{mu i} (SC)_{mu j} + (SC)_{mu i} C_{mu j}]  — (natom, k, k)
    SC = S @ C
    Q = np.zeros((natom, k, k))
    for a in range(natom):
        m = atoms == a
        Ca, SCa = C[m], SC[m]
        Q[a] = 0.5 * (Ca.T @ SCa + SCa.T @ Ca)

    m = method.lower()
    if m in ("pipek", "pipek-mezey", "pm"):
        M0 = Q
    elif m in ("boys", "foster-boys"):
        from .integrals import IntegralEngine
        if ao.shells is None:
            raise ValueError(
                "Boys localization needs AO shell data (ao_basis.shells "
                "is None)")
        engine = IntegralEngine(ao.shells, ao.atomic_numbers, ao.coords)
        D_ao = engine.dipole()                       # (3, nbf, nbf)
        M0 = np.einsum("ui,duv,vj->dij", C, D_ao, C, optimize=True)
    else:
        raise ValueError("method must be 'pipek' or 'boys'")

    W, _, history, converged, sweeps = _jacobi_maximize(
        M0, max_sweeps, tol)
    C_loc = C @ W
    # diagnostics in the LOCALIZED basis (both methods report both)
    SCl = S @ C_loc
    pops = np.zeros((k, natom))
    for a in range(natom):
        mask = atoms == a
        pops[:, a] = np.einsum("ui,ui->i", C_loc[mask], SCl[mask])
    if m.startswith("b") and k:
        cents = np.einsum("dii->id", np.einsum(
            "ui,duv,vj->dij", C_loc, D_ao, C_loc, optimize=True))
    else:
        from .integrals import IntegralEngine
        if ao.shells is not None:
            engine = IntegralEngine(ao.shells, ao.atomic_numbers,
                                    ao.coords)
            D_ao = engine.dipole()
            cents = np.einsum("ui,duv,vi->id", C_loc, D_ao, C_loc,
                              optimize=True)
        else:
            cents = np.full((k, 3), np.nan)
    return {
        "coefficients": C_loc,
        "rotation": W,
        "metric_history": history,
        "converged": converged,
        "sweeps": sweeps,
        "populations": pops,
        "centroids": cents,
    }
