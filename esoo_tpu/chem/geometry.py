"""Nuclear gradients + geometry optimization over any variational solver.

The reference has no geometry capability at all (it consumes one fixed
PySCF problem, /root/reference/base_opt_orb_solver.py:87-91); the native
chem frontend makes geometries first-class, so this module closes the
loop: finite-difference nuclear gradients dE/dR (central stencils over
fully re-converged total energies — exact for variational solvers up to
O(step²)) and a BFGS geometry optimizer driving them.

The `energy_fn` contract is one callable `atom_string -> total energy`
(electronic + core + nuclear repulsion, Hartree); `casscf_energy_fn`
builds the batteries-included exact-CASSCF instance.  Every energy is an
independent full solve, so the gradients inherit the solver's
variational stationarity (no Pulay/response terms are ever needed).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .basis import ANGSTROM_TO_BOHR, parse_geometry


def geometry_string(symbols, coords_bohr: np.ndarray) -> str:
    """Re-assemble a geometry string (Angstrom, the package convention)
    from symbols + bohr coordinates."""
    coords = np.asarray(coords_bohr, dtype=np.float64) / ANGSTROM_TO_BOHR
    return "; ".join(
        f"{s} {x:.12f} {y:.12f} {z:.12f}"
        for s, (x, y, z) in zip(symbols, coords))


def nuclear_gradient(atom: str, energy_fn: Callable[[str], float],
                     step: float = 1e-3) -> np.ndarray:
    """Central finite-difference nuclear gradient dE/dR, (natom, 3) in
    Hartree/bohr.  `step` is the displacement in bohr; 6·natom energy
    evaluations.  Translational invariance (Σ_A ∇_A E = 0) holds to the
    solver's convergence floor and is enforced by tests."""
    symbols, coords = parse_geometry(atom)
    g = np.zeros_like(coords)
    for a in range(len(symbols)):
        for d in range(3):
            es = []
            for sgn in (+1.0, -1.0):
                c = coords.copy()
                c[a, d] += sgn * step
                es.append(float(energy_fn(geometry_string(symbols, c))))
            g[a, d] = (es[0] - es[1]) / (2.0 * step)
    return g


def optimize_geometry(atom: str, energy_fn: Callable[[str], float],
                      gtol: float = 3e-4, maxiter: int = 50,
                      step: float = 1e-3, callback=None):
    """Minimize the total energy over nuclear coordinates (BFGS with
    central-FD gradients).  Returns a dict with the optimized geometry
    string ('atom'), coordinates in bohr ('coords'), final 'energy',
    final 'gradient' (Hartree/bohr), 'converged', and 'n_evaluations'.

    gtol: max-abs gradient component threshold (Hartree/bohr; 3e-4 is
    a standard tight-ish criterion).  callback(atom_string, energy,
    gradient) fires once per accepted BFGS iterate."""
    from scipy import optimize as _sopt

    symbols, coords0 = parse_geometry(atom)
    shape = coords0.shape
    nev = [0]

    def fun(x):
        nev[0] += 1
        return float(energy_fn(geometry_string(symbols,
                                               x.reshape(shape))))

    def jac(x):
        nev[0] += 2 * x.size
        return nuclear_gradient(geometry_string(symbols,
                                                x.reshape(shape)),
                                energy_fn, step=step).ravel()

    cb = None
    if callback is not None:
        def cb(x):
            s = geometry_string(symbols, x.reshape(shape))
            callback(s, fun(x), jac(x).reshape(shape))

    res = _sopt.minimize(fun, coords0.ravel(), jac=jac, method="BFGS",
                         callback=cb,
                         options={"gtol": gtol, "maxiter": maxiter,
                                  "norm": np.inf})
    coords = res.x.reshape(shape)
    return {
        "atom": geometry_string(symbols, coords),
        "coords": coords,
        "energy": float(res.fun),
        "gradient": np.asarray(res.jac).reshape(shape),
        "converged": bool(res.success),
        "n_iterations": int(res.nit),
        "n_evaluations": nev[0],
    }


# most-abundant-isotope masses (amu), H-Ar — the standard choice for
# harmonic analysis (vibrations are isotope-specific)
ISOTOPE_MASSES = {
    "H": 1.00782503207, "He": 4.002603254, "Li": 7.01600455,
    "Be": 9.0121822, "B": 11.0093054, "C": 12.0, "N": 14.0030740048,
    "O": 15.99491461956, "F": 18.99840322, "Ne": 19.9924401754,
    "Na": 22.9897692809, "Mg": 23.98504170, "Al": 26.98153863,
    "Si": 27.9769265325, "P": 30.97376163, "S": 31.97207100,
    "Cl": 34.96885268, "Ar": 39.9623831225,
}
_AMU_TO_ME = 1822.888486209          # electron masses per amu
_HARTREE_TO_CM1 = 219474.6313705     # wavenumbers per Hartree


def hessian(atom: str, energy_fn: Callable[[str], float],
            step: float = 5e-3) -> np.ndarray:
    """Nuclear Hessian d²E/dR_i dR_j (Hartree/bohr²), (3N, 3N), by
    central energy stencils (symmetric by construction): 3-point on the
    diagonal, 4-point off it — 1 + 6N + 2·3N(3N−1) energy evaluations,
    every one a fully re-converged total."""
    symbols, coords = parse_geometry(atom)
    n = coords.size

    def E(dx):
        c = coords + dx.reshape(coords.shape)
        return float(energy_fn(geometry_string(symbols, c)))

    e0 = E(np.zeros(n))
    H = np.zeros((n, n))
    for i in range(n):
        dx = np.zeros(n)
        dx[i] = step
        H[i, i] = (E(dx) - 2.0 * e0 + E(-dx)) / step ** 2
    for i in range(n):
        for j in range(i + 1, n):
            dij = np.zeros(n)
            dij[i] = step
            dij[j] = step
            dij_m = np.zeros(n)
            dij_m[i] = step
            dij_m[j] = -step
            H[i, j] = H[j, i] = (E(dij) - E(dij_m) - E(-dij_m)
                                 + E(-dij)) / (4.0 * step ** 2)
    return H


def harmonic_frequencies(atom: str, energy_fn: Callable[[str], float],
                         step: float = 5e-3, project: bool = True):
    """Harmonic vibrational analysis at `atom` (which should be an
    optimized geometry): mass-weighted FD Hessian, translation/rotation
    projection, frequencies in cm⁻¹.

    Returns a dict with 'frequencies_cm1' (3N,) ascending — imaginary
    modes reported as NEGATIVE wavenumbers, projected-out trans/rot
    modes as (near-)zeros — plus 'modes' (3N, N, 3) mass-weighted
    normal-mode displacements, 'hessian', and 'n_vibrations'
    (3N−5 linear / 3N−6 nonlinear).  Cross-validated against an
    independent reduced-mass diatomic computation in
    tests/test_geometry.py."""
    symbols, coords = parse_geometry(atom)
    natom = len(symbols)
    H = hessian(atom, energy_fn, step=step)
    masses = np.array([ISOTOPE_MASSES[s] for s in symbols]) * _AMU_TO_ME
    m3 = np.repeat(masses, 3)
    Hw = H / np.sqrt(np.outer(m3, m3))

    # trans/rot null-space basis in mass-weighted coordinates
    com = (masses @ coords) / masses.sum()
    rel = coords - com
    basis = []
    for d in range(3):
        t = np.zeros((natom, 3))
        t[:, d] = np.sqrt(masses)
        basis.append(t.ravel())
    for d in range(3):
        e = np.zeros(3)
        e[d] = 1.0
        r = np.cross(rel, e) * np.sqrt(masses)[:, None]
        basis.append(r.ravel())
    B = []
    for v in basis:
        for u in B:
            v = v - (u @ v) * u
        nv = np.linalg.norm(v)
        if nv > 1e-8:
            B.append(v / nv)
    n_tr = len(B)                      # 5 linear / 6 nonlinear
    if project and n_tr:
        P = np.eye(3 * natom) - np.array(B).T @ np.array(B)
        Hw = P @ Hw @ P
    w, V = np.linalg.eigh(Hw)
    freqs = np.sign(w) * np.sqrt(np.abs(w)) * _HARTREE_TO_CM1
    return {
        "frequencies_cm1": freqs,
        "modes": V.T.reshape(-1, natom, 3),
        "hessian": H,
        "n_vibrations": 3 * natom - n_tr,
    }


def casscf_energy_fn(basis: str = "sto-3g",
                     num_spin_orbitals: Optional[int] = None,
                     charge: int = 0, spin: int = 0,
                     n_frozen: Optional[int] = 0,
                     custom_basis=None, **solver_kwargs):
    """`atom_string -> total energy` using exact active-space CASSCF
    (FusedOptOrbCASSCF — the package's variational upper baseline).
    num_spin_orbitals=None uses the FULL orbital space (FCI quality);
    n_frozen (default 0 = correlate everything) feeds active_space when
    a window is requested.  Total = electronic + core + nuclear
    repulsion."""
    from ..orbital_optimization import FusedOptOrbCASSCF
    from .driver import MoleculeDriver

    defaults = dict(maxiter=30, stopping_tolerance=1e-10,
                    inner_stopping_tolerance=1e-10)
    defaults.update(solver_kwargs)

    def energy(atom: str) -> float:
        problem = MoleculeDriver(atom, basis=basis, charge=charge,
                                 spin=spin,
                                 custom_basis=custom_basis).run()
        if n_frozen:
            problem = problem.active_space(n_frozen=n_frozen)
        nso = (2 * problem.num_spatial_orbitals
               if num_spin_orbitals is None else num_spin_orbitals)
        r = FusedOptOrbCASSCF(num_spin_orbitals=nso, problem=problem,
                              **defaults).compute_minimum_energy()
        return (r.eigenvalue + problem.core_energy
                + problem.nuclear_repulsion_energy)

    return energy
