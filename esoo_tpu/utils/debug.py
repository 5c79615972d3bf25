"""Numerical-guard / debug utilities.

The reference's closest analogues are its correctness guards: imaginary-RDM
residue detection via module-global flags (base_opt_orb_solver.py:380-401,
:470-493) and SSVQE's initial-state orthogonality validation
(ssvqe.py:484-494).  Here the guards are explicit helpers plus an opt-in
jax NaN-debugging mode.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import numpy as np


@contextlib.contextmanager
def nan_checks() -> Iterator[None]:
    """Enable jax_debug_nans inside the block (raises at the op producing
    the first NaN, with the offending jitted function identified)."""
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_imaginary_residue(tensor, atol: float = 1e-8,
                            what: str = "RDM", strip: bool = True) -> np.ndarray:
    """Imaginary-residue detection (reference semantics: flags flipped when
    any RDM element has imaginary residue, base_opt_orb_solver.py:380-401).

    strip=True (the `wavefuntion_real` path) warns when residue exceeds
    atol and returns the real part; strip=False returns the tensor intact
    (complex-RDM objective path) without warning — the user never claimed
    the wavefunction was real."""
    import warnings
    t = np.asarray(tensor)
    if np.iscomplexobj(t):
        if not strip:
            return t
        resid = float(np.abs(t.imag).max(initial=0.0))
        if resid > atol:
            warnings.warn(
                f"{what} has imaginary residue {resid:.2e} > {atol:.0e}; "
                f"wavefunction may not be real", stacklevel=2)
        return np.ascontiguousarray(t.real)
    return t


def check_partial_unitary(U, atol: float = 1e-8) -> None:
    """Assert U^T U = I (columns orthonormal)."""
    U = np.asarray(U)
    gram = U.T @ U
    err = float(np.abs(gram - np.eye(U.shape[1])).max())
    if err > atol:
        raise ValueError(
            f"partial unitary violates U^T U = I by {err:.2e}")


def check_rdm_sanity(gamma, Gamma, num_particles: int,
                     atol: float = 1e-6) -> None:
    """Physicality checks: trace(gamma) = N_e, gamma Hermitian, Gamma
    antisymmetry Gamma[p,q,r,s] = -Gamma[q,p,r,s]."""
    gamma = np.asarray(gamma)
    Gamma = np.asarray(Gamma)
    tr = float(np.real(np.trace(gamma)))
    if abs(tr - num_particles) > atol:
        raise ValueError(f"trace(1-RDM) = {tr}, expected {num_particles}")
    if np.abs(gamma - gamma.conj().T).max() > atol:
        raise ValueError("1-RDM is not Hermitian")
    if np.abs(Gamma + Gamma.transpose(1, 0, 2, 3)).max() > atol:
        raise ValueError("2-RDM violates index antisymmetry")
