"""Fully-fused OptOrbVQE: the ENTIRE outer loop as one XLA executable.

The reference architecture makes O(10^4-10^5) host<->backend crossings per
run (each estimator.run / autograd step / optimizer iterate is a separate
dispatch; SURVEY.md section 3 'process/device boundaries').  The class-based
solvers here already collapse most of that, but the eigensolver subproblem
still drives a host SciPy loop — ~100 device round trips per outer
iteration, which dominates wall-clock when the device is reached over a
network (TPU pods).

This module is the production fast path: the complete OptOrbVQE loop —

    lax.while_loop over outer iterations:
        BFGS minimization of theta -> <psi(theta)|H(U)|psi(theta)>
            (jax.scipy.optimize.minimize, on device)
        direct RDM extraction (GEMMs, on device)
        BB/Stiefel projected-gradient descent over U
            (nested lax.while_loop, on device)
        rotated integrals for the next Hamiltonian (staged GEMMs)

— compiles to ONE device program: a whole run is a single dispatch.

Semantics match OptOrbVQE with rdm_measurement='direct' and a
gradient-based optimizer; `outer_loop_callback=` fires live per outer
iteration from inside the compiled loop (jax.debug.callback — async host
effect, for monitoring/checkpointing, not control flow), and the full
energy trace is returned in the result.  Hamiltonian "rebuild" needs no Pauli materialization
at all on this path: the VQE cost consumes the rotated integral tensors
directly through the RDM-contraction identity (sim/rdm.py), so the qubit
operator is only constructed if the caller asks for it afterwards.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from ..solvers.lbfgs import lbfgs_advance, lbfgs_init, lbfgs_minimize

from ..sim.circuit import QuantumCircuit
from ..sim.rdm import one_rdm, rdm_energy, two_rdm
from ..sim.statevector import compile_circuit
from .kernels import (expand_spin_tensors, rotate_one_body, rotate_two_body,
                      rotated_energy_spatial, spin_reduce_rdms,
                      spin_squared_from_rdms)
from .stiefel import orth

# single source of truth for the orbital objective across all fused loops
_ORBITAL_VAG = jax.value_and_grad(rotated_energy_spatial)


_HOST_CB_OK = None


def _host_callbacks_supported() -> bool:
    """Whether the default backend can run jax.debug.callback (the axon
    remote-TPU PJRT plugin raises UNIMPLEMENTED for host send/recv
    callbacks).  Probed once with a tiny jitted program."""
    global _HOST_CB_OK
    if _HOST_CB_OK is None:
        try:
            def probe(x):
                jax.debug.callback(lambda v: None, x)
                return x + 1.0
            np.asarray(jax.jit(probe)(jnp.zeros(())))
            _HOST_CB_OK = True
        except Exception:
            _HOST_CB_OK = False
    return _HOST_CB_OK


def _make_program_callback(user_callback, checkpoint_dir):
    """Host callback the compiled programs fire per outer iteration with
    (iteration, energy_or_energies, theta, U): writes a resumable .npz
    when `checkpoint_dir` is set, then chains to the user's
    outer_loop_callback(iteration, energy/ies)."""
    if user_callback is None and checkpoint_dir is None:
        return None
    import os
    from .checkpoint import save_checkpoint

    def cb(it, e, theta, U, trace):
        it = int(it)
        if checkpoint_dir is not None:
            # trace holds the running outer-energy history (checkpoint.py
            # contract: the FULL energy_convergence_list so far)
            hist = np.asarray(trace).reshape(-1)[:it]
            save_checkpoint(
                os.path.join(checkpoint_dir, f"fused_iter_{it:04d}.npz"),
                iteration=it, partial_unitary=np.asarray(U),
                energy_convergence_list=hist,
                optimal_point=np.asarray(theta))
        if user_callback is not None:
            user_callback(it, np.asarray(e) if np.ndim(e) else float(e))
    return cb


def _resolve_callback(user_callback, checkpoint_dir):
    """(live_callback, post_run_callback): live when the backend supports
    host callbacks, else deferred — the caller invokes post_run_callback
    once with the FINAL (iteration, energy/ies, theta, U, trace) so
    checkpointing still yields a resumable file on callback-less backends
    (axon)."""
    cb = _make_program_callback(user_callback, checkpoint_dir)
    if cb is None:
        return None, None
    if _host_callbacks_supported():
        return cb, None
    import warnings
    warnings.warn(
        "the active JAX backend does not support host callbacks "
        "(jax.debug.callback); outer_loop_callback/checkpoints fall back "
        "to one post-run invocation with the final state")
    return None, cb


def _resolve_simulation(simulation: str, num_spin_orbitals: int) -> str:
    """'auto' -> 'sector' wherever the circuit permits (the ctor falls
    back to 'full' for non-UCC circuits).  With the string-factorized
    sector kernels (sim/strings.py) the sector wins on EVERY measured
    backend and size — the former small-N-on-TPU advantage of the dense
    full-space path was a property of the gather-table sector kernels
    only (docs/PERF.md: H4 m=56 -> N=8 fused warm on the v5e, 2026-08-18:
    full 19.7 s vs string-sector 0.95 s; N>=16 full-space is additionally
    the shape that kills the shared worker)."""
    if simulation != "auto":
        return simulation
    return "sector"


def _cached_callbacks(solver):
    """Memoize _resolve_callback on the solver instance: `callback` is a
    jit STATIC argname, so a fresh closure per run would retrace the whole
    one-dispatch program (minutes per compile on the axon tunnel)."""
    key = (solver.outer_loop_callback, solver.checkpoint_dir)
    hit = getattr(solver, "_cb_cache", None)
    if hit is None or hit[0] != key:
        solver._cb_cache = (key, _resolve_callback(*key))
    return solver._cb_cache[1]


def _place_on_mesh(mesh, h_sp, g_sp, axis_name: str = "orb"):
    """Shard the m^4 tensor over `mesh` (last axis), replicate h.

    The fused programs need no shard_map for this: GSPMD propagates the
    input sharding through the staged contractions and inserts the
    collectives (verified bit-identical to single-device in tests).  The
    last axis is chosen so transform stages 1-3 stay communication-free.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    d = mesh.shape[axis_name]
    m = int(g_sp.shape[-1])
    if m % d:
        raise ValueError(
            f"spatial dimension {m} not divisible by mesh size {d}; pad the "
            f"basis or choose a divisor mesh")
    g_sp = jax.device_put(g_sp, NamedSharding(mesh, P(None, None, None,
                                                      axis_name)))
    h_sp = jax.device_put(h_sp, NamedSharding(mesh, P()))
    return h_sp, g_sp


@dataclasses.dataclass
class FusedOptOrbResult:
    eigenvalue: float
    optimal_point: np.ndarray
    optimal_partial_unitary: np.ndarray
    energy_convergence_list: list
    outer_iterations: int
    optimal_circuit: Optional[QuantumCircuit] = None
    # natural-orbital occupation numbers of the optimal state (descending
    # eigenvalues of the spin-summed spatial 1-RDM; populated by the
    # exact-diagonalization solvers, casscf.py)
    natural_occupations: Optional[np.ndarray] = None
    # total-spin expectation <S^2> of the optimal state (0 singlet,
    # 0.75 doublet, 2 triplet, ...; populated by casscf.py via
    # spin_squared_from_rdms)
    spin_squared: Optional[float] = None
    # spin-summed spatial 1-RDM of the optimal state over the ACTIVE
    # (rotated) orbitals, (n, n) — the input to one-body property
    # evaluation (chem.properties.dipole_moment with
    # partial_unitary=optimal_partial_unitary); populated by casscf.py
    one_rdm_spatial: Optional[np.ndarray] = None
    # spatial SPIN density gamma_aa - gamma_bb, (n, n) — zero for
    # singlets; feed chem.properties.populations(include_core=False)
    # for atomic spin populations; populated by casscf.py
    spin_density_spatial: Optional[np.ndarray] = None

    @property
    def optimal_parameters(self):
        return self.optimal_point


def _inner_bb(vag_fn, U0, data, stepsize, tol, decay, maxiter):
    """BB projected-gradient while_loop (same math as stiefel.py, inlined
    so the whole thing nests inside the fused outer loop)."""
    U0 = orth(U0)
    E0, G0 = vag_fn(U0, *data)
    U1 = orth(U0 - stepsize * G0)
    S0 = 1.5 * tol

    def cond(c):
        k, U, U_prev, G_prev, E_prev, S = c
        return jnp.logical_and(S > tol, k <= maxiter)

    def body(c):
        k, U, U_prev, G_prev, E_prev, S = c
        E, G = vag_fn(U, *data)
        S_new = (1.0 - decay) * jnp.abs(E - E_prev) + decay * S
        dU = U - U_prev
        dG = G - G_prev
        uu = jnp.sum(dU * dU)
        ug = jnp.abs(jnp.sum(dU * dG))
        gg = jnp.sum(dG * dG)
        eps = jnp.asarray(1e-30, U.dtype)
        tau = jnp.where((k % 2) == 1, uu / (ug + eps), ug / (gg + eps))
        return (k + 1, orth(U - tau * G), U, G, E, S_new)

    c = (jnp.asarray(1), U1, U0, G0, E0, S0)
    c = jax.lax.while_loop(cond, body, c)
    return c[1]


def _vqe_stage_fns(state_fn, n_active, sector, vqe_maxiter, dtype,
                   tables=None, ftol=None):
    """(run_vqe, extract_rdms) for the eigensolver stage, shared by the
    one-dispatch program and the two-dispatch eigensolver program.

    `tables` (a device_tables()/shard_sector_tables() pytree of traced
    or device arrays) makes the sector's index/operator tables program
    ARGUMENTS instead of baked constants — required for mesh-sharded
    table placements (parallel.shard_sector_tables), where the MA/MB
    operator stacks carry a NamedSharding the compiler partitions the
    sigma GEMMs around."""
    gtol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-5
    N = 2 * n_active

    if sector is None:
        def vqe_energy(theta, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            return rdm_energy(state_fn(theta), h_so, g_so)

        def run_vqe(theta, h_act, g_act):
            # own jittable L-BFGS: jax.scipy's BFGS crashes the v5e TPU
            # worker at ~360 params with long-scan costs and densifies a
            # P x P inverse Hessian (docs/PERF.md, round-2 measurement)
            res = lbfgs_minimize(vqe_energy, theta, args=(h_act, g_act),
                                 maxiter=vqe_maxiter, gtol=gtol, ftol=ftol)
            return res.x, res.fun

        def extract_rdms(theta):
            state = state_fn(theta)
            return one_rdm(state, N), two_rdm(state, N)
    else:
        def run_vqe(theta, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            vals = sector.build_values(h_so, g_so, tables=tables)
            if tables is None:
                res = lbfgs_minimize(sector.energy_values, theta,
                                     args=(vals,),
                                     maxiter=vqe_maxiter, gtol=gtol,
                                     ftol=ftol)
            else:
                res = lbfgs_minimize(_sector_cost_tabled(sector), theta,
                                     args=(vals, tables),
                                     maxiter=vqe_maxiter, gtol=gtol,
                                     ftol=ftol)
            return res.x, res.fun

        def extract_rdms(theta):
            # sector-native RDMs: never touches the 2^N space
            return sector.rdms(sector.state(theta, tables=tables),
                               tables=tables)

    return run_vqe, extract_rdms


@partial(jax.jit, static_argnames=(
    "state_fn", "n_active", "vqe_maxiter", "vqe_ftol", "sector"))
def _eig_rdm_program(state_fn: Callable,
                     n_active: int,
                     theta: jnp.ndarray,
                     U: jnp.ndarray,
                     h_sp: jnp.ndarray,
                     g_sp: jnp.ndarray,
                     vqe_maxiter: int = 200,
                     sector=None,
                     sector_tables=None,
                     vqe_ftol: float = None):
    """Two-dispatch mode, program A: rotate integrals at U, solve the
    eigensolver subproblem, extract spin-reduced RDMs.

    The composite one-dispatch H8 m=112 -> N=16 program reproducibly
    kills the shared axon TPU worker while every component passes
    standalone (scripts/bisect_n16_fault.py, round-2 finding); splitting
    the outer iteration into this program plus _orb_program keeps each
    compiled program at a size the worker handles."""
    run_vqe, extract_rdms = _vqe_stage_fns(state_fn, n_active, sector,
                                           vqe_maxiter, h_sp.dtype,
                                           tables=sector_tables,
                                           ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    theta, E = run_vqe(theta, h_act, g_act)
    gamma, Gamma = extract_rdms(theta)
    gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
    return theta, E, gamma_s, Gamma_s


@partial(jax.jit, static_argnames=("state_fn", "vqe_maxiter", "vqe_ftol",
                                   "sector"))
def _eig_only_program(state_fn: Callable,
                      theta: jnp.ndarray,
                      U: jnp.ndarray,
                      h_sp: jnp.ndarray,
                      g_sp: jnp.ndarray,
                      vqe_maxiter: int = 200,
                      sector=None,
                      sector_tables=None,
                      vqe_ftol: float = None):
    """Two-dispatch final re-solve: rotate + eigensolver, no RDM work
    (one-dispatch parity tail — _fused_optorb_vqe re-runs run_vqe at the
    final U unconditionally; its RDMs are never consumed there)."""
    run_vqe, _ = _vqe_stage_fns(state_fn, U.shape[1], sector,
                                vqe_maxiter, h_sp.dtype,
                                tables=sector_tables,
                                ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    return run_vqe(theta, h_act, g_act)


def _vqe_cost_for(state_fn, sector, dtype):
    """(cost_fn, prep_args) for the chunked eigensolver programs.
    prep_args(h_act, g_act) -> the cost's device-array argument tuple."""
    if sector is None:
        def cost(theta, h_so, g_so):
            return rdm_energy(state_fn(theta), h_so, g_so)

        def prep_args(h_act, g_act):
            return expand_spin_tensors(h_act, g_act)
    else:
        cost = sector.energy_values

        def prep_args(h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            return (sector.build_values(h_so, g_so),)
    return cost, prep_args


# past this sector dimension the chunked programs pass the sector's
# index/sign tables as program ARGUMENTS (device buffers) instead of
# baked constants: at H8 N=20 (nd=44,100) the constants total ~1 GB and
# break the remote-compile transport (measured round 3); at N=16
# (nd=4,900, ~30 MB) the proven constants path is kept
_TABLED_MIN_ND = 10000


def _sector_cost_tabled(sector):
    def cost(theta, vals, tables):
        return sector.energy_values(theta, vals, tables=tables)
    return cost


@partial(jax.jit, static_argnames=("state_fn", "sector"))
def _eig_chunk_init(state_fn: Callable, theta: jnp.ndarray, U: jnp.ndarray,
                    h_sp: jnp.ndarray, g_sp: jnp.ndarray, sector=None,
                    sector_tables=None):
    """Chunked two-dispatch, program A1: rotate the integrals at U and
    initialize the resumable L-BFGS state.  Returns (state, cost_args).

    With `sector_tables` (a device-put sector.device_tables() pytree) the
    large index tables are program arguments; cost_args then excludes the
    tables — the host threads the same device buffers into each
    _eig_chunk_advance dispatch (no per-dispatch re-transfer)."""
    gtol = 1e-9 if jnp.finfo(h_sp.dtype).bits >= 64 else 1e-5
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    if sector is not None and sector_tables is not None:
        h_so, g_so = expand_spin_tensors(h_act, g_act)
        vals = sector.build_values(h_so, g_so, tables=sector_tables)
        state = lbfgs_init(_sector_cost_tabled(sector), theta,
                           args=(vals, sector_tables), gtol=gtol)
        return state, (vals,)
    cost, prep_args = _vqe_cost_for(state_fn, sector, h_sp.dtype)
    cost_args = prep_args(h_act, g_act)
    return lbfgs_init(cost, theta, args=cost_args, gtol=gtol), cost_args


@partial(jax.jit, static_argnames=("state_fn", "num_steps", "vqe_maxiter",
                                   "vqe_ftol", "sector"))
def _eig_chunk_advance(state_fn: Callable, state, cost_args,
                       num_steps: int, vqe_maxiter: int, sector=None,
                       sector_tables=None, vqe_ftol: float = None):
    """Chunked two-dispatch, program A2 (jitted once, re-dispatched until
    state.done): up to `num_steps` more L-BFGS iterations.  Bounding the
    per-dispatch work keeps each compiled execution under the shared
    axon worker's tolerance for long-running programs — the residual
    N=16 crash mode after the remat fix (docs/PERF.md round 3)."""
    dtype = state.x.dtype
    gtol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-5
    if sector is not None and sector_tables is not None:
        return lbfgs_advance(_sector_cost_tabled(sector), state,
                             args=tuple(cost_args) + (sector_tables,),
                             num_steps=num_steps, maxiter=vqe_maxiter,
                             gtol=gtol, ftol=vqe_ftol)
    cost, _ = _vqe_cost_for(state_fn, sector, dtype)
    return lbfgs_advance(cost, state, args=cost_args, num_steps=num_steps,
                         maxiter=vqe_maxiter, gtol=gtol, ftol=vqe_ftol)


@partial(jax.jit, static_argnames=("state_fn", "n_active", "sector"))
def _rdm_only_program(state_fn: Callable, n_active: int,
                      theta: jnp.ndarray, sector=None, sector_tables=None):
    """Chunked two-dispatch, program A3: spin-reduced RDMs at theta."""
    N = 2 * n_active
    if sector is None:
        state = state_fn(theta)
        gamma, Gamma = one_rdm(state, N), two_rdm(state, N)
    else:
        gamma, Gamma = sector.rdms(
            sector.state(theta, tables=sector_tables),
            tables=sector_tables)
    return spin_reduce_rdms(gamma, Gamma)


def _rdm_diagnostics(gamma, Gamma):
    """(natural occupations desc, <S^2>, spatial 1-RDM, spin density)
    from spin-orbital RDMs — the wavefunction diagnostics every fused
    result carries (casscf.py computes the same four for the exact
    family)."""
    gamma_s, _ = spin_reduce_rdms(gamma, Gamma)
    n = gamma.shape[0] // 2
    return (jnp.linalg.eigvalsh(gamma_s)[::-1],
            spin_squared_from_rdms(gamma, Gamma),
            gamma_s,
            gamma[:n, :n] - gamma[n:, n:])


@partial(jax.jit, static_argnames=("state_fn", "n_active", "sector"))
def _vqe_diagnostics_program(state_fn: Callable, n_active: int,
                             theta: jnp.ndarray, sector=None,
                             sector_tables=None):
    """One post-run dispatch: spin-orbital RDMs at the optimal theta →
    wavefunction diagnostics (same content as casscf._state_diagnostics
    for the exact family)."""
    N = 2 * n_active
    if sector is None:
        state = state_fn(theta)
        gamma, Gamma = one_rdm(state, N), two_rdm(state, N)
    else:
        gamma, Gamma = sector.rdms(
            sector.state(theta, tables=sector_tables),
            tables=sector_tables)
    return _rdm_diagnostics(gamma, Gamma)


def _attach_vqe_diagnostics(result, solver, theta):
    """Populate the ground-state diagnostics fields (natural
    occupations, <S^2>, spatial 1-RDM for chem.properties, spin
    density) on a FusedOptOrbResult — works on both the full 2^N and
    sector simulations."""
    if not getattr(solver, "diagnostics", True):
        return result
    occ, s2, g1, sd = _vqe_diagnostics_program(
        solver._compiled.state_fn, solver.num_spin_orbitals // 2,
        jnp.asarray(theta),
        sector=solver._sector,
        sector_tables=getattr(solver, "_sector_tables", None))
    result.natural_occupations = np.asarray(occ)
    result.spin_squared = float(s2)
    result.one_rdm_spatial = np.asarray(g1)
    result.spin_density_spatial = np.asarray(sd)
    return result


@partial(jax.jit, static_argnames=("inner_maxiter",))
def _orb_program(U: jnp.ndarray,
                 gamma_s: jnp.ndarray,
                 Gamma_s: jnp.ndarray,
                 h_sp: jnp.ndarray,
                 g_sp: jnp.ndarray,
                 bb_stepsize: jnp.ndarray,
                 inner_tol: jnp.ndarray,
                 decay: jnp.ndarray,
                 inner_maxiter: int = 10000):
    """Two-dispatch mode, program B: BB/Stiefel descent at fixed RDMs."""
    return _inner_bb(_ORBITAL_VAG, U, (gamma_s, Gamma_s, h_sp, g_sp),
                     bb_stepsize, inner_tol, decay, inner_maxiter)


@partial(jax.jit, static_argnames=(
    "state_fn", "n_active", "outer_maxiter", "inner_maxiter",
    "vqe_maxiter", "vqe_ftol", "sector", "callback"))
def _fused_optorb_vqe(state_fn: Callable,
                      n_active: int,
                      theta0: jnp.ndarray,
                      U0: jnp.ndarray,
                      h_sp: jnp.ndarray,
                      g_sp: jnp.ndarray,
                      outer_tol: jnp.ndarray,
                      inner_tol: jnp.ndarray,
                      bb_stepsize: jnp.ndarray,
                      decay: jnp.ndarray,
                      outer_maxiter: int = 20,
                      inner_maxiter: int = 10000,
                      vqe_maxiter: int = 200,
                      sector=None,
                      callback=None,
                      sector_tables=None,
                      vqe_ftol: float = None):
    """Returns (E, theta, U, n_outer, energy_trace).

    With `sector` (a sim.sector.SectorUCC), the eigensolver runs in the
    particle-number sector: the sparse Slater-Condon values are rebuilt
    from the rotated integrals once per outer iteration and each BFGS
    energy evaluation is Givens-rotation gates + a gather quadform —
    O(nnz) instead of O(2^N) work per evaluation, no dense matrix.

    `sector_tables` (device-array pytree, non-static) threads the sector
    tables in as program arguments — used for the mesh-sharded placement
    (parallel.shard_sector_tables), where GSPMD partitions the string
    sigma/RDM GEMMs over the tables' operator-axis sharding."""

    run_vqe, extract_rdms = _vqe_stage_fns(state_fn, n_active, sector,
                                           vqe_maxiter, h_sp.dtype,
                                           tables=sector_tables,
                                           ftol=vqe_ftol)
    vag = _ORBITAL_VAG

    def outer_cond(c):
        it, theta, U, E_prev, E, trace, done = c
        return jnp.logical_not(done)

    def outer_body(c):
        it, theta, U, E_prev, E_last, trace, done = c
        h_act = rotate_one_body(h_sp, U)
        g_act = rotate_two_body(g_sp, U)
        theta, E = run_vqe(theta, h_act, g_act)
        trace = trace.at[it].set(E)
        if callback is not None:
            # live observability without leaving the compiled program
            # (reference outer_loop_callback seam; async host callback)
            jax.debug.callback(callback, it + 1, E, theta, U, trace)

        # direct RDMs of the optimal state
        gamma, Gamma = extract_rdms(theta)
        gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)

        U_new = _inner_bb(vag, U, (gamma_s, Gamma_s, h_sp, g_sp),
                          bb_stepsize, inner_tol, decay, inner_maxiter)

        converged = jnp.abs(E - E_prev) < outer_tol
        hit_max = it + 1 >= outer_maxiter
        done_new = jnp.logical_or(converged, hit_max)
        # on convergence keep the pre-rotation U (the one that produced E)
        U_out = jnp.where(converged, U, U_new)
        return (it + 1, theta, U_out, E, E, trace, done_new)

    trace0 = jnp.full((outer_maxiter,), jnp.nan, dtype=h_sp.dtype)
    c0 = (jnp.asarray(0), theta0, orth(U0), jnp.asarray(jnp.inf, h_sp.dtype),
          jnp.asarray(0.0, h_sp.dtype), trace0, jnp.asarray(False))
    it, theta, U, E_prev, E, trace, done = jax.lax.while_loop(
        outer_cond, outer_body, c0)
    # re-solve at the final U so (E, theta, U) are mutually consistent even
    # when the loop ended on hit_max (where U is the freshly rotated one)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    theta, E = run_vqe(theta, h_act, g_act)
    return E, theta, U, it, trace


@dataclasses.dataclass
class FusedOptOrbEigensolverResult:
    eigenvalues: np.ndarray
    optimal_point: np.ndarray
    optimal_partial_unitary: np.ndarray
    energy_convergence_list: list     # weighted sums per outer iteration
    outer_iterations: int
    # per-state CASSCF wavefunction diagnostics (exact-diagonalization
    # solvers, casscf.py): descending natural occupations (k, n_spatial)
    # and total-spin expectations <S^2> (k,) — spin labels for the
    # exact ladder (0 singlet, 0.75 doublet, 2 triplet, ...)
    natural_occupations: Optional[np.ndarray] = None
    spin_squared: Optional[np.ndarray] = None
    # per-state spin-summed spatial 1-RDMs over the active (rotated)
    # orbitals, (k, n, n) — inputs to per-state one-body properties
    # (chem.properties.dipole_moment); populated by casscf.py
    one_rdm_spatial: Optional[np.ndarray] = None
    # spin-summed spatial TRANSITION 1-RDMs t[i, j] = <psi_i|E_ps|psi_j>,
    # (k, k, n, n) (diagonal slices == one_rdm_spatial) — inputs to
    # transition dipoles / oscillator strengths
    # (chem.properties.transition_dipoles); populated by casscf.py
    transition_rdm1_spatial: Optional[np.ndarray] = None
    # per-state spatial spin densities gamma_aa - gamma_bb, (k, n, n);
    # populated by casscf.py
    spin_density_spatial: Optional[np.ndarray] = None

    @property
    def optimal_parameters(self):
        return self.optimal_point


def _ssvqe_stage_fns(apply_fn, n_active, init_mat, weights, sector,
                     sector_init, vqe_maxiter, dtype, tables=None,
                     ftol=None):
    """(run_ssvqe, state_energies, batch_rdms) for the SSVQE eigensolver
    stage, shared by the one-dispatch program and the two-dispatch
    variant.  `tables` threads the sector tables in as program arguments
    (mesh-sharded placement, parallel.shard_sector_tables)."""
    N = 2 * n_active
    gtol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-5

    if sector is None:
        def state_energies(theta, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            states = jax.vmap(apply_fn, in_axes=(0, None))(init_mat, theta)
            return jax.vmap(lambda s: rdm_energy(s, h_so, g_so))(states)

        def weighted_cost(theta, h_act, g_act):
            return jnp.dot(weights, state_energies(theta, h_act, g_act))

        def run_ssvqe(theta, h_act, g_act):
            res = lbfgs_minimize(weighted_cost, theta, args=(h_act, g_act),
                                 maxiter=vqe_maxiter, gtol=gtol, ftol=ftol)
            return res.x, res.fun

        def batch_rdms(theta):
            states = jax.vmap(apply_fn, in_axes=(0, None))(init_mat, theta)
            return (jax.vmap(lambda s: one_rdm(s, N))(states),
                    jax.vmap(lambda s: two_rdm(s, N))(states))
    else:
        def _apply_k(theta):
            return jax.vmap(
                lambda v0: sector.apply(v0, theta, tables=tables)
            )(sector_init)

        def state_energies(theta, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            vals = sector.build_values(h_so, g_so, tables=tables)
            vs = _apply_k(theta)
            return jax.vmap(lambda v: sector.quadform_values(
                v, vals, tables=tables))(vs)

        def run_ssvqe(theta, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            vals = sector.build_values(h_so, g_so, tables=tables)

            def cost(th):
                vs = _apply_k(th)
                es = jax.vmap(lambda v: sector.quadform_values(
                    v, vals, tables=tables))(vs)
                return jnp.dot(weights, es)

            res = lbfgs_minimize(cost, theta, maxiter=vqe_maxiter,
                                 gtol=gtol, ftol=ftol)
            return res.x, res.fun

        def batch_rdms(theta):
            # sector-native RDMs: never touches the 2^N space
            vs = _apply_k(theta)
            return jax.vmap(lambda v: sector.rdms(v, tables=tables))(vs)

    return run_ssvqe, state_energies, batch_rdms


@partial(jax.jit, static_argnames=(
    "apply_fn", "n_active", "vqe_maxiter", "vqe_ftol", "sector"))
def _ssvqe_eig_rdm_program(apply_fn: Callable,
                           n_active: int,
                           init_mat: jnp.ndarray,
                           weights: jnp.ndarray,
                           theta: jnp.ndarray,
                           U: jnp.ndarray,
                           h_sp: jnp.ndarray,
                           g_sp: jnp.ndarray,
                           vqe_maxiter: int = 300,
                           sector=None,
                           sector_init: jnp.ndarray = None,
                           sector_tables=None,
                           vqe_ftol: float = None):
    """Two-dispatch mode, SSVQE program A: rotate, optimize the weighted
    sum, per-state energies, weight-combined spin-reduced RDMs."""
    run_ssvqe, state_energies, batch_rdms = _ssvqe_stage_fns(
        apply_fn, n_active, init_mat, weights, sector, sector_init,
        vqe_maxiter, h_sp.dtype, tables=sector_tables, ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    theta, Ew = run_ssvqe(theta, h_act, g_act)
    energies = state_energies(theta, h_act, g_act)
    gammas, Gammas = batch_rdms(theta)
    gamma_s, Gamma_s = spin_reduce_rdms(
        jnp.tensordot(weights, gammas, axes=1),
        jnp.tensordot(weights, Gammas, axes=1))
    return theta, Ew, energies, gamma_s, Gamma_s


@partial(jax.jit, static_argnames=(
    "apply_fn", "n_active", "vqe_maxiter", "vqe_ftol", "sector"))
def _ssvqe_energies_program(apply_fn: Callable,
                            n_active: int,
                            init_mat: jnp.ndarray,
                            weights: jnp.ndarray,
                            theta: jnp.ndarray,
                            U: jnp.ndarray,
                            h_sp: jnp.ndarray,
                            g_sp: jnp.ndarray,
                            vqe_maxiter: int = 300,
                            sector=None,
                            sector_init: jnp.ndarray = None,
                            sector_tables=None,
                            vqe_ftol: float = None):
    """Per-state energies at (theta, U) only — the hit-max tail of the
    two-dispatch SSVQE loop (one-dispatch parity: energies of the last
    theta under the freshly rotated Hamiltonian)."""
    _, state_energies, _ = _ssvqe_stage_fns(
        apply_fn, n_active, init_mat, weights, sector, sector_init,
        vqe_maxiter, h_sp.dtype, tables=sector_tables, ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    return state_energies(theta, h_act, g_act)


@partial(jax.jit, static_argnames=(
    "apply_fn", "n_active", "outer_maxiter", "inner_maxiter", "vqe_maxiter",
    "vqe_ftol", "sector", "callback"))
def _fused_optorb_ssvqe(apply_fn: Callable,
                        n_active: int,
                        init_mat: jnp.ndarray,          # (k, 2^N)
                        weights: jnp.ndarray,           # (k,)
                        theta0: jnp.ndarray,
                        U0: jnp.ndarray,
                        h_sp: jnp.ndarray,
                        g_sp: jnp.ndarray,
                        outer_tol: jnp.ndarray,
                        inner_tol: jnp.ndarray,
                        bb_stepsize: jnp.ndarray,
                        decay: jnp.ndarray,
                        outer_maxiter: int = 20,
                        inner_maxiter: int = 10000,
                        vqe_maxiter: int = 300,
                        sector=None,
                        sector_init: jnp.ndarray = None,   # (k, nd + 1)
                        callback=None,
                        sector_tables=None,
                        vqe_ftol: float = None):
    """Fused SSVQE outer loop: (energies, theta, U, n_outer, trace).

    With `sector` (sim.sector.SectorUCC) + `sector_init`, the k state
    simulations, the weighted cost, and the per-outer-iteration RDM
    extraction (sector.rdms) all run in the particle-number sector — the
    2^N space is never touched."""
    run_ssvqe, state_energies, batch_rdms = _ssvqe_stage_fns(
        apply_fn, n_active, init_mat, weights, sector, sector_init,
        vqe_maxiter, h_sp.dtype, tables=sector_tables, ftol=vqe_ftol)
    vag = _ORBITAL_VAG

    def outer_cond(c):
        return jnp.logical_not(c[-1])

    def outer_body(c):
        it, theta, U, E_prev, _, trace, done = c
        h_act = rotate_one_body(h_sp, U)
        g_act = rotate_two_body(g_sp, U)
        theta, Ew = run_ssvqe(theta, h_act, g_act)
        trace = trace.at[it].set(Ew)
        if callback is not None:
            # per-state energies (one extra k-state evaluation, only paid
            # when a callback/checkpoint is installed)
            jax.debug.callback(callback, it + 1,
                               state_energies(theta, h_act, g_act), theta, U,
                               trace)

        # weight-combined, spin-summed RDMs of the k states
        gammas, Gammas = batch_rdms(theta)
        gamma = jnp.tensordot(weights, gammas, axes=1)
        Gamma = jnp.tensordot(weights, Gammas, axes=1)
        gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)

        U_new = _inner_bb(vag, U, (gamma_s, Gamma_s, h_sp, g_sp),
                          bb_stepsize, inner_tol, decay, inner_maxiter)
        converged = jnp.abs(Ew - E_prev) < outer_tol
        hit_max = it + 1 >= outer_maxiter
        U_out = jnp.where(converged, U, U_new)
        return (it + 1, theta, U_out, Ew, Ew,
                trace, jnp.logical_or(converged, hit_max))

    trace0 = jnp.full((outer_maxiter,), jnp.nan, dtype=h_sp.dtype)
    c0 = (jnp.asarray(0), theta0, orth(U0),
          jnp.asarray(jnp.inf, h_sp.dtype), jnp.asarray(0.0, h_sp.dtype),
          trace0, jnp.asarray(False))
    it, theta, U, _, Ew, trace, done = jax.lax.while_loop(
        outer_cond, outer_body, c0)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    energies = state_energies(theta, h_act, g_act)
    return energies, theta, U, it, trace


class FusedOptOrbSSVQE:
    """One-dispatch excited-state OptOrb loop (SSVQE eigensolver).

    Same semantics as OptOrbSSVQE with direct RDMs and a gradient-based
    optimizer; the whole outer loop compiles to a single device program.
    """

    _requires_orthogonal_inits = True   # VQD subclass relaxes this

    def __init__(self,
                 num_spin_orbitals: int,
                 ansatz: QuantumCircuit,
                 initial_states,
                 weight_vector=None,
                 problem=None,
                 integral_tensors=None,
                 initial_partial_unitary=None,
                 initial_point=None,
                 maxiter: int = 20,
                 stopping_tolerance: float = 1e-5,
                 inner_stopping_tolerance: float = 1e-5,
                 inner_maxiter: int = 10000,
                 initial_BBstepsize: float = 1e-3,
                 decay_factor: float = 0.8,
                 vqe_maxiter: int = 300,
                 vqe_ftol: float = None,
                 dtype=None,
                 mesh=None,
                 simulation: str = "auto",
                 dispatch: str = "one",
                 outer_loop_callback=None,
                 checkpoint_dir=None,
                 resume_from=None,
                 diagnostics: bool = True,
                 _spatial_tensors=None):
        self.diagnostics = bool(diagnostics)
        from .kernels import spatial_blocks, spin_blocks_consistent
        from ..interop import adapt as _interop_adapt
        problem, _ = _interop_adapt(problem, None)

        if _spatial_tensors is not None:
            h_sp, g_sp = _spatial_tensors
        elif integral_tensors is not None:
            h_so = np.asarray(integral_tensors[0], dtype=np.float64)
            g_so = np.asarray(integral_tensors[1], dtype=np.float64)
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbSSVQE requires spin-block-structured integrals")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        elif problem is not None and hasattr(problem,
                                             "spatial_integral_tensors"):
            h_sp, g_sp = problem.spatial_integral_tensors()
        elif problem is not None:
            h_so, g_so = problem.integral_tensors()
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbSSVQE requires spin-block-structured integrals")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        else:
            raise ValueError("either `problem` or `integral_tensors` required")
        dtype = dtype or h_sp.dtype
        self._h_sp = jnp.asarray(h_sp, dtype=dtype)
        self._g_sp = jnp.asarray(g_sp, dtype=dtype)
        if mesh is not None:
            self._h_sp, self._g_sp = _place_on_mesh(mesh, self._h_sp,
                                                    self._g_sp)

        self.num_spin_orbitals = num_spin_orbitals
        self.ansatz = ansatz
        enc = getattr(ansatz, "_encoding", "jw")
        if enc != "jw":
            # the fused one-dispatch programs contract RDMs directly from
            # occupation-basis amplitudes, which only the Jordan-Wigner
            # encoding preserves — a parity/BK-mapped ansatz would yield a
            # silently wrong energy here (class solvers auto-switch to the
            # per-Pauli path instead; use those for non-JW mappers)
            raise ValueError(
                f"fused solvers require a Jordan-Wigner-encoded ansatz; "
                f"got encoding {enc!r} — use the class-based OptOrb solver "
                f"with rdm_measurement='pauli' for this mapper")
        self._compiled = compile_circuit(ansatz)
        if not self._compiled.is_real:
            raise ValueError("fused path requires a real-safe ansatz")
        self._apply_raw = self._compiled.apply_raw  # stable jit key (cached
        # on the fingerprint-cached CompiledCircuit, so repeat solver
        # instances over the same ansatz reuse one compiled program)
        for st in initial_states:
            st_enc = getattr(st, "_encoding", "jw")
            if st_enc != "jw":
                raise ValueError(
                    f"fused solvers require Jordan-Wigner-encoded initial "
                    f"states; got encoding {st_enc!r}")
        vecs = [np.asarray(compile_circuit(st).state())
                for st in initial_states]
        if any(not np.allclose(np.imag(v), 0.0) for v in vecs):
            raise ValueError("fused path requires real initial states")
        V = np.real(np.stack(vecs))
        if self._requires_orthogonal_inits:
            gram = V @ V.T
            if np.abs(gram - np.eye(len(vecs))).max() > 1e-8:
                raise ValueError(
                    "initial states must be mutually orthonormal (SSVQE's "
                    "weighted-sum variational argument requires it)")
        self._init_mat = jnp.asarray(V, dtype=dtype)
        self.k = len(initial_states)
        if simulation not in ("full", "sector", "auto"):
            raise ValueError("simulation must be 'full', 'sector' or "
                             "'auto'")
        auto = simulation == "auto"
        simulation = _resolve_simulation(simulation, num_spin_orbitals)
        self._sector = None
        self._sector_init = None
        if simulation == "sector":
            # particle-number-sector fast path; every initial state must
            # live in the ansatz's (na, nb) sector (project_full raises
            # otherwise — e.g. for differently-excited determinants)
            from ..sim.sector import SectorUCC
            # infer the sector from the first initial state's dominant
            # determinant (project_full then validates every state)
            nq = num_spin_orbitals
            nsp = nq // 2
            lead = int(np.argmax(np.abs(V[0])))
            parts = (bin(lead & ((1 << nsp) - 1)).count("1"),
                     bin(lead >> nsp).count("1"))
            try:
                self._sector = SectorUCC(ansatz, nq, num_particles=parts)
                self._sector_init = jnp.asarray(
                    np.stack([self._sector.project_full(v) for v in V]),
                    dtype=dtype)
            except ValueError:
                if not auto:
                    raise
                # auto: non-UCC/non-conserving circuits fall back to the
                # full 2^N simulator
                self._sector = None
                self._sector_init = None
                simulation = "full"
        self.simulation = simulation
        self.mesh = mesh
        # mesh-sharded string-sector tables (see FusedOptOrbVQE): the
        # sigma/RDM GEMM batch partitions over the tables' operator-axis
        # sharding; per-state-ansatz VQD forces simulation='full' above,
        # so self._sector here is always a single shared-circuit sector
        self._sector_tables = None
        if (mesh is not None and self._sector is not None
                and self._sector.kernel == "strings"):
            from ..parallel import shard_sector_tables
            self._sector_tables = shard_sector_tables(mesh, self._sector,
                                                      dtype)
        if mesh is not None and "state" in mesh.shape:
            # 2-D mesh (parallel.make_orbital_state_mesh): the k
            # statevector simulations data-parallelize over the state
            # axis; GSPMD inserts the weighted-sum / RDM-combine psums.
            # (For the sequential VQD subclass this axis gathers instead
            # of parallelizing — use it for SSVQE/MCVQE.)
            from jax.sharding import NamedSharding, PartitionSpec as P
            d = mesh.shape["state"]
            if self.k % d:
                raise ValueError(
                    f"k={self.k} states not divisible by the state mesh "
                    f"axis ({d})")
            self._init_mat = jax.device_put(
                self._init_mat, NamedSharding(mesh, P("state", None)))
        if weight_vector is None:
            weight_vector = [self.k - i for i in range(self.k)]
        self._weights = jnp.asarray(weight_vector, dtype=dtype)

        if resume_from is not None:
            from .checkpoint import load_checkpoint
            ck = load_checkpoint(resume_from)
            initial_partial_unitary = ck["partial_unitary"]
            if "optimal_point" in ck:
                initial_point = ck["optimal_point"]

        m = h_sp.shape[0]
        n = num_spin_orbitals // 2
        if initial_partial_unitary is None:
            U0 = np.zeros((m, n))
            U0[np.arange(n), np.arange(n)] = 1.0
        else:
            U0 = np.asarray(initial_partial_unitary)
        self._U0 = jnp.asarray(U0, dtype=dtype)
        if initial_point is None:
            initial_point = np.zeros(ansatz.num_parameters)
        self._theta0 = jnp.asarray(initial_point, dtype=dtype)

        if maxiter < 1:
            raise ValueError("maxiter must be >= 1 (the outer loop always "
                             "runs at least one eigensolver iteration)")
        self.maxiter = maxiter
        self.stopping_tolerance = stopping_tolerance
        self.inner_stopping_tolerance = inner_stopping_tolerance
        self.inner_maxiter = inner_maxiter
        self.initial_BBstepsize = initial_BBstepsize
        self.decay_factor = decay_factor
        self.vqe_maxiter = vqe_maxiter
        # eigensolver plateau-stop override (solvers/lbfgs.py `ftol`):
        # None = auto (32 ulp at f32, disabled at f64); 0.0 = pure
        # gtol/maxiter/no-move semantics (the advisor's round-4 ask)
        self.vqe_ftol = vqe_ftol
        if dispatch not in ("one", "two"):
            raise ValueError("dispatch must be 'one' or 'two'")
        self.dispatch = dispatch
        self.outer_loop_callback = outer_loop_callback
        self.checkpoint_dir = checkpoint_dir

    def _run_two_dispatch(self, dtype) -> FusedOptOrbEigensolverResult:
        """Two compiled programs per outer iteration (weighted eigensolver
        + RDMs, then BB/rotation) with a host convergence check — same
        semantics as the one-dispatch program (see FusedOptOrbVQE)."""
        cb = _make_program_callback(self.outer_loop_callback,
                                    self.checkpoint_dir)
        n_active = self.num_spin_orbitals // 2
        h_sp, g_sp = self._h_sp, self._g_sp
        bb = jnp.asarray(self.initial_BBstepsize, dtype)
        inner_tol = jnp.asarray(self.inner_stopping_tolerance, dtype)
        decay = jnp.asarray(self.decay_factor, dtype)
        common = dict(vqe_maxiter=self.vqe_maxiter,
                      vqe_ftol=getattr(self, "vqe_ftol", None),
                      sector=self._sector,
                      sector_init=self._sector_init,
                      sector_tables=getattr(self, "_sector_tables", None))

        theta = self._theta0
        U = orth(self._U0)
        trace = np.full((self.maxiter,), np.nan)
        E_prev = np.inf
        it = 0
        converged = False
        while True:
            theta, Ew, energies, gamma_s, Gamma_s = _ssvqe_eig_rdm_program(
                self._apply_raw, n_active, self._init_mat, self._weights,
                theta, U, h_sp, g_sp, **common)
            Ew_f = float(Ew)
            if it < trace.shape[0]:
                trace[it] = Ew_f
            if cb is not None:
                cb(it + 1, np.asarray(energies), np.asarray(theta),
                   np.asarray(U), trace)
            converged = abs(Ew_f - E_prev) < self.stopping_tolerance
            it += 1
            if converged or it >= self.maxiter:
                break
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            E_prev = Ew_f
        if not converged:
            # hit_max: rotate once more, report energies of the last theta
            # under the fresh Hamiltonian (one-dispatch parity)
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            energies = _ssvqe_energies_program(
                self._apply_raw, n_active, self._init_mat, self._weights,
                theta, U, h_sp, g_sp, **common)
        t1 = _eigensolver_transition_rdm1s(self, theta, shared_theta=True)
        return _attach_eigensolver_diagnostics(FusedOptOrbEigensolverResult(
            eigenvalues=np.asarray(energies),
            optimal_point=np.asarray(theta),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace[:it]],
            outer_iterations=it,
            transition_rdm1_spatial=t1,
        ), self, theta, shared_theta=True)

    def compute_energies(self) -> FusedOptOrbEigensolverResult:
        from ..utils.config import precision_mode
        dtype = self._h_sp.dtype
        mode = "fast" if jnp.finfo(dtype).bits < 64 else "high"
        if getattr(self, "dispatch", "one") == "two":
            with precision_mode(mode):
                return self._run_two_dispatch(dtype)
        live_cb, post_cb = _cached_callbacks(self)
        with precision_mode(mode):
            energies, theta, U, it, trace = _fused_optorb_ssvqe(
                self._apply_raw,
                self.num_spin_orbitals // 2,
                self._init_mat, self._weights,
                self._theta0, self._U0, self._h_sp, self._g_sp,
                jnp.asarray(self.stopping_tolerance, dtype),
                jnp.asarray(self.inner_stopping_tolerance, dtype),
                jnp.asarray(self.initial_BBstepsize, dtype),
                jnp.asarray(self.decay_factor, dtype),
                outer_maxiter=self.maxiter,
                inner_maxiter=self.inner_maxiter,
                vqe_maxiter=self.vqe_maxiter,
                vqe_ftol=getattr(self, "vqe_ftol", None),
                sector=self._sector,
                sector_init=self._sector_init,
                callback=live_cb,
                sector_tables=getattr(self, "_sector_tables", None),
            )
        it = int(it)
        if post_cb is not None:
            post_cb(it, energies, theta, U, trace)
        t1 = _eigensolver_transition_rdm1s(self, theta, shared_theta=True)
        return _attach_eigensolver_diagnostics(FusedOptOrbEigensolverResult(
            eigenvalues=np.asarray(energies),
            optimal_point=np.asarray(theta),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e)
                                     for e in np.asarray(trace)[:it]],
            outer_iterations=it,
            transition_rdm1_spatial=t1,
        ), self, theta, shared_theta=True)


class FusedOptOrbMCVQE(FusedOptOrbSSVQE):
    """One-dispatch MCVQE OptOrb loop: CIS/CISD-initialized SSVQE core plus
    the contracted-Hamiltonian post-processing (reference mcvqe.py:416-480)
    evaluated through the same fused machinery.
    """

    def __init__(self, num_spin_orbitals: int, ansatz, num_particles,
                 k: int = 2, excitations: str = "s", weight_vector=None,
                 problem=None, integral_tensors=None, **kwargs):
        from ..initializations.ci import get_CIS_states, get_CISD_states
        from ..sim.circuit import QuantumCircuit as _QC
        from .kernels import (expand_spin_tensors, rotated_integrals_spatial,
                              spatial_blocks, spin_blocks_consistent)

        if problem is not None:
            # qiskit-nature drop-in interop (same seam as the siblings,
            # fused.py FusedOptOrbVQE/SSVQE __init__): this ctor reads the
            # problem before super().__init__ ever sees it
            from ..interop import adapt as _interop_adapt
            problem, _ = _interop_adapt(problem, None)
        if integral_tensors is not None:
            h_so = np.asarray(integral_tensors[0], dtype=np.float64)
            g_so = np.asarray(integral_tensors[1], dtype=np.float64)
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbMCVQE requires spin-block-structured integrals")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        elif problem is not None and hasattr(problem,
                                             "spatial_integral_tensors"):
            h_sp, g_sp = problem.spatial_integral_tensors()
        elif problem is not None:
            h_so, g_so = problem.integral_tensors()
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbMCVQE requires spin-block-structured integrals")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        else:
            raise ValueError("either `problem` or `integral_tensors` required")

        # CIS/CISD states from the initial-U-rotated integrals
        # (reference semantics: opt_orb_mcvqe.py:90-103)
        n = num_spin_orbitals // 2
        U0 = kwargs.get("initial_partial_unitary")
        if U0 is None:
            U0 = np.zeros((h_sp.shape[0], n))
            U0[np.arange(n), np.arange(n)] = 1.0
        h_act, g_act = rotated_integrals_spatial(
            jnp.asarray(U0), jnp.asarray(h_sp), jnp.asarray(g_sp))
        h_act_so, g_act_so = expand_spin_tensors(h_act, g_act)
        get = get_CIS_states if excitations == "s" else get_CISD_states
        states = get(np.asarray(h_act_so), np.asarray(g_act_so),
                     num_particles, state_representation="dense")
        if len(states) < k:
            raise ValueError(f"CI produced {len(states)} states < k={k}")
        self._ci_vectors = [np.real(np.asarray(s)) for s in states[:k]]
        init_circuits = []
        for vec in self._ci_vectors:
            qc = _QC(num_spin_orbitals)
            qc.initialize_statevector(vec)
            init_circuits.append(qc)

        super().__init__(num_spin_orbitals, ansatz, init_circuits,
                         weight_vector=weight_vector,
                         _spatial_tensors=(h_sp, g_sp), **kwargs)

    def compute_energies(self) -> FusedOptOrbEigensolverResult:
        self._defer_diagnostics = True
        try:
            base = super().compute_energies()
        finally:
            self._defer_diagnostics = False
        # contracted Hamiltonian: H_ii = E_i; H_ij = (E_plus - E_minus)/2
        # with (|i> +/- |j>)/sqrt(2) pushed through the optimized ansatz at
        # the final rotated Hamiltonian.
        theta = jnp.asarray(base.optimal_point, dtype=self._h_sp.dtype)
        U = jnp.asarray(base.optimal_partial_unitary, dtype=self._h_sp.dtype)
        h_act = rotate_one_body(self._h_sp, U)
        g_act = rotate_two_body(self._g_sp, U)
        h_so, g_so = expand_spin_tensors(h_act, g_act)

        # ONE batched device call for all k + 2*k(k-1)/2 state energies
        # (per-vector dispatches get quadratically chatty at larger k)
        kk = self.k
        vecs = [np.asarray(self._ci_vectors[i]) for i in range(kk)]
        batch = list(vecs)
        pairs = [(i, j) for i in range(kk) for j in range(i + 1, kk)]
        for i, j in pairs:
            batch.append((vecs[i] + vecs[j]) / np.sqrt(2))
            batch.append((vecs[i] - vecs[j]) / np.sqrt(2))
        stack = jnp.asarray(np.stack(batch), dtype=self._h_sp.dtype)
        E = np.asarray(_mcvqe_batched_energies(self._apply_raw, stack,
                                               theta, h_so, g_so))
        Hc = np.zeros((kk, kk))
        for i in range(kk):
            Hc[i, i] = E[i]
        for idx, (i, j) in enumerate(pairs):
            Hc[i, j] = Hc[j, i] = 0.5 * (E[kk + 2 * idx]
                                         - E[kk + 2 * idx + 1])
        w, Cc = np.linalg.eigh(Hc)
        base.eigenvalues = w
        if base.transition_rdm1_spatial is not None:
            # the contracted eigenstates are |I> = sum_a Cc[a, I] |raw_a>
            # (raw = ansatz-pushed CI vectors, orthonormal since the
            # ansatz is unitary), so the transition RDMs transform
            # bilinearly into the eigenbasis
            base.transition_rdm1_spatial = np.einsum(
                "ai,bj,abps->ijps", Cc, Cc,
                base.transition_rdm1_spatial, optimize=True)
        # per-state diagnostics likewise belong to the CONTRACTED
        # eigenstates |I> = sum_a Cc[a, I]|raw_a>, not the raw states
        # the SSVQE core reported — recompute with the mix
        _attach_eigensolver_diagnostics(base, self, theta,
                                        shared_theta=True, mix=Cc)
        return base


@partial(jax.jit, static_argnames=("sector", "shared_theta"))
def _sector_eigenstates_program(sector, init, thetas, shared_theta=False,
                                tables=None):
    """(k, nd+1) optimal sector eigenstates: each initial state pushed
    through the optimized ansatz (SSVQE/MCVQE share one theta; VQD has
    per-state thetas)."""
    if shared_theta:
        return jax.vmap(
            lambda v0: sector.apply(v0, thetas, tables=tables))(init)
    return jax.vmap(
        lambda v0, th: sector.apply(v0, th, tables=tables))(init, thetas)


@partial(jax.jit, static_argnames=("sector",))
def _sector_transition_rdm1s(sector, states, mix=None, tables=None):
    """(k, k, n, n) spin-summed spatial transition 1-RDMs
    t[i, j, p, s] = <psi_i|E_ps|psi_j> between sector states (k, nd[+1])
    — the eigensolver-family analogue of casscf._transition_rdm1s,
    feeding chem.properties.transition_dipoles.  `mix` (k, k) optionally
    re-expresses the target eigenstates as mix[:, I]-weighted
    combinations of the raw states (the MCVQE contracted basis)."""
    Vg = jnp.asarray(states)[:, : sector.dim]
    if mix is not None:
        Vg = jnp.asarray(mix, dtype=Vg.dtype).T @ Vg

    def one(vj):
        g = sector.transition_rdm1(Vg, vj, tables=tables)
        n = g.shape[-1] // 2
        return g[:, :n, :n] + g[:, n:, n:]

    t = jax.lax.map(one, Vg)          # t[j, i] = <i|E|j>
    return jnp.swapaxes(t, 0, 1)


@partial(jax.jit, static_argnames=("sector",))
def _sector_states_diagnostics(sector, states, mix=None, tables=None):
    """Per-state wavefunction diagnostics of (k, nd[+1]) sector states:
    (natural occupations (k, n), <S^2> (k,), spatial 1-RDMs (k, n, n),
    spin densities (k, n, n)).  `mix` (k, k) optionally re-expresses the
    states as mix[:, I]-weighted combinations first (the MCVQE
    contracted eigenbasis) — the pad slot is rebuilt as zero, which is
    exact (rdms never reads it)."""
    V = jnp.asarray(states)
    if mix is not None:
        Vg = jnp.asarray(mix, dtype=V.dtype).T @ V[:, : sector.dim]
        V = jnp.pad(Vg, ((0, 0), (0, V.shape[1] - sector.dim)))

    def one(v):
        gamma, Gamma = sector.rdms(v, tables=tables)
        return _rdm_diagnostics(gamma, Gamma)

    return jax.lax.map(one, V)


def _postrun_eigenstates(solver, thetas, shared_theta):
    """The (k, nd[+1]) optimal sector eigenstates at `thetas`, computed
    ONCE per result: transition RDMs and the per-state diagnostics both
    consume them, and the per-state ansatz push is the dominant
    post-run device cost at larger N — a one-slot cache on the solver
    keyed by the theta bytes collapses the (previously duplicated)
    dispatches."""
    sector = solver._sector
    tables = getattr(solver, "_sector_tables", None)
    key = (np.asarray(thetas).tobytes(), bool(shared_theta))
    hit = getattr(solver, "_postrun_states_cache", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    states = _sector_eigenstates_program(
        sector, solver._sector_init, jnp.asarray(thetas),
        shared_theta=shared_theta, tables=tables)
    solver._postrun_states_cache = (key, states)
    return states


def _eigensolver_diagnostics(solver, thetas, shared_theta, mix=None):
    """Post-run per-state diagnostics for the fused eigensolver family —
    like _eigensolver_transition_rdm1s, only available when the run
    simulated in the determinant sector (full-space 2^N runs return
    None; rerun with simulation='sector' for per-state RDM
    diagnostics)."""
    sector = getattr(solver, "_sector", None)
    if sector is None or getattr(sector, "kernel", None) != "strings":
        return None
    tables = getattr(solver, "_sector_tables", None)
    states = _postrun_eigenstates(solver, thetas, shared_theta)
    occ, s2, g1, sd = _sector_states_diagnostics(
        sector, states,
        mix=None if mix is None else jnp.asarray(mix), tables=tables)
    return (np.asarray(occ), np.asarray(s2), np.asarray(g1),
            np.asarray(sd))


def _attach_eigensolver_diagnostics(result, solver, thetas, shared_theta,
                                    mix=None):
    if not getattr(solver, "diagnostics", True):
        return result
    if mix is None and getattr(solver, "_defer_diagnostics", False):
        # MCVQE recomputes these in the contracted eigenbasis right
        # after super().compute_energies(); skip the raw-basis pass
        return result
    d = _eigensolver_diagnostics(solver, thetas, shared_theta, mix=mix)
    if d is not None:
        (result.natural_occupations, result.spin_squared,
         result.one_rdm_spatial, result.spin_density_spatial) = d
    return result


def _eigensolver_transition_rdm1s(solver, thetas, shared_theta):
    """Post-run transition-RDM extraction for the fused eigensolver
    family: only possible when the run simulated in the determinant
    sector with the string kernel (full-space 2^N runs return None —
    document: rerun with simulation='sector' for transition moments)."""
    sector = getattr(solver, "_sector", None)
    if sector is None or getattr(sector, "kernel", None) != "strings":
        return None
    tables = getattr(solver, "_sector_tables", None)
    states = _postrun_eigenstates(solver, thetas, shared_theta)
    return np.asarray(_sector_transition_rdm1s(sector, states,
                                               tables=tables))


@partial(jax.jit, static_argnames=("apply_raw",))
def _mcvqe_batched_energies(apply_raw, stack, theta, h_so, g_so):
    """All contracted-Hamiltonian state energies in one device dispatch
    (apply_raw is fingerprint-cached, so the program caches across runs)."""
    return jax.vmap(
        lambda v: rdm_energy(apply_raw(v, theta), h_so, g_so))(stack)


def _vqd_stage_fns(apply_fn, n_active, k, init_mat, betas, weights,
                   sector, sector_init, vqe_maxiter, dtype, tables=None,
                   ftol=None):
    """(run_vqd, batch_rdms) for the sequential-deflation eigensolver
    stage, shared by the one-dispatch program and the two-dispatch
    variant.  `tables` threads the sector tables in as program arguments
    (mesh-sharded placement, parallel.shard_sector_tables)."""
    N = 2 * n_active
    dim = init_mat.shape[1]
    gtol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-5
    # beta for previous state i is betas[i] (ref vqd.py:413-414);
    # pad at the END so index k-1 (never a previous state) is inert
    bpad = jnp.concatenate([betas, jnp.zeros(1, betas.dtype)])

    if isinstance(apply_fn, tuple):
        # per-state ansatze (reference vqd.py:17-18,203-206): k compiled
        # apply functions dispatched by lax.switch on the traced state
        # index; thetas are END-padded to the widest parameter count, and
        # branch i consumes only its own leading slice (pad gradients are
        # exactly zero, so the masked L-BFGS never moves them)
        _branches = tuple(
            (lambda v, t, f=f, P=P: f(v, t[:P])) for f, P in apply_fn)

        def apply_state(j, v, theta):
            return jax.lax.switch(j, _branches, v, theta)
    else:
        def apply_state(j, v, theta):
            return apply_fn(v, theta)

    if sector is None:
        def deflated_cost(theta, j, prev_states, h_so, g_so):
            s = apply_state(j, init_mat[j], theta)
            e = rdm_energy(s, h_so, g_so)
            ov = prev_states @ s                      # (k,) overlaps
            mask = (jnp.arange(k) < j).astype(s.dtype)
            return e + jnp.sum(mask * bpad * ov * ov)

        def run_vqd(thetas, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)

            def step(j, carry):
                thetas, prev_states, energies = carry
                res = lbfgs_minimize(
                    deflated_cost, thetas[j],
                    args=(j, prev_states, h_so, g_so),
                    maxiter=vqe_maxiter, gtol=gtol, ftol=ftol)
                s = apply_state(j, init_mat[j], res.x)
                e = rdm_energy(s, h_so, g_so)   # deflation-free eigenvalue
                return (thetas.at[j].set(res.x),
                        prev_states.at[j].set(s),
                        energies.at[j].set(e))

            prev0 = jnp.zeros((k, dim), dtype=dtype)
            e0 = jnp.zeros((k,), dtype=dtype)
            thetas, states, energies = jax.lax.fori_loop(
                0, k, step, (thetas, prev0, e0))
            return thetas, states, energies

        def batch_rdms(states):
            return (jax.vmap(lambda s: one_rdm(s, N))(states),
                    jax.vmap(lambda s: two_rdm(s, N))(states))
    else:
        def run_vqd(thetas, h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            vals = sector.build_values(h_so, g_so, tables=tables)
            nd = sector.dim

            def deflated_cost_s(theta, j, prev_vs):
                v = sector.apply(sector_init[j], theta, tables=tables)
                e = sector.quadform_values(v, vals, tables=tables)
                ov = prev_vs[:, :nd] @ v[:nd]
                mask = (jnp.arange(k) < j).astype(v.dtype)
                return e + jnp.sum(mask * bpad * ov * ov)

            def step(j, carry):
                thetas, prev_vs, energies = carry
                res = lbfgs_minimize(
                    deflated_cost_s, thetas[j], args=(j, prev_vs),
                    maxiter=vqe_maxiter, gtol=gtol, ftol=ftol)
                v = sector.apply(sector_init[j], res.x, tables=tables)
                e = sector.quadform_values(v, vals, tables=tables)
                return (thetas.at[j].set(res.x),
                        prev_vs.at[j].set(v),
                        energies.at[j].set(e))

            prev0 = jnp.zeros((k, sector.dim + 1), dtype=dtype)
            e0 = jnp.zeros((k,), dtype=dtype)
            thetas, vs, energies = jax.lax.fori_loop(
                0, k, step, (thetas, prev0, e0))
            return thetas, vs, energies

        def batch_rdms(vs):
            # sector-native RDMs: never touches the 2^N space
            return jax.vmap(lambda v: sector.rdms(v, tables=tables))(vs)

    return run_vqd, batch_rdms


@partial(jax.jit, static_argnames=(
    "apply_fn", "n_active", "k", "vqe_maxiter", "vqe_ftol", "sector"))
def _vqd_eig_rdm_program(apply_fn, n_active, k, init_mat, betas, weights,
                         thetas, U, h_sp, g_sp, vqe_maxiter=300,
                         sector=None, sector_init=None,
                         sector_tables=None, vqe_ftol=None):
    """Two-dispatch mode, VQD program A: rotate, sequential deflation
    over the k states, weight-combined spin-reduced RDMs."""
    run_vqd, batch_rdms = _vqd_stage_fns(
        apply_fn, n_active, k, init_mat, betas, weights, sector,
        sector_init, vqe_maxiter, h_sp.dtype, tables=sector_tables,
        ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    thetas, states, energies = run_vqd(thetas, h_act, g_act)
    gammas, Gammas = batch_rdms(states)
    gamma_s, Gamma_s = spin_reduce_rdms(
        jnp.tensordot(weights, gammas, axes=1),
        jnp.tensordot(weights, Gammas, axes=1))
    return thetas, energies, gamma_s, Gamma_s


@partial(jax.jit, static_argnames=(
    "apply_fn", "n_active", "k", "vqe_maxiter", "vqe_ftol", "sector"))
def _vqd_eig_only_program(apply_fn, n_active, k, init_mat, betas, weights,
                          thetas, U, h_sp, g_sp, vqe_maxiter=300,
                          sector=None, sector_init=None,
                          sector_tables=None, vqe_ftol=None):
    """Two-dispatch final re-solve: deflation only, no RDM work
    (one-dispatch parity tail — _fused_optorb_vqd re-runs run_vqd at the
    final U unconditionally; its RDMs are never consumed there)."""
    run_vqd, _ = _vqd_stage_fns(
        apply_fn, n_active, k, init_mat, betas, weights, sector,
        sector_init, vqe_maxiter, h_sp.dtype, tables=sector_tables,
        ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    thetas, _, energies = run_vqd(thetas, h_act, g_act)
    return thetas, energies


@partial(jax.jit, static_argnames=(
    "apply_fn", "n_active", "k", "outer_maxiter", "inner_maxiter",
    "vqe_maxiter", "vqe_ftol", "sector", "callback"))
def _fused_optorb_vqd(apply_fn: Callable,
                      n_active: int,
                      k: int,
                      init_mat: jnp.ndarray,        # (k, 2^N) initial states
                      betas: jnp.ndarray,           # (k-1,)
                      weights: jnp.ndarray,         # (k,) orbital weights
                      theta0: jnp.ndarray,          # (k, n_params)
                      U0: jnp.ndarray,
                      h_sp: jnp.ndarray,
                      g_sp: jnp.ndarray,
                      outer_tol: jnp.ndarray,
                      inner_tol: jnp.ndarray,
                      bb_stepsize: jnp.ndarray,
                      decay: jnp.ndarray,
                      outer_maxiter: int = 20,
                      inner_maxiter: int = 10000,
                      vqe_maxiter: int = 300,
                      sector=None,
                      sector_init: jnp.ndarray = None,   # (k, nd + 1)
                      callback=None,
                      sector_tables=None,
                      vqe_ftol: float = None):
    """Fused VQD OptOrb loop.  Deflation is sequential over the k states
    (mandatory: state j's penalty references states < j), but each state's
    BFGS, the overlap penalties, the RDMs and the BB descent all live in
    the single compiled program.  Returns (energies, thetas, U, it, trace).

    With `sector` + `sector_init`, each state's cost, its deflation
    overlaps, and the eigenvalues run in the particle-number sector; the
    per-state RDM extraction (sector.rdms) stays in the sector too.
    """
    run_vqd, batch_rdms = _vqd_stage_fns(
        apply_fn, n_active, k, init_mat, betas, weights, sector,
        sector_init, vqe_maxiter, h_sp.dtype, tables=sector_tables,
        ftol=vqe_ftol)
    vag = _ORBITAL_VAG

    def outer_cond(c):
        return jnp.logical_not(c[-1])

    def outer_body(c):
        it, thetas, U, E_prev, _, trace, done = c
        h_act = rotate_one_body(h_sp, U)
        g_act = rotate_two_body(g_sp, U)
        thetas, states, energies = run_vqd(thetas, h_act, g_act)
        Ew = jnp.dot(weights, energies)
        trace = trace.at[it].set(Ew)
        if callback is not None:
            jax.debug.callback(callback, it + 1, energies, thetas, U, trace)

        gammas, Gammas = batch_rdms(states)
        gamma_s, Gamma_s = spin_reduce_rdms(
            jnp.tensordot(weights, gammas, axes=1),
            jnp.tensordot(weights, Gammas, axes=1))

        U_new = _inner_bb(vag, U, (gamma_s, Gamma_s, h_sp, g_sp),
                          bb_stepsize, inner_tol, decay, inner_maxiter)
        converged = jnp.abs(Ew - E_prev) < outer_tol
        hit_max = it + 1 >= outer_maxiter
        U_out = jnp.where(converged, U, U_new)
        return (it + 1, thetas, U_out, Ew, Ew, trace,
                jnp.logical_or(converged, hit_max))

    trace0 = jnp.full((outer_maxiter,), jnp.nan, dtype=h_sp.dtype)
    c0 = (jnp.asarray(0), theta0, orth(U0),
          jnp.asarray(jnp.inf, h_sp.dtype), jnp.asarray(0.0, h_sp.dtype),
          trace0, jnp.asarray(False))
    it, thetas, U, _, Ew, trace, done = jax.lax.while_loop(
        outer_cond, outer_body, c0)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    thetas, states, energies = run_vqd(thetas, h_act, g_act)
    return energies, thetas, U, it, trace


class FusedOptOrbVQD(FusedOptOrbSSVQE):
    """One-dispatch VQD OptOrb loop: sequential beta-penalized deflation
    over k states inside the single compiled outer loop.

    `ansatz` may be one shared circuit or a LIST of k per-state circuits
    (the reference VQD's signature feature, vqd.py:17-18,203-206): with a
    list, each state's circuit compiles into the single program and is
    selected by lax.switch on the state index; parameter vectors are
    end-padded to the widest circuit (`optimal_point` row i is ansatz i's
    parameters in its leading slice).  Per-state ansatze require
    simulation='full' (the sector program compiles one excitation table).
    """

    _requires_orthogonal_inits = False  # deflation separates the states

    def __init__(self, num_spin_orbitals: int, ansatz, initial_states,
                 betas=None, weight_vector=None, **kwargs):
        ansatz_list = None
        if isinstance(ansatz, (list, tuple)):
            ansatz_list = list(ansatz)
            if len(ansatz_list) != len(initial_states):
                raise ValueError(
                    f"need one ansatz per state: got {len(ansatz_list)} "
                    f"ansatze for {len(initial_states)} initial states")
            if kwargs.get("simulation", "auto") == "sector":
                raise ValueError(
                    "per-state ansatze require simulation='full'")
            # 'auto' (explicit or the omitted default) resolves to
            # sector, whose program compiles ONE excitation table and
            # would silently simulate every state with ansatz_list[0]'s
            # circuit — force the full simulator
            if kwargs.get("simulation", "auto") == "auto":
                kwargs["simulation"] = "full"
            user_point = kwargs.pop("initial_point", None)
            ansatz = ansatz_list[0]
            kwargs["initial_point"] = None
        super().__init__(num_spin_orbitals, ansatz, initial_states,
                         weight_vector=weight_vector, **kwargs)
        if ansatz_list is not None:
            compiled = []
            for a in ansatz_list:
                enc = getattr(a, "_encoding", "jw")
                if enc != "jw":
                    raise ValueError(
                        f"fused solvers require Jordan-Wigner-encoded "
                        f"ansatze; got encoding {enc!r}")
                c = compile_circuit(a)
                if not c.is_real:
                    raise ValueError(
                        "fused path requires real-safe ansatze")
                compiled.append(c)
            self._apply_raw = tuple(
                (c.apply_raw, a.num_parameters)
                for c, a in zip(compiled, ansatz_list))
            pmax = max(a.num_parameters for a in ansatz_list)
            theta0 = np.zeros((self.k, pmax))
            if user_point is not None:
                pts = (user_point if isinstance(user_point[0],
                                                (list, tuple, np.ndarray))
                       else [user_point] * self.k)
                if len(pts) != self.k:
                    raise ValueError(
                        f"initial_point must provide one vector per state: "
                        f"got {len(pts)} for k={self.k}")
                for i, (p, a) in enumerate(zip(pts, ansatz_list)):
                    p = np.asarray(p, dtype=np.float64)
                    if p.shape[0] != a.num_parameters:
                        raise ValueError(
                            f"initial point {i} has {p.shape[0]} values "
                            f"for a {a.num_parameters}-parameter ansatz")
                    theta0[i, : p.shape[0]] = p
            self._theta0 = jnp.asarray(theta0, dtype=self._h_sp.dtype)
            self._ansatz_list = ansatz_list
        if betas is None:
            # deflation only works when beta exceeds the relevant energy
            # gap; derive the bound from the active-space integrals at the
            # ACTUAL starting partial unitary (class-based VQD uses the
            # Pauli 1-norm + 10, solvers/vqd.py:86-88)
            U0 = jnp.asarray(self._U0, self._h_sp.dtype)
            h_act = rotate_one_body(self._h_sp, U0)
            g_act = rotate_two_body(self._g_sp, U0)
            bound = float(jnp.sum(jnp.abs(h_act))
                          + jnp.sum(jnp.abs(g_act))) + 10.0
            betas = [bound] * (self.k - 1)
        if len(betas) < self.k - 1:
            raise ValueError("betas must have length k-1")
        self._betas = jnp.asarray(betas[: self.k - 1],
                                  dtype=self._h_sp.dtype)

    def _run_two_dispatch(self, dtype) -> FusedOptOrbEigensolverResult:
        """Two compiled programs per outer iteration (sequential deflation
        + RDMs, then BB/rotation) with a host convergence check."""
        cb = _make_program_callback(self.outer_loop_callback,
                                    self.checkpoint_dir)
        n_active = self.num_spin_orbitals // 2
        h_sp, g_sp = self._h_sp, self._g_sp
        bb = jnp.asarray(self.initial_BBstepsize, dtype)
        inner_tol = jnp.asarray(self.inner_stopping_tolerance, dtype)
        decay = jnp.asarray(self.decay_factor, dtype)
        thetas = self._theta0.astype(dtype) if self._theta0.ndim == 2 \
            else jnp.broadcast_to(
                self._theta0, (self.k, self._theta0.shape[0])).astype(dtype)

        def program_a(thetas, U):
            return _vqd_eig_rdm_program(
                self._apply_raw, n_active, self.k, self._init_mat,
                self._betas, self._weights, thetas, U, h_sp, g_sp,
                vqe_maxiter=self.vqe_maxiter,
                vqe_ftol=getattr(self, "vqe_ftol", None),
                sector=self._sector,
                sector_init=self._sector_init,
                sector_tables=getattr(self, "_sector_tables", None))

        w = np.asarray(self._weights)
        U = orth(self._U0)
        trace = np.full((self.maxiter,), np.nan)
        E_prev = np.inf
        it = 0
        converged = False
        while True:
            thetas, energies, gamma_s, Gamma_s = program_a(thetas, U)
            Ew_f = float(np.dot(w, np.asarray(energies)))
            if it < trace.shape[0]:
                trace[it] = Ew_f
            if cb is not None:
                cb(it + 1, np.asarray(energies), np.asarray(thetas),
                   np.asarray(U), trace)
            converged = abs(Ew_f - E_prev) < self.stopping_tolerance
            it += 1
            if converged or it >= self.maxiter:
                break
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            E_prev = Ew_f
        if not converged:
            # hit_max: rotate once more (one-dispatch body's final U_new)
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
        # one-dispatch parity: _fused_optorb_vqd re-runs the deflation at
        # the final U UNCONDITIONALLY (also on the converged exit, where
        # the warm restart can keep optimizing if a state's L-BFGS
        # previously stopped on hit_max/no_move); no RDM work in the tail
        thetas, energies = _vqd_eig_only_program(
            self._apply_raw, n_active, self.k, self._init_mat,
            self._betas, self._weights, thetas, U, h_sp, g_sp,
            vqe_maxiter=self.vqe_maxiter,
            vqe_ftol=getattr(self, "vqe_ftol", None),
            sector=self._sector,
            sector_init=self._sector_init,
            sector_tables=getattr(self, "_sector_tables", None))
        t1 = _eigensolver_transition_rdm1s(self, thetas,
                                           shared_theta=False)
        result = FusedOptOrbEigensolverResult(
            eigenvalues=np.asarray(energies),
            optimal_point=np.asarray(thetas),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace[:it]],
            outer_iterations=it,
            transition_rdm1_spatial=t1,
        )
        return _attach_eigensolver_diagnostics(result, self, thetas,
                                               shared_theta=False)

    def compute_energies(self) -> FusedOptOrbEigensolverResult:
        from ..utils.config import precision_mode
        dtype = self._h_sp.dtype
        mode = "fast" if jnp.finfo(dtype).bits < 64 else "high"
        if getattr(self, "dispatch", "one") == "two":
            with precision_mode(mode):
                return self._run_two_dispatch(dtype)
        theta0 = self._theta0.astype(dtype) if self._theta0.ndim == 2 \
            else jnp.broadcast_to(
                self._theta0, (self.k, self._theta0.shape[0])).astype(dtype)
        live_cb, post_cb = _cached_callbacks(self)
        with precision_mode(mode):
            energies, thetas, U, it, trace = _fused_optorb_vqd(
                self._apply_raw,
                self.num_spin_orbitals // 2,
                self.k,
                self._init_mat, self._betas, self._weights,
                theta0, self._U0, self._h_sp, self._g_sp,
                jnp.asarray(self.stopping_tolerance, dtype),
                jnp.asarray(self.inner_stopping_tolerance, dtype),
                jnp.asarray(self.initial_BBstepsize, dtype),
                jnp.asarray(self.decay_factor, dtype),
                outer_maxiter=self.maxiter,
                inner_maxiter=self.inner_maxiter,
                vqe_maxiter=self.vqe_maxiter,
                vqe_ftol=getattr(self, "vqe_ftol", None),
                sector=self._sector,
                sector_init=self._sector_init,
                callback=live_cb,
                sector_tables=getattr(self, "_sector_tables", None),
            )
        it = int(it)
        if post_cb is not None:
            post_cb(it, energies, thetas, U, trace)
        t1 = _eigensolver_transition_rdm1s(self, thetas,
                                           shared_theta=False)
        result = FusedOptOrbEigensolverResult(
            eigenvalues=np.asarray(energies),
            optimal_point=np.asarray(thetas),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e)
                                     for e in np.asarray(trace)[:it]],
            outer_iterations=it,
            transition_rdm1_spatial=t1,
        )
        return _attach_eigensolver_diagnostics(result, self, thetas,
                                               shared_theta=False)


def _adapt_stage_fns(state_fn, n_active, R, P, sector, vqe_maxiter, dtype,
                     grad_tol, eig_tol, tables=None, ftol=None):
    """(run_adapt, extract_rdms) for the ADAPT eigensolver stage, shared
    by the one-dispatch program and the two-dispatch variant.  `tables`
    threads the sector tables in as program arguments (mesh-sharded
    placement, parallel.shard_sector_tables)."""
    N = 2 * n_active
    gtol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-5

    if sector is None:
        def make_energy(h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)

            def energy(theta):
                return rdm_energy(state_fn(theta), h_so, g_so)
            return energy

        def extract_rdms(theta):
            state = state_fn(theta)
            return one_rdm(state, N), two_rdm(state, N)
    else:
        def make_energy(h_act, g_act):
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            vals = sector.build_values(h_so, g_so, tables=tables)

            def energy(theta):
                return sector.energy_values(theta, vals, tables=tables)
            return energy

        def extract_rdms(theta):
            # sector-native RDMs: never touches the 2^N space
            return sector.rdms(sector.state(theta, tables=tables),
                               tables=tables)

    def run_adapt(h_act, g_act):
        vqe_energy = make_energy(h_act, g_act)
        e_vag = jax.value_and_grad(vqe_energy)

        def masked_cost(theta, mask):
            return vqe_energy(theta * mask)

        def grow_cond(c):
            r, theta, mask, prev_sel, E_g, done_g = c
            return jnp.logical_and(r < R, jnp.logical_not(done_g))

        def grow_body(c):
            r, theta, mask, prev_sel, E_g, done_g = c
            # screening: raw gradient at theta (zeros in unselected slots)
            _, grad = e_vag(theta)
            pg = jnp.abs(jax.lax.dynamic_slice(grad, (r * P,), (P,)))
            best = jnp.argmax(pg)
            max_g = pg[best]
            stop_grad = max_g < grad_tol
            cyclic = jnp.logical_and(r > 0, best == prev_sel)
            grow = jnp.logical_not(jnp.logical_or(stop_grad, cyclic))

            mask_new = jnp.where(grow,
                                 mask.at[r * P + best].set(
                                     jnp.asarray(1.0, dtype)),
                                 mask)
            res = lbfgs_minimize(masked_cost, theta, args=(mask_new,),
                                 maxiter=vqe_maxiter, gtol=gtol, ftol=ftol)
            theta_new = jnp.where(grow, res.x * mask_new, theta)
            E_new = jnp.where(grow, res.fun, E_g)
            small_gain = jnp.logical_and(
                r > 0, jnp.abs(E_new - E_g) < eig_tol)
            done_new = jnp.logical_or(
                jnp.logical_or(stop_grad, cyclic),
                jnp.logical_and(grow, small_gain))
            return (r + 1, theta_new, mask_new, best, E_new, done_new)

        theta0 = jnp.zeros((R * P,), dtype=dtype)
        mask0 = jnp.zeros((R * P,), dtype=dtype)
        E0 = vqe_energy(theta0)
        c = (jnp.asarray(0), theta0, mask0, jnp.asarray(-1), E0,
             jnp.asarray(False))
        _, theta, mask, _, E, _ = jax.lax.while_loop(grow_cond, grow_body, c)
        return theta, mask, E

    return run_adapt, extract_rdms


@partial(jax.jit, static_argnames=(
    "state_fn", "n_active", "R", "P", "vqe_maxiter", "vqe_ftol", "sector"))
def _adapt_eig_rdm_program(state_fn: Callable,
                           n_active: int,
                           R: int,
                           P: int,
                           U: jnp.ndarray,
                           h_sp: jnp.ndarray,
                           g_sp: jnp.ndarray,
                           grad_tol: jnp.ndarray,
                           eig_tol: jnp.ndarray,
                           vqe_maxiter: int = 200,
                           sector=None,
                           sector_tables=None,
                           vqe_ftol: float = None):
    """Two-dispatch mode, ADAPT program A: rotate integrals, run the
    on-device growth loop from scratch, extract spin-reduced RDMs."""
    run_adapt, extract_rdms = _adapt_stage_fns(
        state_fn, n_active, R, P, sector, vqe_maxiter, h_sp.dtype,
        grad_tol, eig_tol, tables=sector_tables, ftol=vqe_ftol)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    theta, mask, E = run_adapt(h_act, g_act)
    gamma, Gamma = extract_rdms(theta * mask)
    gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
    return theta, mask, E, gamma_s, Gamma_s


@partial(jax.jit, static_argnames=(
    "state_fn", "n_active", "R", "P", "outer_maxiter", "inner_maxiter",
    "vqe_maxiter", "vqe_ftol", "sector", "callback"))
def _fused_optorb_adapt_vqe(state_fn: Callable,
                            n_active: int,
                            R: int,                 # growth slots
                            P: int,                 # pool size
                            U0: jnp.ndarray,
                            h_sp: jnp.ndarray,
                            g_sp: jnp.ndarray,
                            grad_tol: jnp.ndarray,
                            eig_tol: jnp.ndarray,
                            outer_tol: jnp.ndarray,
                            inner_tol: jnp.ndarray,
                            bb_stepsize: jnp.ndarray,
                            decay: jnp.ndarray,
                            outer_maxiter: int = 20,
                            inner_maxiter: int = 10000,
                            vqe_maxiter: int = 200,
                            sector=None,
                            callback=None,
                            sector_tables=None,
                            vqe_ftol: float = None):
    """Fused ADAPT-VQE OptOrb loop: (E, theta, mask, U, n_outer, trace).

    ADAPT growth runs entirely on device as masking over a fixed padded
    circuit of R slots x P pool groups (`theta` has R*P entries, unselected
    angles pinned to zero): per growth step the pool is screened by one
    backward pass (dE/dtheta of slot r at zero IS the commutator gradient),
    the argmax operator's mask bit is set, and a BFGS solve optimizes the
    unmasked angles.  Growth terminates on gradient threshold, immediate
    repeat selection (cyclicity), or energy-improvement threshold — all as
    lax control flow, so the whole OptOrb run stays one dispatch.

    The ansatz re-grows from scratch every outer iteration (reference
    OptOrbAdaptVQE.parameter_update_rule is a no-op, opt_orb_adapt_vqe.py:86-89).

    With `sector` (a SectorUCC over the padded R x P circuit), every
    screening backward pass and every BFGS evaluation runs in the
    particle-number sector against a dense sector Hamiltonian rebuilt once
    per outer iteration; the RDM extraction (sector.rdms) stays in the
    sector too, so the 2^N space is never touched.
    """
    dtype = h_sp.dtype
    run_adapt, extract_rdms = _adapt_stage_fns(
        state_fn, n_active, R, P, sector, vqe_maxiter, dtype,
        grad_tol, eig_tol, tables=sector_tables, ftol=vqe_ftol)
    vag = _ORBITAL_VAG

    def outer_cond(c):
        return jnp.logical_not(c[-1])

    def outer_body(c):
        it, theta, mask, U, E_prev, _, trace, done = c
        h_act = rotate_one_body(h_sp, U)
        g_act = rotate_two_body(g_sp, U)
        theta, mask, E = run_adapt(h_act, g_act)
        trace = trace.at[it].set(E)
        if callback is not None:
            jax.debug.callback(callback, it + 1, E, theta * mask, U, trace)

        gamma, Gamma = extract_rdms(theta * mask)
        gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
        U_new = _inner_bb(vag, U, (gamma_s, Gamma_s, h_sp, g_sp),
                          bb_stepsize, inner_tol, decay, inner_maxiter)
        converged = jnp.abs(E - E_prev) < outer_tol
        hit_max = it + 1 >= outer_maxiter
        U_out = jnp.where(converged, U, U_new)
        return (it + 1, theta, mask, U_out, E, E, trace,
                jnp.logical_or(converged, hit_max))

    trace0 = jnp.full((outer_maxiter,), jnp.nan, dtype=dtype)
    c0 = (jnp.asarray(0), jnp.zeros((R * P,), dtype=dtype),
          jnp.zeros((R * P,), dtype=dtype), orth(U0),
          jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype),
          trace0, jnp.asarray(False))
    it, theta, mask, U, _, E, trace, _ = jax.lax.while_loop(
        outer_cond, outer_body, c0)
    # re-grow at the final U so (E, theta, U) are mutually consistent
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    theta, mask, E = run_adapt(h_act, g_act)
    return E, theta * mask, mask, U, it, trace


class FusedOptOrbVQE:
    """One-dispatch OptOrbVQE (see module docstring).

    Args mirror OptOrbVQE where meaningful; the eigensolver is a built-in
    on-device BFGS over the given ansatz.
    """

    def __init__(self,
                 num_spin_orbitals: int,
                 ansatz: QuantumCircuit,
                 problem=None,
                 integral_tensors=None,
                 initial_partial_unitary=None,
                 initial_point=None,
                 maxiter: int = 20,
                 stopping_tolerance: float = 1e-5,
                 inner_stopping_tolerance: float = 1e-5,
                 inner_maxiter: int = 10000,
                 initial_BBstepsize: float = 1e-3,
                 decay_factor: float = 0.8,
                 vqe_maxiter: int = 200,
                 vqe_ftol: float = None,
                 dtype=None,
                 mesh=None,
                 simulation: str = "auto",
                 dispatch: str = "one",
                 vqe_chunk: Optional[int] = None,
                 outer_loop_callback=None,
                 checkpoint_dir=None,
                 resume_from=None,
                 diagnostics: bool = True):
        self.diagnostics = bool(diagnostics)
        from .kernels import spatial_blocks, spin_blocks_consistent
        from ..interop import adapt as _interop_adapt
        problem, _ = _interop_adapt(problem, None)

        if resume_from is not None:
            from .checkpoint import load_checkpoint
            ck = load_checkpoint(resume_from)
            initial_partial_unitary = ck["partial_unitary"]
            if "optimal_point" in ck:
                initial_point = ck["optimal_point"]
        if integral_tensors is not None:
            h_so = np.asarray(integral_tensors[0], dtype=np.float64)
            g_so = np.asarray(integral_tensors[1], dtype=np.float64)
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbVQE requires spin-block-structured integrals "
                    "(use OptOrbVQE for the general spin-orbital path)")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        elif problem is not None and hasattr(problem,
                                             "spatial_integral_tensors"):
            # never materialize the 16x-larger spin-orbital intermediate
            h_sp, g_sp = problem.spatial_integral_tensors()
        elif problem is not None:
            h_so, g_so = problem.integral_tensors()
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbVQE requires spin-block-structured integrals "
                    "(use OptOrbVQE for the general spin-orbital path)")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        else:
            raise ValueError("either `problem` or `integral_tensors` required")
        dtype = dtype or h_sp.dtype
        self._h_sp = jnp.asarray(h_sp, dtype=dtype)
        self._g_sp = jnp.asarray(g_sp, dtype=dtype)
        if mesh is not None:
            self._h_sp, self._g_sp = _place_on_mesh(mesh, self._h_sp,
                                                    self._g_sp)

        self.num_spin_orbitals = num_spin_orbitals
        self.ansatz = ansatz
        enc = getattr(ansatz, "_encoding", "jw")
        if enc != "jw":
            # the fused one-dispatch programs contract RDMs directly from
            # occupation-basis amplitudes, which only the Jordan-Wigner
            # encoding preserves — a parity/BK-mapped ansatz would yield a
            # silently wrong energy here (class solvers auto-switch to the
            # per-Pauli path instead; use those for non-JW mappers)
            raise ValueError(
                f"fused solvers require a Jordan-Wigner-encoded ansatz; "
                f"got encoding {enc!r} — use the class-based OptOrb solver "
                f"with rdm_measurement='pauli' for this mapper")
        self._compiled = compile_circuit(ansatz)
        if not self._compiled.is_real:
            raise ValueError("fused path requires a real-safe ansatz")
        if simulation not in ("full", "sector", "auto"):
            raise ValueError("simulation must be 'full', 'sector' or "
                             "'auto'")
        auto = simulation == "auto"
        simulation = _resolve_simulation(simulation, num_spin_orbitals)
        self._sector = None
        if simulation == "sector":
            # particle-number-sector fast path: requires a UCC-family
            # ansatz (it carries its excitation list) over an
            # occupation-basis initial state — validated by SectorUCC
            from ..sim.sector import SectorUCC
            try:
                self._sector = SectorUCC(ansatz, num_spin_orbitals)
            except ValueError:
                if not auto:
                    raise
                self._sector = None
                simulation = "full"
        self.simulation = simulation
        self.mesh = mesh
        # mesh-sharded sector tables: the string kernels' MA/MB operator
        # stacks are placed sharded over the mesh's orb axis so the
        # sigma/RDM GEMM batch — and its (2 q_pad, nd) T working set,
        # the HBM hog at N>=24 sectors — partitions as P/D across chips
        self._sector_tables = None
        if (mesh is not None and self._sector is not None
                and self._sector.kernel == "strings"):
            from ..parallel import shard_sector_tables
            self._sector_tables = shard_sector_tables(mesh, self._sector,
                                                      dtype)

        m = h_sp.shape[0]
        n = num_spin_orbitals // 2
        if initial_partial_unitary is None:
            U0 = np.zeros((m, n))
            U0[np.arange(n), np.arange(n)] = 1.0
        else:
            U0 = np.asarray(initial_partial_unitary)
        self._U0 = jnp.asarray(U0, dtype=dtype)
        if initial_point is None:
            initial_point = np.zeros(ansatz.num_parameters)
        self._theta0 = jnp.asarray(initial_point, dtype=dtype)

        if maxiter < 1:
            raise ValueError("maxiter must be >= 1 (the outer loop always "
                             "runs at least one eigensolver iteration)")
        self.maxiter = maxiter
        self.stopping_tolerance = stopping_tolerance
        self.inner_stopping_tolerance = inner_stopping_tolerance
        self.inner_maxiter = inner_maxiter
        self.initial_BBstepsize = initial_BBstepsize
        self.decay_factor = decay_factor
        self.vqe_maxiter = vqe_maxiter
        # eigensolver plateau-stop override (solvers/lbfgs.py `ftol`):
        # None = auto (32 ulp at f32, disabled at f64); 0.0 = pure
        # gtol/maxiter/no-move semantics (the advisor's round-4 ask)
        self.vqe_ftol = vqe_ftol
        if dispatch not in ("one", "two"):
            raise ValueError("dispatch must be 'one' or 'two'")
        self.dispatch = dispatch
        if vqe_chunk is not None:
            if dispatch != "two":
                raise ValueError("vqe_chunk requires dispatch='two' (it "
                                 "bounds the per-dispatch eigensolver work)")
            if int(vqe_chunk) < 1:
                raise ValueError("vqe_chunk must be a positive iteration "
                                 "count")
        self.vqe_chunk = vqe_chunk
        # live per-outer-iteration host callback (iteration, energy/ies),
        # fired from inside the compiled loop via jax.debug.callback —
        # async, so use it for monitoring/checkpointing, not control flow
        self.outer_loop_callback = outer_loop_callback
        self.checkpoint_dir = checkpoint_dir

    def compute_minimum_energy(self) -> FusedOptOrbResult:
        from ..utils.config import precision_mode
        dtype = self._h_sp.dtype
        mode = "fast" if jnp.finfo(dtype).bits < 64 else "high"
        with precision_mode(mode):
            if getattr(self, "dispatch", "one") == "two":
                return self._run_two_dispatch(dtype)
            return self._run(dtype)

    def _run_two_dispatch(self, dtype) -> FusedOptOrbResult:
        """Two compiled programs per outer iteration (eigensolver+RDM, then
        BB/rotation) with a host convergence check in between.

        Semantics match the one-dispatch program bit-for-bit (same stages,
        same convergence rule, same pre-rotation-U-on-convergence choice);
        the trade is ~2 dispatches per outer iteration against a much
        smaller compiled program — the workaround for the composite-program
        worker fault at H8 m=112 -> N=16 (round-2 verdict, top item).  As a
        bonus, callbacks/checkpoints run live on the host here even on
        backends without jax.debug.callback support (axon)."""
        cb = _make_program_callback(self.outer_loop_callback,
                                    self.checkpoint_dir)
        state_fn = self._compiled.state_fn
        n_active = self.num_spin_orbitals // 2
        h_sp, g_sp = self._h_sp, self._g_sp
        bb = jnp.asarray(self.initial_BBstepsize, dtype)
        inner_tol = jnp.asarray(self.inner_stopping_tolerance, dtype)
        decay = jnp.asarray(self.decay_factor, dtype)

        chunk = getattr(self, "vqe_chunk", None)
        T = getattr(self, "_sector_tables", None)   # mesh-sharded placement
        if (T is None and chunk is not None and self._sector is not None
                and self._sector.dim >= _TABLED_MIN_ND):
            # tables as device buffers, transferred ONCE and threaded into
            # every chunked dispatch as program arguments (not constants)
            T = jax.device_put(self._sector.device_tables(dtype))

        def run_chunked(theta, U):
            state, cost_args = _eig_chunk_init(state_fn, theta, U,
                                               h_sp, g_sp,
                                               sector=self._sector,
                                               sector_tables=T)
            while not bool(state.done):   # host sync bounds each dispatch
                state = _eig_chunk_advance(state_fn, state, cost_args,
                                           num_steps=int(chunk),
                                           vqe_maxiter=self.vqe_maxiter,
                                           vqe_ftol=getattr(self, "vqe_ftol",
                                                            None),
                                           sector=self._sector,
                                           sector_tables=T)
            return state

        def solve(theta, U):
            """One eigensolver+RDM stage: a single compiled program, or —
            with vqe_chunk — a host loop of bounded L-BFGS dispatches
            (each dispatch short enough for the shared worker's
            long-running-program kill, docs/PERF.md round 3)."""
            if chunk is None:
                return _eig_rdm_program(
                    state_fn, n_active, theta, U, h_sp, g_sp,
                    vqe_maxiter=self.vqe_maxiter,
                    vqe_ftol=getattr(self, "vqe_ftol", None),
                    sector=self._sector,
                    sector_tables=T)
            state = run_chunked(theta, U)
            gamma_s, Gamma_s = _rdm_only_program(state_fn, n_active,
                                                 state.x,
                                                 sector=self._sector,
                                                 sector_tables=T)
            return state.x, state.f, gamma_s, Gamma_s

        def solve_energy(theta, U):
            """Energies-only re-solve for the parity tail (no RDM work)."""
            if chunk is None:
                return _eig_only_program(state_fn, theta, U, h_sp, g_sp,
                                         vqe_maxiter=self.vqe_maxiter,
                                         vqe_ftol=getattr(self, "vqe_ftol",
                                                          None),
                                         sector=self._sector,
                                         sector_tables=T)
            state = run_chunked(theta, U)
            return state.x, state.f

        theta = self._theta0
        U = orth(self._U0)
        trace = np.full((self.maxiter,), np.nan)
        E_prev = np.inf
        it = 0
        converged = False
        while True:
            theta, E, gamma_s, Gamma_s = solve(theta, U)
            E_f = float(E)              # the one host sync per iteration
            if it < trace.shape[0]:
                trace[it] = E_f
            if cb is not None:
                cb(it + 1, E_f, np.asarray(theta), np.asarray(U), trace)
            converged = abs(E_f - E_prev) < self.stopping_tolerance
            it += 1
            if converged or it >= self.maxiter:
                break
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            E_prev = E_f
        if not converged:
            # loop ended on hit_max: rotate once more (the one-dispatch
            # body's U_new on its final iteration)
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
        # one-dispatch parity: _fused_optorb_vqe re-runs run_vqe at the
        # final U UNCONDITIONALLY (also on the converged exit, where the
        # warm restart can keep optimizing if the inner L-BFGS previously
        # stopped on hit_max/no_move rather than gtol); energies-only —
        # the tail's RDMs are never consumed
        theta, E = solve_energy(theta, U)
        E_f = float(E)
        return _attach_vqe_diagnostics(FusedOptOrbResult(
            eigenvalue=E_f,
            optimal_point=np.asarray(theta),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace[:it]],
            outer_iterations=it,
            optimal_circuit=self.ansatz,
        ), self, theta)

    def _run(self, dtype) -> FusedOptOrbResult:
        live_cb, post_cb = _cached_callbacks(self)
        E, theta, U, it, trace = _fused_optorb_vqe(
            self._compiled.state_fn,
            self.num_spin_orbitals // 2,
            self._theta0, self._U0, self._h_sp, self._g_sp,
            jnp.asarray(self.stopping_tolerance, dtype),
            jnp.asarray(self.inner_stopping_tolerance, dtype),
            jnp.asarray(self.initial_BBstepsize, dtype),
            jnp.asarray(self.decay_factor, dtype),
            outer_maxiter=self.maxiter,
            inner_maxiter=self.inner_maxiter,
            vqe_maxiter=self.vqe_maxiter,
            vqe_ftol=getattr(self, "vqe_ftol", None),
            sector=self._sector,
            callback=live_cb,
            sector_tables=getattr(self, "_sector_tables", None),
        )
        it = int(it)
        if post_cb is not None:
            post_cb(it, E, theta, U, trace)
        trace = np.asarray(trace)[:it]
        return _attach_vqe_diagnostics(FusedOptOrbResult(
            eigenvalue=float(E),
            optimal_point=np.asarray(theta),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace],
            outer_iterations=it,
            optimal_circuit=self.ansatz,
        ), self, theta)


class FusedOptOrbAdaptVQE(FusedOptOrbVQE):
    """One-dispatch ADAPT-VQE OptOrb loop.

    The ansatz template must be built by sim.ansatz.UCC/UCCSD (carrying its
    excitation pool); growth happens on device as masking over a padded
    R-slot x P-pool circuit (see _fused_optorb_adapt_vqe).  Completes the
    FusedOptOrb* family (round-1 verdict item 7).

    Args beyond FusedOptOrbVQE:
        gradient_threshold / eigenvalue_threshold: ADAPT termination.
        max_adapt_iterations: growth-slot count R (default: pool size).
    """

    def __init__(self, num_spin_orbitals: int, ansatz: QuantumCircuit,
                 gradient_threshold: float = 1e-5,
                 eigenvalue_threshold: float = 1e-5,
                 max_adapt_iterations: Optional[int] = None,
                 **kwargs):
        if kwargs.get("vqe_chunk") is not None:
            raise ValueError("vqe_chunk is not supported by "
                             "FusedOptOrbAdaptVQE (the ADAPT growth loop "
                             "is one program; use FusedOptOrbVQE for "
                             "chunked eigensolver dispatches)")
        pool = getattr(ansatz, "_ucc_pool", None)
        if pool is None:
            raise ValueError(
                "FusedOptOrbAdaptVQE requires an ansatz built by "
                "sim.ansatz.UCC/UCCSD (carrying its excitation pool)")
        initial = getattr(ansatz, "_ucc_initial_state", None)
        self._P = len(pool)
        self._R = min(max_adapt_iterations or self._P, self._P)
        padded = (initial.copy() if initial is not None
                  else QuantumCircuit(num_spin_orbitals))
        if padded.num_parameters:
            raise ValueError(
                "AdaptVQE initial state must be parameter-free")
        from ..solvers.adapt_vqe import _append_group
        for _ in range(self._R):
            for group in pool:
                _append_group(padded, group)
        # the padded circuit is itself a UCC-family circuit (pool groups
        # repeated R times, parameter k <-> excitation k) — carry the
        # metadata so simulation='sector' can compile it via SectorUCC
        excs = getattr(ansatz, "_ucc_excitations", None)
        if excs is not None and len(excs) == self._P:
            padded._ucc_excitations = list(excs) * self._R
            padded._ucc_initial_state = initial
        super().__init__(num_spin_orbitals, padded, **kwargs)
        self.gradient_threshold = gradient_threshold
        self.eigenvalue_threshold = eigenvalue_threshold

    def _run_two_dispatch(self, dtype) -> FusedOptOrbResult:
        """Two compiled programs per outer iteration: ADAPT growth + RDMs,
        then BB/rotation (same split as FusedOptOrbVQE dispatch='two')."""
        cb = _make_program_callback(self.outer_loop_callback,
                                    self.checkpoint_dir)
        state_fn = self._compiled.state_fn
        n_active = self.num_spin_orbitals // 2
        h_sp, g_sp = self._h_sp, self._g_sp
        bb = jnp.asarray(self.initial_BBstepsize, dtype)
        inner_tol = jnp.asarray(self.inner_stopping_tolerance, dtype)
        decay = jnp.asarray(self.decay_factor, dtype)
        grad_tol = jnp.asarray(self.gradient_threshold, dtype)
        eig_tol = jnp.asarray(self.eigenvalue_threshold, dtype)

        def program_a(U):
            return _adapt_eig_rdm_program(
                state_fn, n_active, self._R, self._P, U, h_sp, g_sp,
                grad_tol, eig_tol, vqe_maxiter=self.vqe_maxiter,
                vqe_ftol=getattr(self, "vqe_ftol", None),
                sector=self._sector,
                sector_tables=getattr(self, "_sector_tables", None))

        U = orth(self._U0)
        trace = np.full((self.maxiter,), np.nan)
        E_prev = np.inf
        it = 0
        converged = False
        while True:
            theta, mask, E, gamma_s, Gamma_s = program_a(U)
            E_f = float(E)
            if it < trace.shape[0]:
                trace[it] = E_f
            if cb is not None:
                cb(it + 1, E_f, np.asarray(theta * mask), np.asarray(U),
                   trace)
            converged = abs(E_f - E_prev) < self.stopping_tolerance
            it += 1
            if converged or it >= self.maxiter:
                break
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            E_prev = E_f
        if not converged:
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            theta, mask, E, _, _ = program_a(U)
            E_f = float(E)
        result = FusedOptOrbResult(
            eigenvalue=E_f,
            optimal_point=np.asarray(theta * mask),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace[:it]],
            outer_iterations=it,
            optimal_circuit=self.ansatz,
        )
        result.selection_mask = np.asarray(mask)
        return _attach_vqe_diagnostics(result, self, theta * mask)

    def _run(self, dtype) -> FusedOptOrbResult:
        live_cb, post_cb = _cached_callbacks(self)
        E, theta, mask, U, it, trace = _fused_optorb_adapt_vqe(
            self._compiled.state_fn,
            self.num_spin_orbitals // 2,
            self._R, self._P,
            self._U0, self._h_sp, self._g_sp,
            jnp.asarray(self.gradient_threshold, dtype),
            jnp.asarray(self.eigenvalue_threshold, dtype),
            jnp.asarray(self.stopping_tolerance, dtype),
            jnp.asarray(self.inner_stopping_tolerance, dtype),
            jnp.asarray(self.initial_BBstepsize, dtype),
            jnp.asarray(self.decay_factor, dtype),
            outer_maxiter=self.maxiter,
            inner_maxiter=self.inner_maxiter,
            vqe_maxiter=self.vqe_maxiter,
            vqe_ftol=getattr(self, "vqe_ftol", None),
            sector=self._sector,
            callback=live_cb,
            sector_tables=getattr(self, "_sector_tables", None),
        )
        it = int(it)
        if post_cb is not None:
            post_cb(it, E, theta * mask, U, trace)
        trace = np.asarray(trace)[:it]
        result = FusedOptOrbResult(
            eigenvalue=float(E),
            optimal_point=np.asarray(theta),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace],
            outer_iterations=it,
            optimal_circuit=self.ansatz,
        )
        result.selection_mask = np.asarray(mask)
        return _attach_vqe_diagnostics(result, self, theta * mask)
