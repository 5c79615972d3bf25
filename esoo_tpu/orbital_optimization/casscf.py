"""FusedOptOrbCASSCF — orbital optimization around EXACT active-space
diagonalization (classical CASSCF, TPU-native).

The OptOrb outer loop is eigensolver-agnostic: it alternates "solve the
active-space eigenproblem at U" with "BB/Stiefel-descend U at fixed
RDMs" (reference opt_orb_minimum_eigensolver.py:150-214).  Every
reference solver plugs a *variational quantum* eigensolver into that
slot; this class plugs in the exact lowest eigenpair of the sector
Hamiltonian, computed by a fixed-shape Davidson iteration on the
string-CI sigma kernels (sim/strings.py, solvers/davidson.py):

  * No ansatz, no parameters, no K-gate scan — the eigensolver stage is
    ~tens of sigma GEMM applications, warm-started across outer
    iterations from the previous eigenvector.
  * Energies are variationally exact in the active space: the upper
    baseline every OptOrbVQE/AdaptVQE configuration converges toward
    (for two-electron systems UCCSD is exact, so FusedOptOrbVQE and this
    class agree to optimizer tolerance — tested).
  * The result is the classical two-step CASSCF method, built from the
    same TPU kernels as the quantum solvers: rotations are MXU GEMM
    chains, the sigma algorithm is batched GEMMs, RDMs are
    pair-correlation GEMMs, and `mesh=` shards both the m^4 integral
    tensor (last-axis, parallel/sharded.py) and the sigma operator
    batch (parallel.shard_sector_tables).

No reference counterpart (the reference has no exact eigensolver in the
loop; its FCI machinery only *initializes* states,
configuration_interaction_states.py) — this is a beyond-parity
capability that exists because the sector kernels made H·v cheap.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.sector import SectorCI
from ..solvers.davidson import davidson_ground
from .fused import (FusedOptOrbResult, _ORBITAL_VAG, _TABLED_MIN_ND,
                    _cached_callbacks, _inner_bb, _make_program_callback,
                    _orb_program, _place_on_mesh)
from .kernels import (expand_spin_tensors, rotate_one_body,
                      rotate_two_body, spatial_blocks,
                      spin_blocks_consistent, spin_reduce_rdms,
                      spin_squared_from_rdms)
from .stiefel import orth


_SECTOR_CI_CACHE = {}

_COMPACT_MIN_ND = 1_100_000   # 'auto' -> int8-chunked stacks past this

# Past this many determinants the k-state block matvec/RDM extraction
# runs sequentially (lax.map) even with DENSE tables: vmap materializes
# k copies of the (q, nd) T working set, and the measured single-state
# headroom at N=28 (nd=1.0M, dense ground completes in 13.2 s warm)
# vanishes at k=3 (OOMs the 16 GB v5e).  N=24 (nd=245k) keeps vmap.
_SEQ_MV_MIN_ND = 500_000


def _sa_sequential(sector: SectorCI, k: int, tables) -> bool:
    """Sequential (lax.map) vs batched (vmap) state processing for the
    state-averaged eigensolver/RDM stages — sequential whenever the
    compact int8 tables are in play (one state's working set is already
    HBM-scale) or the dense sector is big enough that k live T tensors
    would not fit (see _SEQ_MV_MIN_ND)."""
    compact = tables is not None and "MA8" in tables
    return compact or (k > 1 and sector.nB * sector.nA >= _SEQ_MV_MIN_ND)


def _sector_ci_cached(num_spin_orbitals: int,
                      num_particles: Tuple[int, int]) -> SectorCI:
    """SectorCI instances keyed (N, particles): construction is pure in
    the key, and the host table build is minutes at the million-
    determinant shapes (H8 N=28) — pay it once per process, not per
    solver instance."""
    key = (int(num_spin_orbitals), tuple(int(p) for p in num_particles))
    hit = _SECTOR_CI_CACHE.get(key)
    if hit is None:
        hit = _SECTOR_CI_CACHE[key] = SectorCI(*key)
    return hit


def _casscf_stage_fns(sector: SectorCI, max_subspace, davidson_maxiter,
                      dtype, tables=None):
    """(solve, extract_rdms): exact eigensolver stage at rotated
    integrals, shared by the one- and two-dispatch programs."""
    tol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-6
    nB, nA = sector.nB, sector.nA

    def solve(v_warm, h_act, g_act):
        h_so, g_so = expand_spin_tensors(h_act, g_act)
        vals = sector.build_values(h_so, g_so, tables=tables)
        diag = sector.diagonal_values(vals, tables=tables).reshape(-1)

        def mv(x):
            return sector.sigma_values(x.reshape(nB, nA), vals,
                                       tables=tables).reshape(-1)

        res = davidson_ground(mv, diag, v_warm,
                              max_subspace=max_subspace,
                              maxiter=davidson_maxiter, tol=tol)
        return res.eigenvector, res.eigenvalue

    def extract_rdms(v):
        return sector.rdms(v.reshape(nB, nA), tables=tables)

    return solve, extract_rdms


@partial(jax.jit, static_argnames=(
    "sector", "outer_maxiter", "inner_maxiter", "max_subspace",
    "davidson_maxiter", "callback"))
def _fused_optorb_casscf(sector: SectorCI,
                         v0: jnp.ndarray,
                         U0: jnp.ndarray,
                         h_sp: jnp.ndarray,
                         g_sp: jnp.ndarray,
                         outer_tol: jnp.ndarray,
                         inner_tol: jnp.ndarray,
                         bb_stepsize: jnp.ndarray,
                         decay: jnp.ndarray,
                         outer_maxiter: int = 20,
                         inner_maxiter: int = 10000,
                         max_subspace: int = 16,
                         davidson_maxiter: int = 200,
                         callback=None,
                         sector_tables=None):
    """One-dispatch CASSCF loop: (E, v, U, n_outer, trace).  Same outer
    semantics as _fused_optorb_vqe (convergence rule, pre-rotation-U on
    convergence, unconditional final re-solve) with the eigensolver
    stage replaced by warm-started exact Davidson diagonalization."""
    solve, extract_rdms = _casscf_stage_fns(
        sector, max_subspace, davidson_maxiter, h_sp.dtype,
        tables=sector_tables)
    vag = _ORBITAL_VAG

    def outer_cond(c):
        return jnp.logical_not(c[-1])

    def outer_body(c):
        it, v, U, E_prev, _, trace, done = c
        h_act = rotate_one_body(h_sp, U)
        g_act = rotate_two_body(g_sp, U)
        v, E = solve(v, h_act, g_act)
        trace = trace.at[it].set(E)
        if callback is not None:
            jax.debug.callback(callback, it + 1, E, v, U, trace)

        gamma, Gamma = extract_rdms(v)
        gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
        U_new = _inner_bb(vag, U, (gamma_s, Gamma_s, h_sp, g_sp),
                          bb_stepsize, inner_tol, decay, inner_maxiter)
        converged = jnp.abs(E - E_prev) < outer_tol
        hit_max = it + 1 >= outer_maxiter
        U_out = jnp.where(converged, U, U_new)
        return (it + 1, v, U_out, E, E, trace,
                jnp.logical_or(converged, hit_max))

    trace0 = jnp.full((outer_maxiter,), jnp.nan, dtype=h_sp.dtype)
    c0 = (jnp.asarray(0), v0, orth(U0),
          jnp.asarray(jnp.inf, h_sp.dtype), jnp.asarray(0.0, h_sp.dtype),
          trace0, jnp.asarray(False))
    it, v, U, _, E, trace, done = jax.lax.while_loop(
        outer_cond, outer_body, c0)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    v, E = solve(v, h_act, g_act)
    return E, v, U, it, trace


@partial(jax.jit, static_argnames=(
    "sector", "max_subspace", "davidson_maxiter"))
def _casscf_eig_rdm_program(sector: SectorCI,
                            v_warm: jnp.ndarray,
                            U: jnp.ndarray,
                            h_sp: jnp.ndarray,
                            g_sp: jnp.ndarray,
                            max_subspace: int = 16,
                            davidson_maxiter: int = 200,
                            sector_tables=None):
    """Two-dispatch program A: rotate, exact-diagonalize, RDMs."""
    solve, extract_rdms = _casscf_stage_fns(
        sector, max_subspace, davidson_maxiter, h_sp.dtype,
        tables=sector_tables)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    v, E = solve(v_warm, h_act, g_act)
    gamma, Gamma = extract_rdms(v)
    gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
    return v, E, gamma_s, Gamma_s


@partial(jax.jit, static_argnames=("sector",))
def _states_diagnostics(sector: SectorCI, V: jnp.ndarray,
                        sector_tables=None):
    """Per-state (natural occupations (k, n), <S^2> (k,)) of a (k, nd)
    eigenvector block — sequential over states (one state's RDM working
    set is HBM-scale under compact tables)."""
    def one(v):
        gamma, Gamma = sector.rdms(v.reshape(sector.nB, sector.nA),
                                   tables=sector_tables)
        gamma_s, _ = spin_reduce_rdms(gamma, Gamma)
        n = gamma.shape[0] // 2
        spin_dens = gamma[:n, :n] - gamma[n:, n:]
        return (jnp.linalg.eigvalsh(gamma_s)[::-1],
                spin_squared_from_rdms(gamma, Gamma),
                gamma_s, spin_dens)

    return jax.lax.map(one, V)


@partial(jax.jit, static_argnames=("sector",))
def _transition_rdm1s(sector: SectorCI, V: jnp.ndarray,
                      sector_tables=None):
    """(k, k, n, n) spin-summed spatial transition 1-RDMs
    t[i, j, p, s] = <psi_i|E_ps|psi_j> over the active orbitals — the
    one-body inputs to transition dipoles / oscillator strengths
    (chem.properties.transition_dipoles).  Sequential over ket states
    (one T working set live, as in _states_diagnostics); each ket is
    contracted against the whole bra stack in one batched build."""
    Vg = V.reshape(-1, sector.nB, sector.nA)

    def one(vj):
        g = sector.transition_rdm1(Vg, vj, tables=sector_tables)
        n = g.shape[-1] // 2
        return g[:, :n, :n] + g[:, n:, n:]

    t = jax.lax.map(one, Vg)          # t[j, i] = <i|E|j>
    return jnp.swapaxes(t, 0, 1)


@partial(jax.jit, static_argnames=("sector",))
def _state_diagnostics(sector: SectorCI, v: jnp.ndarray,
                       sector_tables=None):
    """(natural occupations, <S^2>) of a sector vector — the standard
    CASSCF wavefunction diagnostics: descending eigenvalues of the
    spin-summed spatial 1-RDM (sum = n_alpha + n_beta), and the total
    spin expectation (spin_squared_from_rdms)."""
    gamma, Gamma = sector.rdms(v.reshape(sector.nB, sector.nA),
                               tables=sector_tables)
    gamma_s, _ = spin_reduce_rdms(gamma, Gamma)
    n = gamma.shape[0] // 2
    return (jnp.linalg.eigvalsh(gamma_s)[::-1],
            spin_squared_from_rdms(gamma, Gamma),
            gamma_s, gamma[:n, :n] - gamma[n:, n:])


class FusedOptOrbCASSCF:
    """Orbital-optimized exact active-space diagonalization (CASSCF) as
    one (or two, `dispatch='two'`) compiled XLA program(s).

    Args mirror FusedOptOrbVQE minus the ansatz/eigensolver knobs:
        num_spin_orbitals: active-space size N (n = N/2 spatial).
        num_particles: (n_alpha, n_beta); default: from `problem`.
        max_subspace / davidson_maxiter: Davidson search parameters.
        davidson_chunk: with dispatch='two', advance the eigensolver at
            most this many iterations per compiled dispatch (host loop
            reads the on-device stop flag between dispatches) — the
            vqe_chunk analogue for execution-time-limited workers
            (the ground solver runs the k=1 block machinery when
            chunked).
        davidson_tol_ladder: (opt-in, needs davidson_chunk) run the
            intermediate outer iterations' Davidson solves at 30x the
            final tolerance — they only feed RDMs to the BB rotation,
            and the eigenvalue error of a residual-tol-eps solve is
            O(eps^2/gap), far under the outer stopping tolerance.  The
            final re-solve always runs tight, so the returned energies
            keep full precision.  Measured on the H8 m=112 -> N=32 SA
            k=3 flagship: the loop spends ~91% of wall in Davidson
            advances, so the ladder is the main lever there.
        table_storage: 'dense' (f32/f64 operator stacks), 'compact'
            (int8 stacks; single-chip: operator-chunked kernels — the
            HBM path past ~1M determinants; with mesh=: int8 stacks
            sharded over the operator axis, cast per shard, so the
            float working set drops as 1/D), or 'auto' (compact
            beyond nd > 1.1M, dense below — with or without a mesh).
    Result fields follow FusedOptOrbResult; `optimal_point` holds the
    exact sector eigenvector (flat, C(n,na)*C(n,nb) amplitudes).
    """

    def __init__(self,
                 num_spin_orbitals: int,
                 problem=None,
                 integral_tensors=None,
                 num_particles: Optional[Tuple[int, int]] = None,
                 initial_partial_unitary=None,
                 maxiter: int = 20,
                 stopping_tolerance: float = 1e-5,
                 inner_stopping_tolerance: float = 1e-5,
                 inner_maxiter: int = 10000,
                 initial_BBstepsize: float = 1e-3,
                 decay_factor: float = 0.8,
                 max_subspace: int = 16,
                 davidson_maxiter: int = 200,
                 davidson_chunk: Optional[int] = None,
                 davidson_tol_ladder: bool = False,
                 dtype=None,
                 mesh=None,
                 dispatch: str = "one",
                 table_storage: str = "auto",
                 outer_loop_callback=None,
                 checkpoint_dir=None,
                 resume_from=None):
        from ..interop import adapt as _interop_adapt
        problem, _ = _interop_adapt(problem, None)

        if table_storage not in ("auto", "dense", "compact"):
            raise ValueError(
                "table_storage must be 'auto', 'dense', or 'compact'")

        if num_particles is None:
            if problem is None or not hasattr(problem, "num_particles"):
                raise ValueError(
                    "num_particles is required when no problem carrying "
                    "it is given")
            num_particles = tuple(problem.num_particles)

        if integral_tensors is not None:
            h_so = np.asarray(integral_tensors[0], dtype=np.float64)
            g_so = np.asarray(integral_tensors[1], dtype=np.float64)
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbCASSCF requires spin-block-structured "
                    "integrals")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        elif problem is not None and hasattr(problem,
                                             "spatial_integral_tensors"):
            h_sp, g_sp = problem.spatial_integral_tensors()
        elif problem is not None:
            h_so, g_so = problem.integral_tensors()
            if not spin_blocks_consistent(h_so, g_so):
                raise ValueError(
                    "FusedOptOrbCASSCF requires spin-block-structured "
                    "integrals")
            h_sp, g_sp = spatial_blocks(h_so, g_so)
        else:
            raise ValueError(
                "either `problem` or `integral_tensors` required")
        dtype = dtype or h_sp.dtype
        self._h_sp = jnp.asarray(h_sp, dtype=dtype)
        self._g_sp = jnp.asarray(g_sp, dtype=dtype)
        self.mesh = mesh
        if mesh is not None:
            self._h_sp, self._g_sp = _place_on_mesh(mesh, self._h_sp,
                                                    self._g_sp)

        self.num_spin_orbitals = num_spin_orbitals
        self._sector = _sector_ci_cached(num_spin_orbitals,
                                         tuple(num_particles))
        self._sector_tables = None
        if mesh is not None:
            from ..parallel import shard_sector_tables
            storage = table_storage
            if storage == "auto":
                storage = ("compact"
                           if self._sector.dim > _COMPACT_MIN_ND
                           else "dense")
            # mesh x compact composition: int8 stacks sharded over the
            # operator axis under the dense kernel keys — each device
            # casts only its shard, so the float working set drops as
            # 1/D on top of the int8 transport (round-3 verdict item 3)
            self.table_storage = ("sharded" if storage == "dense"
                                  else "sharded-compact")
            self._sector_tables = shard_sector_tables(mesh, self._sector,
                                                      dtype,
                                                      storage=storage)
        else:
            storage = table_storage
            if storage == "auto":
                # int8-chunked kernels only past the proven dense-path
                # sizes (N=28 nd=1,002,001 keeps its measured path; the
                # dense working set at N=32 nd=3.31M exceeds one v5e's
                # 16 GB HBM, so compact is the only single-chip option)
                storage = ("compact"
                           if self._sector.dim > _COMPACT_MIN_ND
                           else "dense")
            self.table_storage = storage
            if (storage == "compact"
                    or self._sector.dim >= _TABLED_MIN_ND):
                # large sectors: the MA/MB operator stacks as program
                # ARGUMENTS (device buffers, transferred once) — baked
                # constants at this size break the remote-compile
                # transport (the documented ~630 MB failure class,
                # CLAUDE.md).  The device buffers are cached on the
                # (cached) SectorCI so a second solver instance
                # re-transfers nothing (measured at H8 N=28: the 1.6 GB
                # stacks dominate the warm wall)
                cache = getattr(self._sector, "_dev_put_cache", None)
                if cache is None:
                    cache = self._sector._dev_put_cache = {}
                key = (np.dtype(dtype).name, storage)
                if key not in cache:
                    cache[key] = jax.device_put(
                        self._sector.device_tables(dtype,
                                                   storage=storage))
                self._sector_tables = cache[key]

        if resume_from is not None:
            from .checkpoint import load_checkpoint
            ck = load_checkpoint(resume_from)
            initial_partial_unitary = ck["partial_unitary"]
            if ("optimal_point" in ck and np.asarray(
                    ck["optimal_point"]).size == self._sector.dim):
                self._v0 = jnp.asarray(ck["optimal_point"], dtype=dtype)
            else:
                self._v0 = self._sector.hf_matrix(dtype).reshape(-1)
        else:
            self._v0 = self._sector.hf_matrix(dtype).reshape(-1)

        m = h_sp.shape[0]
        n = num_spin_orbitals // 2
        if initial_partial_unitary is None:
            U0 = np.zeros((m, n))
            U0[np.arange(n), np.arange(n)] = 1.0
        else:
            U0 = np.asarray(initial_partial_unitary)
        self._U0 = jnp.asarray(U0, dtype=dtype)

        if maxiter < 1:
            raise ValueError("maxiter must be >= 1")
        self.maxiter = maxiter
        self.stopping_tolerance = stopping_tolerance
        self.inner_stopping_tolerance = inner_stopping_tolerance
        self.inner_maxiter = inner_maxiter
        self.initial_BBstepsize = initial_BBstepsize
        self.decay_factor = decay_factor
        self.max_subspace = max_subspace
        self.davidson_maxiter = davidson_maxiter
        if dispatch not in ("one", "two"):
            raise ValueError("dispatch must be 'one' or 'two'")
        if davidson_chunk is not None:
            if dispatch != "two":
                raise ValueError(
                    "davidson_chunk requires dispatch='two' (it bounds "
                    "the per-dispatch eigensolver iterations with a "
                    "host-side loop)")
            if int(davidson_chunk) < 1:
                raise ValueError("davidson_chunk must be >= 1")
            davidson_chunk = int(davidson_chunk)
        self.davidson_chunk = davidson_chunk
        if davidson_tol_ladder and davidson_chunk is None:
            raise ValueError(
                "davidson_tol_ladder requires davidson_chunk (it ladders "
                "the tolerance across the bounded advance dispatches)")
        self.davidson_tol_ladder = bool(davidson_tol_ladder)
        self.dispatch = dispatch
        self.outer_loop_callback = outer_loop_callback
        self.checkpoint_dir = checkpoint_dir

    def compute_minimum_energy(self) -> FusedOptOrbResult:
        from ..utils.config import precision_mode
        dtype = self._h_sp.dtype
        mode = "fast" if jnp.finfo(dtype).bits < 64 else "high"
        with precision_mode(mode):
            if self.dispatch == "two":
                return self._run_two_dispatch(dtype)
            return self._run(dtype)

    def _run(self, dtype) -> FusedOptOrbResult:
        live_cb, post_cb = _cached_callbacks(self)
        E, v, U, it, trace = _fused_optorb_casscf(
            self._sector, self._v0, self._U0, self._h_sp, self._g_sp,
            jnp.asarray(self.stopping_tolerance, dtype),
            jnp.asarray(self.inner_stopping_tolerance, dtype),
            jnp.asarray(self.initial_BBstepsize, dtype),
            jnp.asarray(self.decay_factor, dtype),
            outer_maxiter=self.maxiter,
            inner_maxiter=self.inner_maxiter,
            max_subspace=self.max_subspace,
            davidson_maxiter=self.davidson_maxiter,
            callback=live_cb,
            sector_tables=self._sector_tables,
        )
        it = int(it)
        if post_cb is not None:
            post_cb(it, E, v, U, trace)
        trace = np.asarray(trace)[:it]
        occ, s2, g1, sd = _state_diagnostics(
            self._sector, jnp.asarray(v),
            sector_tables=self._sector_tables)
        return FusedOptOrbResult(
            eigenvalue=float(E),
            optimal_point=np.asarray(v),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace],
            outer_iterations=it,
            optimal_circuit=None,
            natural_occupations=np.asarray(occ),
            spin_squared=float(s2),
            one_rdm_spatial=np.asarray(g1),
            spin_density_spatial=np.asarray(sd),
        )

    def _run_two_dispatch(self, dtype) -> FusedOptOrbResult:
        """Eigensolver+RDM program and BB/rotation program per outer
        iteration, host convergence check — identical semantics to the
        one-dispatch loop (cf. FusedOptOrbVQE dispatch='two')."""
        cb = _make_program_callback(self.outer_loop_callback,
                                    self.checkpoint_dir)
        h_sp, g_sp = self._h_sp, self._g_sp
        bb = jnp.asarray(self.initial_BBstepsize, dtype)
        inner_tol = jnp.asarray(self.inner_stopping_tolerance, dtype)
        decay = jnp.asarray(self.decay_factor, dtype)

        tabs = self._sector_tables
        compact = tabs is not None and "MA8" in tabs
        dav_tol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-6
        # tolerance ladder (opt-in): intermediate outer iterations only
        # feed RDMs to the BB rotation, so their Davidson solves run at
        # 30x the final tolerance (eigenvalue error ~ rn^2/gap stays far
        # below the outer stopping tolerance); the authoritative final
        # re-solve always runs at dav_tol.  tol is a TRACED scalar in
        # the chunked programs, so the ladder adds zero recompiles.
        loose_tol = dav_tol * 30.0 if self.davidson_tol_ladder else dav_tol
        chunk = self.davidson_chunk
        w1 = jnp.ones((1,), dtype)

        def solve(v, U, tight=False):
            tol_i = dav_tol if tight else loose_tol
            if chunk is None:
                return _casscf_eig_rdm_program(
                    self._sector, v, U, h_sp, g_sp,
                    max_subspace=self.max_subspace,
                    davidson_maxiter=self.davidson_maxiter,
                    sector_tables=tabs)
            # bounded eigensolver dispatches (cf. the SA path): the
            # block machinery with k=1 plays the role of
            # davidson_ground, chunked across dispatches
            state, vals, diag = _sa_davidson_init_program(
                self._sector, 1, jnp.asarray(v).reshape(1, -1), U,
                h_sp, g_sp, max_subspace=self.max_subspace,
                tol=tol_i, sequential_mv=compact, sector_tables=tabs)
            while (not bool(np.asarray(state[-1]))
                   and int(np.asarray(state[3])) < self.davidson_maxiter):
                state = _sa_davidson_advance_program(
                    self._sector, state, vals, diag, iters=chunk,
                    tol=tol_i, sequential_mv=compact,
                    sector_tables=tabs)
            V, es, gamma_s, Gamma_s = _sa_finish_rdm_program(
                self._sector, w1, state, vals, diag, tol=tol_i,
                sequential_mv=compact, sector_tables=tabs)
            return V[0], es[0], gamma_s, Gamma_s

        v = self._v0
        U = orth(self._U0)
        trace = np.full((self.maxiter,), np.nan)
        E_prev = np.inf
        it = 0
        converged = False
        while True:
            v, E, gamma_s, Gamma_s = solve(v, U)
            E_f = float(E)
            if it < trace.shape[0]:
                trace[it] = E_f
            if cb is not None:
                cb(it + 1, E_f, np.asarray(v), np.asarray(U), trace)
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
        # one-dispatch parity tail: re-solve at the final U (always at
        # the tight tolerance — the ladder only loosens loop solves)
        v, E, _, _ = solve(v, U, tight=True)
        occ, s2, g1, sd = _state_diagnostics(
            self._sector, jnp.asarray(v),
            sector_tables=self._sector_tables)
        return FusedOptOrbResult(
            eigenvalue=float(E),
            optimal_point=np.asarray(v),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace[:it]],
            outer_iterations=it,
            optimal_circuit=None,
            natural_occupations=np.asarray(occ),
            spin_squared=float(s2),
            one_rdm_spatial=np.asarray(g1),
            spin_density_spatial=np.asarray(sd),
        )


def _sa_casscf_stage_fns(sector: SectorCI, k, weights, max_subspace,
                         davidson_maxiter, dtype, tables=None):
    """(solve, extract_rdms) for the state-averaged eigensolver stage:
    lowest-k block Davidson + weight-combined RDMs."""
    from ..solvers.davidson import davidson_block
    tol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-6
    nB, nA = sector.nB, sector.nA
    # compact int8 tables (one matvec's T half is HBM-scale) or a large
    # dense sector (k live T tensors under vmap): run the k-vector block
    # matvec and the per-state RDMs sequentially (lax.map) instead of
    # batched (vmap) — identical results, k-fold smaller transients
    compact = _sa_sequential(sector, k, tables)

    def solve(V_warm, h_act, g_act):
        h_so, g_so = expand_spin_tensors(h_act, g_act)
        vals = sector.build_values(h_so, g_so, tables=tables)
        diag = sector.diagonal_values(vals, tables=tables).reshape(-1)

        def mv(x):
            return sector.sigma_values(x.reshape(nB, nA), vals,
                                       tables=tables).reshape(-1)

        res = davidson_block(mv, diag, V_warm, k=k,
                             max_subspace=max_subspace,
                             maxiter=davidson_maxiter, tol=tol,
                             sequential_mv=compact)
        return res.eigenvectors, res.eigenvalues

    def extract_rdms(V):
        state_rdms = lambda v: sector.rdms(v.reshape(nB, nA),
                                           tables=tables)
        if compact:
            gammas, Gammas = jax.lax.map(state_rdms, V)
        else:
            gammas, Gammas = jax.vmap(state_rdms)(V)
        return (jnp.tensordot(weights, gammas, axes=1),
                jnp.tensordot(weights, Gammas, axes=1))

    return solve, extract_rdms


@partial(jax.jit, static_argnames=(
    "sector", "k", "outer_maxiter", "inner_maxiter", "max_subspace",
    "davidson_maxiter", "callback"))
def _fused_optorb_sa_casscf(sector: SectorCI,
                            k: int,
                            weights: jnp.ndarray,
                            V0: jnp.ndarray,
                            U0: jnp.ndarray,
                            h_sp: jnp.ndarray,
                            g_sp: jnp.ndarray,
                            outer_tol: jnp.ndarray,
                            inner_tol: jnp.ndarray,
                            bb_stepsize: jnp.ndarray,
                            decay: jnp.ndarray,
                            outer_maxiter: int = 20,
                            inner_maxiter: int = 10000,
                            max_subspace: int = 24,
                            davidson_maxiter: int = 200,
                            callback=None,
                            sector_tables=None):
    """One-dispatch state-averaged CASSCF loop:
    (energies, V, U, n_outer, trace); convergence on the weighted sum
    (the OptOrbEigensolver rule, reference opt_orb_eigensolver.py)."""
    solve, extract_rdms = _sa_casscf_stage_fns(
        sector, k, weights, max_subspace, davidson_maxiter, h_sp.dtype,
        tables=sector_tables)
    vag = _ORBITAL_VAG

    def outer_cond(c):
        return jnp.logical_not(c[-1])

    def outer_body(c):
        it, V, U, E_prev, _, trace, done = c
        h_act = rotate_one_body(h_sp, U)
        g_act = rotate_two_body(g_sp, U)
        V, es = solve(V, h_act, g_act)
        Ew = jnp.dot(weights, es)
        trace = trace.at[it].set(Ew)
        if callback is not None:
            jax.debug.callback(callback, it + 1, es, V, U, trace)

        gamma, Gamma = extract_rdms(V)
        gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
        U_new = _inner_bb(vag, U, (gamma_s, Gamma_s, h_sp, g_sp),
                          bb_stepsize, inner_tol, decay, inner_maxiter)
        converged = jnp.abs(Ew - E_prev) < outer_tol
        hit_max = it + 1 >= outer_maxiter
        U_out = jnp.where(converged, U, U_new)
        return (it + 1, V, U_out, Ew, Ew, trace,
                jnp.logical_or(converged, hit_max))

    trace0 = jnp.full((outer_maxiter,), jnp.nan, dtype=h_sp.dtype)
    c0 = (jnp.asarray(0), V0, orth(U0),
          jnp.asarray(jnp.inf, h_sp.dtype), jnp.asarray(0.0, h_sp.dtype),
          trace0, jnp.asarray(False))
    it, V, U, _, Ew, trace, done = jax.lax.while_loop(
        outer_cond, outer_body, c0)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    V, es = solve(V, h_act, g_act)
    return es, V, U, it, trace


@partial(jax.jit, static_argnames=(
    "sector", "k", "max_subspace", "davidson_maxiter"))
def _sa_casscf_eig_rdm_program(sector: SectorCI,
                               k: int,
                               weights: jnp.ndarray,
                               V_warm: jnp.ndarray,
                               U: jnp.ndarray,
                               h_sp: jnp.ndarray,
                               g_sp: jnp.ndarray,
                               max_subspace: int = 24,
                               davidson_maxiter: int = 200,
                               sector_tables=None):
    """Two-dispatch program A: rotate, block-diagonalize, weighted RDMs."""
    solve, extract_rdms = _sa_casscf_stage_fns(
        sector, k, weights, max_subspace, davidson_maxiter, h_sp.dtype,
        tables=sector_tables)
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    V, es = solve(V_warm, h_act, g_act)
    gamma, Gamma = extract_rdms(V)
    gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
    return V, es, gamma_s, Gamma_s


@partial(jax.jit, static_argnames=(
    "sector", "k", "max_subspace", "sequential_mv"))
def _sa_davidson_init_program(sector: SectorCI,
                              k: int,
                              V_warm: jnp.ndarray,
                              U: jnp.ndarray,
                              h_sp: jnp.ndarray,
                              g_sp: jnp.ndarray,
                              max_subspace: int = 24,
                              tol: float = 1e-8,
                              sequential_mv: bool = False,
                              sector_tables=None):
    """Chunked SA program A1: rotate integrals, build the sigma
    operators + exact diagonal, initialize the block-Davidson carry.
    Returns (state, vals, diag) — all device residents threaded through
    the bounded advance dispatches (davidson_block_advance)."""
    from ..solvers.davidson import davidson_block_init
    nB, nA = sector.nB, sector.nA
    h_act = rotate_one_body(h_sp, U)
    g_act = rotate_two_body(g_sp, U)
    h_so, g_so = expand_spin_tensors(h_act, g_act)
    vals = sector.build_values(h_so, g_so, tables=sector_tables)
    diag = sector.diagonal_values(vals, tables=sector_tables).reshape(-1)

    def mv(x):
        return sector.sigma_values(x.reshape(nB, nA), vals,
                                   tables=sector_tables).reshape(-1)

    state = davidson_block_init(mv, diag, V_warm, k=k,
                                max_subspace=max_subspace, tol=tol,
                                sequential_mv=sequential_mv)
    return state, vals, diag


@partial(jax.jit, static_argnames=("sector", "iters", "sequential_mv"))
def _sa_davidson_advance_program(sector: SectorCI,
                                 state,
                                 vals,
                                 diag: jnp.ndarray,
                                 iters: int,
                                 tol: float = 1e-8,
                                 sequential_mv: bool = False,
                                 sector_tables=None):
    """Chunked SA program A2: at most `iters` block-Davidson iterations
    — one SHORT compiled dispatch (the shared TPU worker kills
    dispatch-length-bound programs; the monolithic k=3 N=32 solve was
    such a kill), basis stays on device, host reads only the stop
    flag."""
    from ..solvers.davidson import davidson_block_advance
    nB, nA = sector.nB, sector.nA

    def mv(x):
        return sector.sigma_values(x.reshape(nB, nA), vals,
                                   tables=sector_tables).reshape(-1)

    return davidson_block_advance(mv, diag, state, iters=iters, tol=tol,
                                  sequential_mv=sequential_mv)


@partial(jax.jit, static_argnames=("sector", "sequential_mv"))
def _sa_finish_rdm_program(sector: SectorCI,
                           weights: jnp.ndarray,
                           state,
                           vals,
                           diag: jnp.ndarray,
                           tol: float = 1e-8,
                           sequential_mv: bool = False,
                           sector_tables=None):
    """Chunked SA program A3: final Rayleigh-Ritz polish + weighted
    RDMs (sequential per-state extraction under compact tables)."""
    from ..solvers.davidson import davidson_block_finish
    nB, nA = sector.nB, sector.nA

    def mv(x):
        return sector.sigma_values(x.reshape(nB, nA), vals,
                                   tables=sector_tables).reshape(-1)

    res = davidson_block_finish(mv, diag, state, tol=tol,
                                sequential_mv=sequential_mv)
    V, es = res.eigenvectors, res.eigenvalues
    state_rdms = lambda v: sector.rdms(v.reshape(nB, nA),
                                       tables=sector_tables)
    if sequential_mv:
        gammas, Gammas = jax.lax.map(state_rdms, V)
    else:
        gammas, Gammas = jax.vmap(state_rdms)(V)
    gamma = jnp.tensordot(weights, gammas, axes=1)
    Gamma = jnp.tensordot(weights, Gammas, axes=1)
    gamma_s, Gamma_s = spin_reduce_rdms(gamma, Gamma)
    return V, es, gamma_s, Gamma_s


class FusedOptOrbSACASSCF(FusedOptOrbCASSCF):
    """State-averaged CASSCF: orbital optimization over the weighted sum
    of the k LOWEST exact sector eigenvalues (block Davidson), the exact
    counterpart of FusedOptOrbSSVQE/MCVQE/VQD — and their variational
    upper baseline.  Weighted-sum convergence and weight-combined RDMs
    follow the reference OptOrbEigensolver semantics
    (opt_orb_eigensolver.py:149-169).

    Extra args vs FusedOptOrbCASSCF:
        k: number of states.
        weight_vector: orbital-update weights (default k, k-1, ..., 1 —
            the FusedOptOrbSSVQE convention).
    `compute_energies()` returns a FusedOptOrbEigensolverResult whose
    `optimal_point` holds the (k, nd) eigenvector block.
    """

    def __init__(self, num_spin_orbitals: int, k: int = 2,
                 weight_vector=None, **kwargs):
        max_subspace = kwargs.pop("max_subspace", None)
        super().__init__(num_spin_orbitals, **kwargs)
        if k < 1 or k > self._sector.dim:
            raise ValueError(f"k={k} out of range for a "
                             f"{self._sector.dim}-determinant sector")
        self.k = int(k)
        self.max_subspace = (max_subspace if max_subspace is not None
                             else max(24, 4 * self.k))
        if self.max_subspace < 2 * self.k:
            raise ValueError("max_subspace must be >= 2k")
        if weight_vector is None:
            weight_vector = [self.k - i for i in range(self.k)]
        if len(weight_vector) != self.k:
            raise ValueError(f"weight_vector needs {self.k} entries")
        dtype = self._h_sp.dtype
        self._weights = jnp.asarray(weight_vector, dtype=dtype)
        # seed: one-hot determinants at the k lowest diagonal entries of
        # the initial (U0-rotated) sector Hamiltonian; a resumed (k, nd)
        # eigenvector block from the checkpoint overrides it
        v_ck = np.asarray(self._v0).reshape(-1)
        if v_ck.size == self.k * self._sector.dim:
            self._V0 = jnp.asarray(v_ck.reshape(self.k, self._sector.dim),
                                   dtype=dtype)
        else:
            h_act = rotate_one_body(self._h_sp, orth(self._U0))
            g_act = rotate_two_body(self._g_sp, orth(self._U0))
            h_so, g_so = expand_spin_tensors(h_act, g_act)
            vals = self._sector.build_values(
                h_so, g_so, tables=self._sector_tables)
            diag = np.asarray(self._sector.diagonal_values(
                vals, tables=self._sector_tables)).reshape(-1)
            order = np.argsort(diag)[: self.k]
            V0 = np.zeros((self.k, self._sector.dim))
            V0[np.arange(self.k), order] = 1.0
            self._V0 = jnp.asarray(V0, dtype=dtype)

    def compute_minimum_energy(self):
        raise AttributeError(
            "FusedOptOrbSACASSCF computes k states — use "
            "compute_energies()")

    def compute_energies(self):
        from .fused import FusedOptOrbEigensolverResult
        from ..utils.config import precision_mode
        dtype = self._h_sp.dtype
        mode = "fast" if jnp.finfo(dtype).bits < 64 else "high"
        with precision_mode(mode):
            if self.dispatch == "two":
                return self._run_two_dispatch_sa(dtype)
            live_cb, post_cb = _cached_callbacks(self)
            es, V, U, it, trace = _fused_optorb_sa_casscf(
                self._sector, self.k, self._weights, self._V0, self._U0,
                self._h_sp, self._g_sp,
                jnp.asarray(self.stopping_tolerance, dtype),
                jnp.asarray(self.inner_stopping_tolerance, dtype),
                jnp.asarray(self.initial_BBstepsize, dtype),
                jnp.asarray(self.decay_factor, dtype),
                outer_maxiter=self.maxiter,
                inner_maxiter=self.inner_maxiter,
                max_subspace=self.max_subspace,
                davidson_maxiter=self.davidson_maxiter,
                callback=live_cb,
                sector_tables=self._sector_tables,
            )
            it = int(it)
            if post_cb is not None:
                post_cb(it, es, V, U, trace)
            trace = np.asarray(trace)[:it]
            occ, s2, g1, sd = _states_diagnostics(
                self._sector, jnp.asarray(V),
                sector_tables=self._sector_tables)
            t1 = _transition_rdm1s(self._sector, jnp.asarray(V),
                                   sector_tables=self._sector_tables)
            return FusedOptOrbEigensolverResult(
                eigenvalues=np.asarray(es),
                optimal_point=np.asarray(V),
                optimal_partial_unitary=np.asarray(U),
                energy_convergence_list=[float(e) for e in trace],
                outer_iterations=it,
                natural_occupations=np.asarray(occ),
                spin_squared=np.asarray(s2),
                one_rdm_spatial=np.asarray(g1),
                spin_density_spatial=np.asarray(sd),
                transition_rdm1_spatial=np.asarray(t1),
            )

    def _run_two_dispatch_sa(self, dtype):
        from .fused import FusedOptOrbEigensolverResult
        cb = _make_program_callback(self.outer_loop_callback,
                                    self.checkpoint_dir)
        h_sp, g_sp = self._h_sp, self._g_sp
        bb = jnp.asarray(self.initial_BBstepsize, dtype)
        inner_tol = jnp.asarray(self.inner_stopping_tolerance, dtype)
        decay = jnp.asarray(self.decay_factor, dtype)
        w = np.asarray(self._weights)

        tabs = self._sector_tables
        compact = _sa_sequential(self._sector, self.k, tabs)
        dav_tol = 1e-9 if jnp.finfo(dtype).bits >= 64 else 1e-6
        # opt-in tolerance ladder, cf. _run_two_dispatch: loop solves at
        # 30x tol (RDM feed only), authoritative final re-solve tight
        loose_tol = dav_tol * 30.0 if self.davidson_tol_ladder else dav_tol
        chunk = self.davidson_chunk
        # stage-resolved profile of the SA ladder (VERDICT r4 item 5):
        # per-outer block-Davidson iteration counts and wall seconds for
        # the eigensolver advance vs the RDM finish vs the orbital
        # program.  Pure observability — read by scripts/probe_h8_casscf
        # and tests; stays empty on the monolithic (chunk=None) path.
        stats = {"davidson_iters": [], "solve_s": [], "finish_s": [],
                 "orb_s": []}
        self.stage_stats = stats

        def solve(V, U, tight=False):
            tol_i = dav_tol if tight else loose_tol
            if chunk is None:
                return _sa_casscf_eig_rdm_program(
                    self._sector, self.k, self._weights, V, U, h_sp,
                    g_sp, max_subspace=self.max_subspace,
                    davidson_maxiter=self.davidson_maxiter,
                    sector_tables=tabs)
            # chunked eigensolver: bounded advance dispatches so no
            # single compiled dispatch exceeds the shared worker's
            # execution budget (cf. vqe_chunk, CLAUDE.md)
            t0 = time.perf_counter()
            state, vals, diag = _sa_davidson_init_program(
                self._sector, self.k, V, U, h_sp, g_sp,
                max_subspace=self.max_subspace, tol=tol_i,
                sequential_mv=compact, sector_tables=tabs)
            while (not bool(np.asarray(state[-1]))
                   and int(np.asarray(state[3])) < self.davidson_maxiter):
                state = _sa_davidson_advance_program(
                    self._sector, state, vals, diag, iters=chunk,
                    tol=tol_i, sequential_mv=compact,
                    sector_tables=tabs)
            stats["davidson_iters"].append(int(np.asarray(state[3])))
            t1 = time.perf_counter()
            stats["solve_s"].append(t1 - t0)
            out = _sa_finish_rdm_program(
                self._sector, self._weights, state, vals, diag,
                tol=tol_i, sequential_mv=compact, sector_tables=tabs)
            np.asarray(out[1])      # materialize: axon block_until_ready
            stats["finish_s"].append(time.perf_counter() - t1)
            return out

        V = self._V0
        U = orth(self._U0)
        trace = np.full((self.maxiter,), np.nan)
        E_prev = np.inf
        it = 0
        converged = False
        while True:
            V, es, gamma_s, Gamma_s = solve(V, U)
            Ew_f = float(np.dot(w, np.asarray(es)))
            if it < trace.shape[0]:
                trace[it] = Ew_f
            if cb is not None:
                cb(it + 1, np.asarray(es), np.asarray(V), np.asarray(U),
                   trace)
            converged = abs(Ew_f - E_prev) < self.stopping_tolerance
            it += 1
            if converged or it >= self.maxiter:
                break
            t0 = time.perf_counter()
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
            np.asarray(U[0, 0])
            stats["orb_s"].append(time.perf_counter() - t0)
            E_prev = Ew_f
        if not converged:
            U = _orb_program(U, gamma_s, Gamma_s, h_sp, g_sp,
                             bb, inner_tol, decay,
                             inner_maxiter=self.inner_maxiter)
        V, es, _, _ = solve(V, U, tight=True)
        occ, s2, g1, sd = _states_diagnostics(
            self._sector, jnp.asarray(V),
            sector_tables=self._sector_tables)
        t1 = _transition_rdm1s(self._sector, jnp.asarray(V),
                               sector_tables=self._sector_tables)
        return FusedOptOrbEigensolverResult(
            eigenvalues=np.asarray(es),
            optimal_point=np.asarray(V),
            optimal_partial_unitary=np.asarray(U),
            energy_convergence_list=[float(e) for e in trace[:it]],
            outer_iterations=it,
            natural_occupations=np.asarray(occ),
            spin_squared=np.asarray(s2),
            one_rdm_spatial=np.asarray(g1),
            spin_density_spatial=np.asarray(sd),
            transition_rdm1_spatial=np.asarray(t1),
        )
