"""Shared machinery of the OptOrb solver family.

Native re-design of the reference's BaseOptOrbSolver
(base_opt_orb_solver.py:19-657): integral ingestion, initial partial
unitary, rotated-Hamiltonian rebuild, RDM measurement, and the energy
functional closures handed to the Stiefel optimizer.

Key architectural departures (all TPU-motivated):

  * **Spatial fast path.**  Chemistry tensors are validated once for the
    RHF spin-block structure, then ALL heavy math runs on spatial m = M/2
    tensors (see kernels.py) — 16x cheaper than the reference's
    spin-orbital einsums.
  * **Direct RDM extraction.**  By default the one/two-RDMs are computed
    from the simulator statevector with two GEMMs (sim/rdm.py) instead of
    the reference's O(N^4) sequential per-Pauli estimator calls
    (opt_orb_minimum_eigensolver.py:187-202).  The per-Pauli path —
    `construct_pauli_op_dict` + `get_one/two_RDM_tensor`
    (base_opt_orb_solver.py:247-360, :362-532) — is retained under
    `rdm_measurement='pauli'` for semantics parity and cross-checking.
  * **Hamiltonian rebuild** reuses the precomputed Jordan-Wigner structure
    (ops/hamiltonian.py): two sparse matvecs per outer iteration instead
    of O(N^4) symbolic mapper calls (ref base_opt_orb_solver.py:584-612).
"""

from __future__ import annotations

import copy
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fermion import FermionicOp
from ..ops.hamiltonian import ActiveSpaceHamiltonianBuilder
from ..ops.jw import JordanWignerMapper
from ..ops.pauli import SparsePauliOp, masks_to_label
from ..sim.estimator import Estimator
from ..sim.rdm import one_rdm, two_rdm
from ..sim.statevector import compile_circuit
from .kernels import (
    expand_spin_tensors,
    rotated_energy_so,
    rotated_energy_spatial,
    rotated_integrals_spatial,
    spatial_blocks,
    spin_blocks_consistent,
    spin_reduce_rdms,
)
from .stiefel import PartialUnitaryProjectionOptimizer, orth


# --- module-level jittable objectives (stable identities => the Stiefel ---
# --- optimizer compiles each exactly once per shape signature)          ---

def _spatial_objective(U, gamma_s, Gamma_s, h_sp, g_sp):
    return rotated_energy_spatial(U, gamma_s, Gamma_s, h_sp, g_sp)


def _so_objective(U, gamma, Gamma, h_so, g_so):
    return rotated_energy_so(U, gamma, Gamma, h_so, g_so)


def _spatial_objective_complex(U, gamma_s, Gamma_s, h_sp, g_sp):
    from .kernels import rotated_energy_spatial_complex
    return rotated_energy_spatial_complex(U, gamma_s, Gamma_s, h_sp, g_sp)


def _so_objective_complex(U, gamma, Gamma, h_so, g_so):
    from .kernels import rotated_energy_so_complex
    return rotated_energy_so_complex(U, gamma, Gamma, h_so, g_so)


_hamiltonian_builder_cache: Dict[tuple, tuple] = {}  # key -> (mapper, builder)


def _get_builder(num_spin_orbitals: int,
                 mapper=None) -> ActiveSpaceHamiltonianBuilder:
    # the builder's linear (h, g) -> Pauli-coefficient structure depends on
    # the encoding; library mappers are stateless per type, so key on the
    # type name (custom mappers key on instance identity)
    from ..ops.jw import JordanWignerMapper as _JW
    from ..ops.mappers import (BravyiKitaevMapper as _BK,
                               ParityMapper as _PM)
    if mapper is None or isinstance(mapper, _JW):
        mkey = "jw"
    elif type(mapper) in (_PM, _BK):
        mkey = type(mapper).__name__
    else:
        # custom mapper: key on instance identity, and hold a reference to
        # the mapper in the cache entry so a garbage-collected mapper's
        # reused id() can never alias a builder for a different encoding
        mkey = id(mapper)
    key = (num_spin_orbitals, mkey)
    hit = _hamiltonian_builder_cache.get(key)
    if hit is not None:
        cached_mapper, b = hit
        if isinstance(mkey, str) or cached_mapper is mapper:
            return b
    b = ActiveSpaceHamiltonianBuilder(num_spin_orbitals, mapper)
    _hamiltonian_builder_cache[key] = (mapper, b)
    return b


class BaseOptOrbResult:
    """Result fields shared by all OptOrb solvers (ref :628-653)."""

    def __init__(self) -> None:
        self.optimal_partial_unitary: Optional[np.ndarray] = None
        self.num_vqe_evaluations: int = 0
        self.energy_convergence_list: List[float] = []
        self.orbital_rotation_iterations: List[int] = []
        self.metrics: Dict[str, list] = {}


class BaseOptOrbSolver:
    """Shared OptOrb machinery (constructor parity with the reference,
    base_opt_orb_solver.py:19-33 — including the historically misspelled
    ``wavefuntion_real`` keyword the shipped examples rely on)."""

    def __init__(self,
                 num_spin_orbitals: int,
                 mapper: Optional[JordanWignerMapper] = None,
                 estimator: Optional[Estimator] = None,
                 partial_unitary_optimizer: Optional[PartialUnitaryProjectionOptimizer] = None,
                 problem=None,
                 integral_tensors: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 initial_partial_unitary: Optional[np.ndarray] = None,
                 maxiter: int = 10,
                 stopping_tolerance: float = 1e-5,
                 spin_conserving: bool = False,
                 wavefuntion_real: bool = False,
                 outer_loop_callback: Optional[Callable] = None,
                 partial_unitary_random_perturbation: Optional[float] = None,
                 RDM_ops_batchsize: Optional[int] = 100,
                 rdm_measurement: str = "direct",
                 checkpoint_dir: Optional[str] = None,
                 seed: Optional[int] = None,
                 mesh=None):
        """
        Args (reference-parity unless noted):
            num_spin_orbitals: active-space size N.
            mapper: fermion->qubit mapper for RDM ops (default JW).
            estimator: expectation-value primitive (used by the per-Pauli
                RDM path; the direct path reads the statevector).
            partial_unitary_optimizer: the Stiefel/BB inner optimizer.
            problem: an ElectronicStructureProblem (chem.driver) supplying
                spin-orbital integral tensors.
            integral_tensors: explicit (h, g) dense spin-orbital tensors in
                the reference convention (physicist two-body with the -1
                sign folded, i.e. E2 = sum g * <a+ a+ a a>).
            initial_partial_unitary: spatial (M/2, N/2) initial U; defaults
                to the HF permutation matrix.
            maxiter / stopping_tolerance: outer-loop control.
            spin_conserving / wavefuntion_real: RDM symmetry flags
                (consumed by the per-Pauli parity path; the direct path is
                exact regardless).
            outer_loop_callback: callback(iteration, solver_result,
                optorb_result) per outer iteration.
            partial_unitary_random_perturbation: stddev of the N(0, s)
                noise added to U (then re-orthonormalized) before each
                inner optimization.
            RDM_ops_batchsize: batch size for the per-Pauli path (parity
                knob; the estimator is stateless here).
            rdm_measurement: 'direct' (statevector GEMM path, default) or
                'pauli' (reference-semantics per-operator estimation).
            checkpoint_dir: if set, write a resumable checkpoint after
                every outer iteration (new capability; reference only
                offered the callback seam, base_opt_orb_solver.py:60-62).
            seed: RNG seed for perturbations.
        """
        # drop-in interop: accept qiskit-nature problems / qiskit mappers
        # where the reference does (base_opt_orb_solver.py:22,87-91,115)
        from ..interop import adapt as _interop_adapt
        problem, mapper = _interop_adapt(problem, mapper)
        self.mapper = mapper or JordanWignerMapper()
        self.estimator = estimator or Estimator()
        self.partial_unitary_optimizer = (
            partial_unitary_optimizer or PartialUnitaryProjectionOptimizer())

        if integral_tensors is not None:
            h_so = np.asarray(integral_tensors[0], dtype=np.float64)
            g_so = np.asarray(integral_tensors[1], dtype=np.float64)
        elif problem is not None and hasattr(problem,
                                             "spatial_integral_tensors"):
            # spatial-direct ingestion: skips the 16x-larger spin-orbital
            # intermediate entirely (it is never needed on the fast path)
            h_sp, g_sp = problem.spatial_integral_tensors()
            self.one_body_integrals = None
            self.two_body_integrals = None
            self.num_original_spin_orbitals = 2 * h_sp.shape[0]
            self.num_spin_orbitals = num_spin_orbitals
            self._spatial_path = True
            self._h_sp = jnp.asarray(h_sp)
            self._g_sp = jnp.asarray(g_sp)
            self._h_so = self._g_so = None
            self._finish_init(num_spin_orbitals, maxiter, stopping_tolerance,
                              spin_conserving, wavefuntion_real,
                              outer_loop_callback,
                              partial_unitary_random_perturbation,
                              RDM_ops_batchsize, rdm_measurement,
                              checkpoint_dir, seed, mesh,
                              initial_partial_unitary)
            return
        elif problem is not None:
            h_so, g_so = problem.integral_tensors()
        else:
            raise ValueError("either `problem` or `integral_tensors` required")

        self.one_body_integrals = h_so
        self.two_body_integrals = g_so
        self.num_original_spin_orbitals = h_so.shape[0]
        self.num_spin_orbitals = num_spin_orbitals

        # spatial fast path eligibility (verified once, host-side)
        self._spatial_path = spin_blocks_consistent(h_so, g_so)
        if self._spatial_path:
            h_sp, g_sp = spatial_blocks(h_so, g_so)
            self._h_sp = jnp.asarray(h_sp)
            self._g_sp = jnp.asarray(g_sp)
        else:
            self._h_sp = self._g_sp = None
        self._h_so = jnp.asarray(h_so)
        self._g_so = jnp.asarray(g_so)
        self._finish_init(num_spin_orbitals, maxiter, stopping_tolerance,
                          spin_conserving, wavefuntion_real,
                          outer_loop_callback,
                          partial_unitary_random_perturbation,
                          RDM_ops_batchsize, rdm_measurement,
                          checkpoint_dir, seed, mesh,
                          initial_partial_unitary)

    def _finish_init(self, num_spin_orbitals, maxiter, stopping_tolerance,
                     spin_conserving, wavefuntion_real, outer_loop_callback,
                     partial_unitary_random_perturbation, RDM_ops_batchsize,
                     rdm_measurement, checkpoint_dir, seed, mesh,
                     initial_partial_unitary):
        m = self.num_original_spin_orbitals // 2
        n = num_spin_orbitals // 2
        if initial_partial_unitary is None:
            U0 = np.zeros((m, n))
            U0[np.arange(n), np.arange(n)] = 1.0  # HF permutation (ref :93-103)
        else:
            U0 = np.asarray(initial_partial_unitary, dtype=np.float64)
            if U0.shape != (m, n):
                raise ValueError(
                    f"initial_partial_unitary must be spatial ({m}, {n}), "
                    f"got {U0.shape}")
        self.initial_partial_unitary = U0
        self._current_partial_unitary = U0

        self.maxiter = maxiter
        self.stopping_tolerance = stopping_tolerance
        self.spin_conserving = spin_conserving
        self.wavefunction_real = wavefuntion_real
        self.outer_loop_callback = outer_loop_callback
        self.partial_unitary_random_perturbation = partial_unitary_random_perturbation
        self.RDM_ops_batchsize = RDM_ops_batchsize
        if rdm_measurement not in ("direct", "pauli"):
            raise ValueError("rdm_measurement must be 'direct' or 'pauli'")
        if rdm_measurement == "direct" and \
                not isinstance(self.mapper, JordanWignerMapper):
            # the direct path reads statevector amplitudes in the
            # occupation basis, which only JW preserves; non-JW mappers
            # (parity/Bravyi-Kitaev) take the per-Pauli reference path
            import warnings
            warnings.warn(
                f"rdm_measurement='direct' requires the Jordan-Wigner "
                f"encoding; switching to 'pauli' for "
                f"{type(self.mapper).__name__}", stacklevel=3)
            rdm_measurement = "pauli"
        self.rdm_measurement = rdm_measurement
        self.checkpoint_dir = checkpoint_dir
        self._rng = np.random.default_rng(seed)

        self._hamiltonian: Optional[SparsePauliOp] = None
        self._pauli_op_dict: Optional[Dict[str, SparsePauliOp]] = None
        self._energy_convergence_list: List[float] = []

        # optional multi-device sharding of the g tensor (parallel/sharded.py):
        # the inner orbital optimization runs distributed over `mesh`.
        self.mesh = mesh
        self._sharded = None
        if mesh is not None:
            if not self._spatial_path:
                raise ValueError(
                    "mesh sharding requires spin-block-structured integrals")
            from ..parallel import (ShardedOrbitalOptimizer,
                                    shard_problem_tensors)
            h_rep, g_sh = shard_problem_tensors(mesh, self._h_sp, self._g_sp)
            self._sharded = {
                "h": h_rep, "g": g_sh,
                "optimizer": ShardedOrbitalOptimizer(
                    mesh,
                    initial_BBstepsize=self.partial_unitary_optimizer.BBstepsize,
                    stopping_tolerance=self.partial_unitary_optimizer.stopping_tolerance,
                    maxiter=self.partial_unitary_optimizer.maxiter,
                    decay_factor=self.partial_unitary_optimizer.decay_factor),
            }

        # per-iteration copies, mirroring the reference's lifecycle
        # (base_opt_orb_solver.py:75) — our optimizer is stateless apart
        # from its compile cache, which the copies share.
        self._partial_unitary_optimizer_list = [
            copy.copy(self.partial_unitary_optimizer)
            for _ in range(int(maxiter) + 1)
        ]

    # -- properties (parity surface) --------------------------------------
    @property
    def energy_convergence_list(self) -> List[float]:
        return self._energy_convergence_list

    @property
    def current_partial_unitary(self) -> np.ndarray:
        return np.asarray(self._current_partial_unitary)

    # -- Stiefel projection ------------------------------------------------
    @staticmethod
    def orth(V) -> np.ndarray:
        """Polar-factor projection onto the Stiefel manifold (ref :614-626)."""
        return np.asarray(orth(jnp.asarray(V)))

    # -- energy functionals ------------------------------------------------
    def compute_rotated_energy(self, partial_unitary, oneRDM, twoRDM,
                               one_body_integrals, two_body_integrals):
        """E(U) with explicit spin-orbital RDMs/integrals — reference-parity
        signature (base_opt_orb_solver.py:534-582); jax-traceable.

        Deliberate deviation: the reference's complex-RDM branch SUBTRACTS
        the two-body term (base_opt_orb_solver.py:575-580, exercised by no
        test or example); here complex RDMs are reduced to their real part
        (with residue warnings on the measurement path) and the physically
        correct E1 + E2 is always used."""
        return _so_objective(partial_unitary, oneRDM, twoRDM,
                             one_body_integrals, two_body_integrals)

    @staticmethod
    def _combined_rdms(gammas, Gammas,
                       weights: Optional[Sequence[float]] = None,
                       keep_complex: bool = False):
        """Weight-combine multi-state RDMs.  The weighted sum
        sum_i w_i E(U; RDM_i) is linear in the RDMs, so it collapses to ONE
        energy evaluation with combined RDMs — k-fold cheaper than the
        reference's per-state loop (opt_orb_eigensolver.py:149-169).

        keep_complex=True preserves complex128 RDMs (reference parity:
        base_opt_orb_solver.py:575 casts to complex128 whenever
        wavefuntion_real is False)."""
        if weights is None:
            weights = [1.0] * len(gammas)
        w = np.asarray(weights, dtype=np.float64)
        if keep_complex and any(np.iscomplexobj(gi) for gi in gammas):
            gamma = sum(wi * np.asarray(gi, dtype=np.complex128)
                        for wi, gi in zip(w, gammas))
            Gamma = sum(wi * np.asarray(Gi, dtype=np.complex128)
                        for wi, Gi in zip(w, Gammas))
            return gamma, Gamma
        gamma = sum(wi * np.real(np.asarray(gi)) for wi, gi in zip(w, gammas))
        Gamma = sum(wi * np.real(np.asarray(Gi)) for wi, Gi in zip(w, Gammas))
        return gamma, Gamma

    def _inner_objective_and_data(self, gammas, Gammas,
                                  weights: Optional[Sequence[float]] = None):
        """(objective_fn, data tuple) for the Stiefel optimizer.

        Complex-RDM path (reference base_opt_orb_solver.py:575-580): when
        `wavefuntion_real` is False and the measured RDMs are complex, the
        complex128 tensors are kept through the inner objective, whose
        value is the real part of the physically correct E1 + E2 (the
        reference branch's two-body sign quirk is deliberately not
        reproduced; see kernels.rotated_energy_spatial_complex)."""
        gamma, Gamma = self._combined_rdms(
            gammas, Gammas, weights,
            keep_complex=not self.wavefunction_real)
        if np.iscomplexobj(gamma):
            from .kernels import spin_reduce_rdms_complex
            if self._spatial_path:
                gamma_s, Gamma_s = spin_reduce_rdms_complex(
                    jnp.asarray(gamma), jnp.asarray(Gamma))
                return _spatial_objective_complex, (gamma_s, Gamma_s,
                                                    self._h_sp, self._g_sp)
            return _so_objective_complex, (jnp.asarray(gamma),
                                           jnp.asarray(Gamma),
                                           self._h_so, self._g_so)
        if self._spatial_path:
            gamma_s, Gamma_s = spin_reduce_rdms(jnp.asarray(gamma),
                                                jnp.asarray(Gamma))
            return _spatial_objective, (gamma_s, Gamma_s,
                                        self._h_sp, self._g_sp)
        return _so_objective, (jnp.asarray(gamma), jnp.asarray(Gamma),
                               self._h_so, self._g_so)

    def _run_inner_optimization(self, pupo, U0, gammas, Gammas,
                                weights: Optional[Sequence[float]] = None):
        """Run the orbital-rotation subproblem — distributed over the mesh
        when one was provided, single-device otherwise.  Returns (U, E)."""
        if self._sharded is not None:
            gamma, Gamma = self._combined_rdms(gammas, Gammas, weights)
            gamma_s, Gamma_s = spin_reduce_rdms(jnp.asarray(gamma),
                                                jnp.asarray(Gamma))
            return self._sharded["optimizer"].compute_optimal_rotation(
                U0, gamma_s, Gamma_s, self._sharded["h"], self._sharded["g"])
        objective, data = self._inner_objective_and_data(gammas, Gammas,
                                                         weights)
        return pupo.compute_optimal_rotation(objective, U0, *data)

    # -- Hamiltonian rebuild -----------------------------------------------
    def get_rotated_hamiltonian(self, partial_unitary) -> SparsePauliOp:
        """Qubit Hamiltonian of the active space after rotating by U
        (ref :584-612)."""
        u = jnp.asarray(partial_unitary)
        if self._spatial_path:
            h_act, g_act = rotated_integrals_spatial(u, self._h_sp, self._g_sp)
            h_so, g_so = expand_spin_tensors(h_act, g_act)
        else:
            from .kernels import expand_spin, rotate_one_body, rotate_two_body
            U = expand_spin(u)
            h_so = rotate_one_body(self._h_so, U)
            g_so = rotate_two_body(self._g_so, U)
        return _get_builder(self.num_spin_orbitals, self.mapper).build(
            np.asarray(h_so), np.asarray(g_so))

    # -- RDM measurement: direct statevector path --------------------------
    def measure_rdms_direct(self, state_vector) -> Tuple[np.ndarray, np.ndarray]:
        """(gamma, Gamma) from a statevector via the GEMM contraction path."""
        N = self.num_spin_orbitals
        sv = jnp.asarray(state_vector)
        return np.asarray(one_rdm(sv, N)), np.asarray(two_rdm(sv, N))

    def _rdms_for_bound_circuits(self, pairs) -> Tuple[list, list]:
        """(gammas, Gammas) for (circuit, params) pairs on the direct path.

        Sector-eligible circuits (UCC family over an occupation-basis
        initial state, solvers/energy._sector_for) are measured entirely
        in the particle-number sector — sector.rdms never materializes the
        2^N statevector; others fall back to the full simulation + GEMM
        extraction with the imaginary-residue guard."""
        from ..solvers.energy import _sector_for
        from ..sim.statevector import compile_circuit
        gammas, Gammas = [], []
        for circ, params in pairs:
            params = np.zeros(circ.num_parameters) if params is None \
                else np.asarray(params)
            sec = _sector_for(circ)
            if sec is not None:
                # sector states/RDMs are real by construction
                rfn = getattr(sec, "_rdms_jit", None)
                if rfn is None:
                    rfn = sec._rdms_jit = jax.jit(
                        lambda th, s=sec: s.rdms(s.state(th)))
                g1, g2 = rfn(jnp.asarray(params, dtype=jnp.float64))
                gammas.append(np.asarray(g1))
                Gammas.append(np.asarray(g2))
            else:
                sv = np.asarray(compile_circuit(circ).state(params))
                g, G = self._rdms_for_states([sv])
                gammas.extend(g)
                Gammas.extend(G)
        return gammas, Gammas

    # -- RDM measurement: per-Pauli parity path ----------------------------
    def _rdm_fermionic_terms(self):
        """Yields (kind, indices, FermionicOp) for every RDM element operator,
        with the reference's pruning (p==q / r==s zero, spin conservation)."""
        N = self.num_spin_orbitals
        n = N // 2

        def spin(p):
            return 0 if p < n else 1

        for p in range(N):
            for q in range(N):
                if self.spin_conserving and spin(p) != spin(q):
                    continue
                yield ("one", (p, q),
                       FermionicOp({f"+_{p} -_{q}": 1.0}, N))
        for p in range(N):
            for q in range(N):
                if p == q:
                    continue
                for r in range(N):
                    for s in range(N):
                        if r == s:
                            continue
                        if self.spin_conserving and \
                                spin(p) + spin(q) != spin(r) + spin(s):
                            continue
                        yield ("two", (p, q, r, s),
                               FermionicOp({f"+_{p} +_{q} -_{s} -_{r}": 1.0}, N))

    def construct_pauli_op_dict(self, mapper=None) -> Dict[str, SparsePauliOp]:
        """Label -> single-Pauli SparsePauliOp for every Pauli string needed
        by any RDM element (ref base_opt_orb_solver.py:247-360).

        Deduplication is global across elements (each distinct Pauli string
        is measured exactly once), subsuming the reference's
        Hermitian-vs-split bookkeeping.
        """
        mapper = mapper or self.mapper
        N = self.num_spin_orbitals
        pauli_dict: Dict[str, SparsePauliOp] = {}
        decomps: Dict[tuple, list] = {}
        for kind, idx, fop in self._rdm_fermionic_terms():
            op = mapper.map(fop)
            terms = []
            for x, z, c in zip(op.xs, op.zs, op.coeffs):
                label = masks_to_label(x, z, N)
                if label not in pauli_dict:
                    pauli_dict[label] = SparsePauliOp(
                        ([x], [z]), [1.0], num_qubits=N)
                terms.append((label, complex(c)))
            decomps[(kind,) + idx] = terms
        self._rdm_decompositions = decomps
        self._pauli_op_dict = pauli_dict
        return pauli_dict

    def measure_pauli_dict(self, state_circuit, params=None,
                           estimator: Optional[Estimator] = None
                           ) -> Dict[str, float]:
        """Expectation value of every dict Pauli w.r.t. the given state.

        Reference semantics (one estimator call per op,
        opt_orb_minimum_eigensolver.py:187-202) collapsed into one batched
        device evaluation over the whole dict.
        """
        if self._pauli_op_dict is None:
            self.construct_pauli_op_dict(self.mapper)
        compiled = compile_circuit(state_circuit)
        if params is None:
            params = np.zeros(compiled.num_parameters)
        state = compiled.state(jnp.asarray(params))
        labels = list(self._pauli_op_dict.keys())
        xs = np.array([self._pauli_op_dict[lb].xs[0] for lb in labels])
        zs = np.array([self._pauli_op_dict[lb].zs[0] for lb in labels])
        ys = np.array([bin(x & z).count("1") for x, z in zip(xs, zs)])
        vals = []
        bs = self.RDM_ops_batchsize or len(labels)
        for lo in range(0, len(labels), bs):
            sl = slice(lo, lo + bs)
            from ..sim.statevector import pauli_quadforms
            q = np.asarray(pauli_quadforms(state, jnp.asarray(xs[sl]),
                                           jnp.asarray(zs[sl])))
            vals.append(q * np.power(1j, ys[sl] % 4))
        flat = np.concatenate(vals)
        return dict(zip(labels, flat))

    def get_one_RDM_tensor(self, expectval_dict: Dict[str, complex],
                           mapper=None) -> np.ndarray:
        """Assemble gamma from Pauli expectation values (ref :455-532)."""
        N = self.num_spin_orbitals
        dtype = np.float64 if self.wavefunction_real else np.complex128
        gamma = np.zeros((N, N), dtype=dtype)
        vals = []
        for key, terms in self._rdm_decompositions.items():
            if key[0] != "one":
                continue
            _, p, q = key
            val = sum(c * expectval_dict[lb] for lb, c in terms)
            vals.append(val)
            gamma[p, q] = val.real if self.wavefunction_real else val
        self._assembly_residue_check(vals, "1-RDM")
        return gamma

    def get_two_RDM_tensor(self, expectval_dict: Dict[str, complex],
                           mapper=None) -> np.ndarray:
        """Assemble Gamma from Pauli expectation values (ref :362-453)."""
        N = self.num_spin_orbitals
        dtype = np.float64 if self.wavefunction_real else np.complex128
        Gamma = np.zeros((N, N, N, N), dtype=dtype)
        vals = []
        for key, terms in self._rdm_decompositions.items():
            if key[0] != "two":
                continue
            _, p, q, r, s = key
            val = sum(c * expectval_dict[lb] for lb, c in terms)
            vals.append(val)
            Gamma[p, q, r, s] = val.real if self.wavefunction_real else val
        self._assembly_residue_check(vals, "2-RDM")
        return Gamma

    # -- shared outer-loop helpers ----------------------------------------
    def _maybe_perturb_unitary(self, U: np.ndarray) -> np.ndarray:
        scale = self.partial_unitary_random_perturbation
        if scale:
            noise = self._rng.normal(0.0, scale, size=U.shape)
            return self.orth(U + noise)
        return U

    def _rdms_for_states(self, state_vectors) -> Tuple[list, list]:
        """(gammas, Gammas) for each state, on the configured path.

        Imaginary residue is detected and warned about (the reference's
        module-global flag mechanism, base_opt_orb_solver.py:380-401)
        before the real parts feed the orbital objective."""
        from ..utils.debug import check_imaginary_residue
        strip = self.wavefunction_real
        gammas, Gammas = [], []
        for sv in state_vectors:
            g1, g2 = self.measure_rdms_direct(sv)
            gammas.append(check_imaginary_residue(g1, what="1-RDM",
                                                  strip=strip))
            Gammas.append(check_imaginary_residue(g2, what="2-RDM",
                                                  strip=strip))
        return gammas, Gammas

    def _rdms_via_pauli(self, circuits_and_params) -> Tuple[list, list]:
        gammas, Gammas = [], []
        for circ, params in circuits_and_params:
            vals = self.measure_pauli_dict(circ, params)
            gammas.append(self.get_one_RDM_tensor(vals))
            Gammas.append(self.get_two_RDM_tensor(vals))
        return gammas, Gammas

    def _assembly_residue_check(self, values, what: str) -> None:
        """Reference flag-mechanism parity for the Pauli assembly path
        (base_opt_orb_solver.py:380-401): when `wavefuntion_real` claims a
        real wavefunction, detect and warn about imaginary residue in the
        measured element values being stripped."""
        if not self.wavefunction_real:
            return
        import warnings
        resid = max((abs(complex(v).imag) for v in values), default=0.0)
        if resid > 1e-8:
            warnings.warn(
                f"{what} elements have imaginary residue {resid:.2e} with "
                f"wavefuntion_real=True; wavefunction may not be real",
                stacklevel=3)

    def stopping_condition(self, iteration: int) -> bool:
        """ref opt_orb_minimum_eigensolver.py:125-138."""
        lst = self._energy_convergence_list
        if len(lst) >= 2:
            return (iteration >= self.maxiter
                    or abs(lst[-1] - lst[-2]) < self.stopping_tolerance)
        return iteration >= self.maxiter
