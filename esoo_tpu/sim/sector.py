"""Particle-number-sector statevector simulation (TPU fast path).

UCC-family circuits conserve particle number per spin, so the state never
leaves the Hilbert-space sector spanned by the C(n, na)*C(n, nb)
determinants of the initial Hartree-Fock occupation — a space 10-100x
smaller than the full 2^N qubit space the generic simulator
(sim/statevector.py) works in (H8 cc-pVTZ -> 16 spin orbitals: 4,900 vs
65,536 amplitudes; the gap widens combinatorially with N).

Key facts this module exploits:

  * One UCC excitation rotation exp(theta (T - T+)) — which the full-space
    path implements as its commuting group of Pauli rotations
    (sim/ansatz.py:excitation_rotation_group) — acts on the determinant
    basis as a bank of independent 2x2 Givens rotations: T pairs each
    determinant D in its domain (occ occupied, vir empty) with exactly one
    partner D', with a fermionic sign s = +-1, and annihilates everything
    else.  So a "gate" here is a gather -> rotate -> scatter over
    precomputed (pair_lo, pair_hi, sign) tables, O(pairs) instead of
    O(2^N) work, run as one `lax.scan` over the parameterized excitations.
  * The sector Hamiltonian matrix H[D, D'] (Slater-Condon) has an
    (h, g)-independent index/phase structure
    (initializations/ci.py:slater_condon_structure) precomputed once on
    the host; the matrix itself is assembled *on device, inside jit* from
    the rotated integrals each outer OptOrb iteration, and the eigensolver
    cost is the dense quadratic form v^T H v — an MXU-shaped GEMV instead
    of thousands of full-space Pauli/RDM kernel applications.

Equality with the full-space simulator is exact (same generator algebra,
same JW sign convention — see excite() in initializations/ci.py) and is
enforced by tests/test_sector.py.

Reference anchor: the reference has no counterpart (it simulates in the
full 2^N space via Aer, e.g. tests/test_optorbvqe.py:23); this is a
TPU-native scaling capability.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..initializations.ci import (enumerate_determinants,
                                  slater_condon_structure)
from . import strings as _strings
from .circuit import QuantumCircuit


def _bitcount(a: np.ndarray) -> np.ndarray:
    return np.bitwise_count(a.astype(np.uint64)).astype(np.int64)


# cache the O(nd^2) host-side Slater-Condon structure scan past this
# determinant count (~86 s single-core at nd=4,900 / H8 N=16; ~tens of
# minutes at nd=44,100 / N=20 — paid once per sector, not per solver)
_SC_CACHE_MIN_ND = 3000


def _slater_condon_structure_cached(dets, n: int) -> dict:
    """Disk-cached slater_condon_structure keyed on (determinant set, n).

    The structure is a pure function of the ordered determinant list, so
    a content hash is a sound key.  Failures (no disk, races, corrupt
    files) silently fall back to a fresh build; writes are atomic
    (tmp + os.replace).  Cache dir: $ESOO_CACHE_DIR or ~/.cache/esoo_jax
    (the package's existing cache location)."""
    import hashlib
    import os

    if len(dets) < _SC_CACHE_MIN_ND:
        return slater_condon_structure(dets, n)
    arr = np.asarray(dets, dtype=np.int64)
    key = hashlib.sha1(arr.tobytes() + bytes([n])).hexdigest()[:16]
    cache_dir = os.environ.get(
        "ESOO_CACHE_DIR", os.path.expanduser("~/.cache/esoo_jax"))
    path = os.path.join(cache_dir,
                        f"sector_sc_n{n}_nd{len(dets)}_{key}.npz")
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        pass
    out = slater_condon_structure(dets, n)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".{os.getpid()}.tmp.npz"
        np.savez(tmp, **out)
        os.replace(tmp, path)
    except Exception:
        pass
    return out


def _apply_ladder_chain(dets: np.ndarray, occ: Sequence[int],
                        vir: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized application of the excitation operator
    T = a+_{vir[0]} ... a+_{vir[-1]} a_{occ[-1]} ... a_{occ[0]}
    (the exact ladder order sim/ansatz.py feeds to FermionicOp) to a batch
    of determinants all inside T's domain.  Returns (new_dets, signs)."""
    d = dets.copy()
    sign = np.ones(len(dets), dtype=np.float64)
    # rightmost ladder operator acts first: a_{occ[0]}, a_{occ[1]}, ...,
    # then a+_{vir[-1]}, ..., a+_{vir[0]}
    for i in occ:                      # annihilate (bit guaranteed set)
        sign *= 1.0 - 2.0 * (_bitcount(d & ((1 << i) - 1)) & 1)
        d = d ^ (1 << i)
    for a in reversed(vir):            # create (bit guaranteed clear)
        sign *= 1.0 - 2.0 * (_bitcount(d & ((1 << a) - 1)) & 1)
        d = d | (1 << a)
    return d, sign


def _float0_like(a) -> np.ndarray:
    """Zero cotangent for an integer-dtype primal (jax custom_vjp
    convention: int inputs take float0-dtype cotangents)."""
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


def _gate_step(v, partner, sfield, th):
    """One Givens-bank gate: v' = c_eff*v + sfield*sin(th)*v[partner]."""
    touched = jnp.abs(sfield)
    c_eff = 1.0 + (jnp.cos(th) - 1.0) * touched
    return c_eff * v + sfield * jnp.sin(th) * v[partner]


def _apply_gates_tabled(v0, theta, PARTNER, SFIELD):
    def gate(v, xs):
        partner, sfield, th = xs
        return _gate_step(v, partner, sfield, th), None

    K = int(theta.shape[0])
    v, _ = jax.lax.scan(gate, v0, (PARTNER, SFIELD, theta),
                        unroll=min(8, max(K, 1)))
    return v


@jax.custom_vjp
def _apply_rev(v0, theta, PARTNER, SFIELD):
    """Gate application with a REVERSIBLE analytic VJP (tabled path).

    Each gate is orthogonal, so the backward pass reconstructs the
    intermediate states by applying the inverse rotations instead of
    storing one (nd+1,) residual per gate — O(1) residual memory for a
    K-step circuit — and the cotangent recursion w_{k-1} = G_k^T w_k is
    the same gather-only formula as the forward (G^T = G(-theta)): no
    scatters anywhere in forward OR backward.  (The autodiff VJP of the
    scan stores K residuals and transposes each gather into a
    scatter-add.)  Float roundoff of the reverse reconstruction is
    ~K ulps (exact in the f64 oracle tests)."""
    return _apply_gates_tabled(v0, theta, PARTNER, SFIELD)


def _apply_rev_fwd(v0, theta, PARTNER, SFIELD):
    v = _apply_gates_tabled(v0, theta, PARTNER, SFIELD)
    return v, (v, theta, PARTNER, SFIELD)


def _apply_rev_bwd(res, ct):
    v, theta, PARTNER, SFIELD = res

    def gate_bwd(carry, xs):
        w, vk = carry
        partner, sfield, th = xs
        touched = jnp.abs(sfield)
        c, s = jnp.cos(th), jnp.sin(th)
        c_eff = 1.0 + (c - 1.0) * touched
        # v_{k-1} = G(-th) v_k  (orthogonal inverse, gather-only)
        v_prev = c_eff * vk - sfield * s * vk[partner]
        # dL/dth_k = w . (dG/dth) v_{k-1}
        dG_v = -s * touched * v_prev + sfield * c * v_prev[partner]
        dth = jnp.dot(w, dG_v)
        # w_{k-1} = G^T w  (= G(-th) w: same gather-only formula)
        w_prev = c_eff * w - sfield * s * w[partner]
        return (w_prev, v_prev), dth

    K = int(theta.shape[0])
    (w0, _), dths = jax.lax.scan(gate_bwd, (ct, v),
                                 (PARTNER, SFIELD, theta),
                                 reverse=True, unroll=min(8, max(K, 1)))
    return w0, dths, _float0_like(PARTNER), jnp.zeros_like(SFIELD)


_apply_rev.defvjp(_apply_rev_fwd, _apply_rev_bwd)


def _hv_tabled(v_pad, diag, s_val, d_val, VIDX, PTN):
    nd = diag.shape[0]
    vals = jnp.concatenate(
        [s_val, d_val, jnp.zeros(1, dtype=v_pad.dtype)])
    return diag * v_pad[:nd] + jnp.sum(vals[VIDX] * v_pad[PTN], axis=1)


@jax.custom_vjp
def _qf_tabled(v_pad, diag, s_val, d_val, VIDX, PTN, SU, SV, DU, DV):
    """<v|H|v> over the sparse Slater-Condon values with every index
    table a program ARGUMENT (device buffer) instead of a baked constant
    — at the H8 N=20 sector shape the table constants total ~1 GB and
    break the remote-compile transport (see _quadform_fn for the
    matching constants-based kernel and the VJP rationale)."""
    nd = diag.shape[0]
    return jnp.dot(v_pad[:nd], _hv_tabled(v_pad, diag, s_val, d_val,
                                          VIDX, PTN))


def _qf_tabled_fwd(v_pad, diag, s_val, d_val, VIDX, PTN, SU, SV, DU, DV):
    w = _hv_tabled(v_pad, diag, s_val, d_val, VIDX, PTN)
    nd = diag.shape[0]
    return jnp.dot(v_pad[:nd], w), (v_pad, w, VIDX, PTN, SU, SV, DU, DV)


def _qf_tabled_bwd(res, ct):
    v_pad, w, VIDX, PTN, SU, SV, DU, DV = res
    nd = w.shape[0]
    v = v_pad[:nd]
    pad = v_pad.shape[0] - nd
    g_v = jnp.concatenate([2.0 * ct * w, jnp.zeros(pad, dtype=w.dtype)])
    g_diag = ct * v * v
    g_s = 2.0 * ct * v[SU] * v[SV]
    g_d = 2.0 * ct * v[DU] * v[DV]
    return (g_v, g_diag, g_s, g_d, _float0_like(VIDX), _float0_like(PTN),
            _float0_like(SU), _float0_like(SV), _float0_like(DU),
            _float0_like(DV))


_qf_tabled.defvjp(_qf_tabled_fwd, _qf_tabled_bwd)


def _initial_mask_from_circuit(circ: Optional[QuantumCircuit]) -> int:
    """Occupation bitmask of an X-gates-only preparation circuit."""
    mask = 0
    if circ is None:
        return mask
    for gate in circ.gates:
        if gate.name == "barrier":
            continue
        if gate.name != "x":
            raise ValueError(
                "sector simulation requires an occupation-basis initial "
                f"state (X gates only); found '{gate.name}'")
        mask ^= 1 << gate.qubits[0]
    return mask


class SectorUCC:
    """Compiled sector-basis form of a UCC/UCCSD circuit.

    Built from an ansatz produced by sim.ansatz.UCC (it carries its
    excitation list); exposes

      state(theta)        -> sector amplitude vector, shape (nd + 1,)
                             (the trailing slot is scatter padding; the
                             physical amplitudes are state(theta)[:nd])
      to_full(v)          -> scatter into the full 2^N statevector
      build_hamiltonian(h_so, g_so) -> dense (nd, nd) sector Hamiltonian,
                             jit-safe in the integral tensors
      energy(theta, H)    -> <psi(theta)| H |psi(theta)>
    """

    def __init__(self, ansatz: QuantumCircuit, num_spin_orbitals: int,
                 num_particles: Optional[Tuple[int, int]] = None,
                 kernel: str = "auto"):
        excs = getattr(ansatz, "_ucc_excitations", None)
        if excs is None:
            raise ValueError(
                "sector simulation requires a UCC-family ansatz built by "
                "sim.ansatz.UCC/UCCSD (carrying its excitation list)")
        if getattr(ansatz, "_encoding", "jw") != "jw":
            # the sector reads the initial-state X mask as an occupation
            # bitmask and applies excitations as determinant rotations —
            # only the Jordan-Wigner encoding preserves that reading
            raise ValueError(
                "sector simulation requires the Jordan-Wigner encoding; "
                f"ansatz carries encoding "
                f"{getattr(ansatz, '_encoding')!r}")
        if len(excs) != ansatz.num_parameters:
            raise ValueError(
                f"ansatz has {ansatz.num_parameters} parameters but "
                f"{len(excs)} excitation applications — cannot map "
                "parameters onto sector rotations")
        N = num_spin_orbitals
        n = N // 2
        init_circuit = getattr(ansatz, "_ucc_initial_state", None)
        init_mask = _initial_mask_from_circuit(init_circuit)
        if num_particles is None:
            if init_circuit is None:
                raise ValueError(
                    "cannot infer the particle sector: the ansatz has no "
                    "initial state — pass num_particles= explicitly (the "
                    "excited-state solvers derive it from their initial "
                    "states)")
            na = int(_bitcount(np.asarray([init_mask & ((1 << n) - 1)]))[0])
            nb = int(_bitcount(np.asarray([init_mask >> n]))[0])
            num_particles = (na, nb)
        na, nb = num_particles
        self.num_qubits = N
        self.num_particles = (na, nb)

        dets = np.asarray(
            enumerate_determinants(N, (na, nb), max_excitation=na + nb),
            dtype=np.int64)
        self.dets = dets
        nd = len(dets)
        self.dim = nd
        self.init_index = None
        if init_circuit is not None:
            init_pos = int(np.searchsorted(dets, init_mask))
            if init_pos >= nd or dets[init_pos] != init_mask:
                raise ValueError(
                    "initial determinant not in the sector basis")
            self.init_index = init_pos

        # -- per-gate Givens pair lists (validates sector closure) ---------
        self._excs = [tuple(e) for e in excs]
        pair_lo, pair_hi, pair_sg = self._build_pair_lists()

        # -- string factorization (the MXU fast path; sim/strings.py) ------
        # kernel='auto' uses it whenever the sector + gate tables
        # factorize over alpha x beta strings (always, for UCC circuits
        # over the full sector); 'pairs' keeps the gather kernels (the
        # measured-equality oracle); ESOO_SECTOR_KERNEL overrides.
        import os as _os
        kernel = _os.environ.get("ESOO_SECTOR_KERNEL", kernel)
        self._str_tabs = None
        if kernel != "pairs":
            try:
                self._str_tabs = _strings.build_string_tables(
                    dets, n, pair_lo, pair_hi, pair_sg)
            except ValueError:
                if kernel == "strings":
                    raise
        self.kernel = "strings" if self._str_tabs is not None else "pairs"
        # gather-only gate fields (pairwise apply): the (K, nd+1)
        # PARTNER/SFIELD tables are several GB of host work at the N=24
        # shape and dead weight while the string kernels are active, so
        # they are built lazily on first pairs-path access
        self._pairs_fields_cache = None
        if self.kernel == "pairs":
            self._pairs_fields_cache = self._build_pairs_fields(
                pair_lo, pair_hi, pair_sg)
        # the O(nd^2) Slater-Condon structure scan is built lazily: only
        # the pairwise kernels need it, and with the string kernels
        # active it would cost ~86 s host time at H8 N=16 (tens of
        # minutes at N=20) for nothing
        self._sc_cache = None
        # content key for __hash__/__eq__: SectorUCC instances are jit
        # static arguments of the fused programs; identity-based hashing
        # made every re-instantiated solver RETRACE its whole program
        # set (measured: H8 N=16 'warm' run 453 s vs ~26 s of actual
        # compute).  Construction is deterministic in (circuit content,
        # N, particles, kernel), so content equality is sound.
        self._content_key = (ansatz.fingerprint(), N, (na, nb),
                             self.kernel)

    def __hash__(self):
        return hash(self._content_key)

    def __eq__(self, other):
        return (type(other) is type(self)
                and other._content_key == self._content_key)

    def _build_pair_lists(self):
        """Per-gate Givens pair lists (lo/hi determinant indices + JW
        sign) for every excitation, validating that each excitation maps
        the sector onto itself.  Cheap relative to the padded gate
        fields: O(sum of domain sizes) with vectorized bit arithmetic."""
        dets, nd = self.dets, self.dim
        pair_lo, pair_hi, pair_sg = [], [], []
        for occ, vir in self._excs:
            occ_mask = sum(1 << i for i in occ)
            vir_mask = sum(1 << a for a in vir)
            domain = (((dets & occ_mask) == occ_mask)
                      & ((dets & vir_mask) == 0))
            src = dets[domain]
            dst, sg = _apply_ladder_chain(src, occ, vir)
            lo = np.nonzero(domain)[0]
            hi = np.searchsorted(dets, dst)
            if (hi >= nd).any() or not np.array_equal(dets[hi], dst):
                # ValueError so eligibility probes (_sector_for) fall back
                # to the full simulator instead of crashing
                raise ValueError("excitation left the sector basis — the "
                                 "ansatz does not conserve per-spin "
                                 "particle number")
            pair_lo.append(lo)
            pair_hi.append(hi)
            pair_sg.append(sg)
        return pair_lo, pair_hi, pair_sg

    def _build_pairs_fields(self, pair_lo, pair_hi, pair_sg):
        """Gather-only gate fields for the pairwise apply kernel:
        v' = cos_eff*v + SFIELD*sin(th)*v[PARTNER] — one gather + FMAs
        per gate, no scatters (slow/latency-bound on TPU; their backward
        scatters also compile poorly at scale)."""
        nd, K = self.dim, len(pair_lo)
        PARTNER = np.tile(np.arange(nd + 1, dtype=np.int32), (K, 1))
        SFIELD = np.zeros((K, nd + 1), dtype=np.float64)
        for k in range(K):
            lo, hi, sg = pair_lo[k], pair_hi[k], pair_sg[k]
            PARTNER[k, lo] = hi
            PARTNER[k, hi] = lo
            SFIELD[k, lo] = -sg      # lo' = cos*lo - sg*sin*hi
            SFIELD[k, hi] = +sg      # hi' = sg*sin*lo + cos*hi
        return PARTNER, SFIELD

    @property
    def _pairs_fields(self):
        if self._pairs_fields_cache is None:
            self._pairs_fields_cache = self._build_pairs_fields(
                *self._build_pair_lists())
        return self._pairs_fields_cache

    @property
    def _PARTNER(self):
        return self._pairs_fields[0]

    @property
    def _SFIELD(self):
        return self._pairs_fields[1]

    @property
    def _sc(self) -> dict:
        if self._sc_cache is None:
            self._sc_cache = _slater_condon_structure_cached(
                [int(d) for d in self.dets], self.num_qubits)
        return self._sc_cache

    # -- program-argument tables ---------------------------------------------
    def device_tables(self, dtype=None, storage: str = "dense") -> dict:
        """The large index/sign tables as a host pytree, for passing into
        jitted programs as ARGUMENTS (device buffers) instead of baked
        constants: at the H8 N=20 sector shape (nd=44,100, 16.7M double
        pairs) the constants total ~1 GB and break the remote-compile
        transport (round-3 measurement; cf. the CLAUDE.md m^4-constant
        gotcha).  Float tables are pre-cast to `dtype` so the compiled
        programs contain no wide converts.  Cached per (dtype, storage).

        storage='int8' (string kernels only) keeps the MA/MB operator
        stacks raw int8 UNDER THE DENSE KEYS: the dense kernel graph
        runs unchanged (jnp.asarray casts on device), which under a
        GSPMD operator-axis sharding means each device casts only its
        own stack shard — the mesh x compact composition
        (parallel.shard_sector_tables(storage='compact'))."""
        dtype = np.dtype(dtype if dtype is not None else np.float64)
        cache = getattr(self, "_dev_tabs", None)
        if cache is None:
            cache = self._dev_tabs = {}
        key = (dtype.name, storage)
        if key in cache:
            return cache[key]
        if storage not in ("dense", "int8"):
            raise ValueError("storage must be 'dense' or 'int8'")
        if self.kernel == "strings":
            # the string kernels need ~100x less table data than the
            # pairwise kernels (per-gate (K, nA) vectors instead of
            # (K, nd) fields; (P, P) pair-index maps instead of the
            # (nd, maxdeg) row tables) — at H8 N=20 this shrinks the
            # argument transport from ~1 GB to ~50 MB
            s = self._str_tabs
            f = lambda a: np.asarray(a, dtype=dtype)
            fm = (lambda a: np.asarray(a, dtype=np.int8)) \
                if storage == "int8" else f
            tabs = dict(
                PA=s.PA, PB=s.PB,
                AD=f(s.AD), AR=f(s.AR), UD=f(s.UD), UR=f(s.UR),
                BD=f(s.BD), BR=f(s.BR), VD=f(s.VD), VR=f(s.VR),
                MA=fm(s.MA), MB=fm(s.MB),
                LIN_A=s.LIN_A, LIN_B=s.LIN_B, CROSS=f(s.CROSS),
            )
            cache[key] = tabs
            return tabs
        if storage == "int8":
            raise ValueError(
                "storage='int8' needs the string-factorized kernels "
                f"(kernel={self.kernel!r})")
        st = self._sc
        N = self.num_qubits
        VIDX, PTN = self._row_tables()
        SRC, SG = self._rdm_tables()
        ns = len(st["su"])
        ndbl = len(st["du"])
        f = lambda a: np.asarray(a, dtype=dtype)
        tabs = dict(
            PARTNER=self._PARTNER, SFIELD=f(self._SFIELD),
            VIDX=VIDX, PTN=PTN,
            SU=np.asarray(st["su"], np.int32),
            SV=np.asarray(st["sv"], np.int32),
            DU=np.asarray(st["du"], np.int32),
            DV=np.asarray(st["dv"], np.int32),
            occf=f(st["occf"]),
            rdm_SRC=SRC, rdm_SG=f(SG),
        )
        if ns:
            s_i = np.asarray(st["s_i"], np.int64)
            s_a = np.asarray(st["s_a"], np.int64)
            tabs["s_lin"] = (s_i * N + s_a).astype(np.int32)
            tabs["s_common"] = f(st["s_common"])
            tabs["s_phase"] = f(st["s_phase"])
        else:
            tabs["s_lin"] = np.zeros(0, np.int32)
            tabs["s_common"] = np.zeros((0, N), dtype=dtype)
            tabs["s_phase"] = np.zeros(0, dtype=dtype)
        if ndbl:
            d_i, d_j, d_a, d_b = (np.asarray(st[k], np.int64)
                                  for k in ("d_i", "d_j", "d_a", "d_b"))
            base = (d_i * N + d_j) * N
            tabs["d_ijab"] = ((base + d_a) * N + d_b).astype(np.int32)
            tabs["d_ijba"] = ((base + d_b) * N + d_a).astype(np.int32)
            tabs["d_phase"] = f(st["d_phase"])
        else:
            tabs["d_ijab"] = np.zeros(0, np.int32)
            tabs["d_ijba"] = np.zeros(0, np.int32)
            tabs["d_phase"] = np.zeros(0, dtype=dtype)
        cache[key] = tabs
        return tabs

    # -- simulation ----------------------------------------------------------
    def project_full(self, vec_full: np.ndarray) -> np.ndarray:
        """Project a full 2^N vector onto the sector basis (host helper for
        initial states); returns shape (nd + 1,) with the padding slot.
        Raises if the vector has support outside the sector."""
        vec_full = np.asarray(vec_full)
        v = vec_full[self.dets]
        if not np.isclose(float(v @ v), float(vec_full @ vec_full),
                          atol=1e-9):
            raise ValueError(
                "initial state has support outside the particle-number "
                "sector — sector simulation is invalid for it")
        return np.concatenate([v, [0.0]])

    def apply(self, v0: jnp.ndarray, theta: jnp.ndarray,
              tables=None) -> jnp.ndarray:
        """Apply the UCC rotations to sector amplitudes v0 (shape nd + 1,
        trailing padding slot).

        With `tables` (a device_tables() pytree passed into the enclosing
        jitted program as an argument), the gate fields are program inputs
        instead of constants and the VJP is the reversible analytic one
        (_apply_rev: O(1) residual memory, no scatters).

        Gather-only formulation: each excitation rotation is
          v' = (1 + (cos th - 1)*|S|) * v  +  S * sin(th) * v[PARTNER]
        with the per-gate partner-index and sign fields precomputed (S in
        {0, +-1}; untouched entries have S = 0, PARTNER = identity).  One
        dense gather + FMAs per gate — no scatters anywhere in the
        simulation (scatters are the latency bottleneck on TPU).

        The scan is unrolled (several gates per loop iteration): each
        step's body is a few-microsecond gather+FMA, so the K-step scan
        is bound by per-iteration loop overhead, not compute — unrolling
        is exact (same sequential gate order) and cuts that overhead by
        the unroll factor.  Bounded so the compiled body stays small."""
        dtype = theta.dtype
        v0 = v0.astype(dtype)
        if self.kernel == "strings" and (tables is None
                                         or "PA" in tables):
            st = self._str_tabs
            nA, nB = len(st.A), len(st.B)
            tabs = tables if tables is not None else st._asdict()
            V0 = v0[: self.dim].reshape(nB, nA)
            V = _strings.apply_gates(V0, theta, tabs)
            return jnp.concatenate(
                [V.reshape(-1), jnp.zeros(1, dtype=dtype)])
        if tables is not None:
            return _apply_rev(v0, theta, tables["PARTNER"],
                              tables["SFIELD"])
        PARTNER = jnp.asarray(self._PARTNER)
        SFIELD = jnp.asarray(self._SFIELD, dtype=dtype)
        K = int(theta.shape[0])

        def gate(v, xs):
            partner, sfield, th = xs
            return _gate_step(v, partner, sfield, th), None

        v, _ = jax.lax.scan(gate, v0, (PARTNER, SFIELD, theta),
                            unroll=min(8, max(K, 1)))
        return v

    def state(self, theta: jnp.ndarray, tables=None) -> jnp.ndarray:
        """Sector amplitudes of the compiled circuit (HF initial state)
        after the UCC rotations; shape (nd + 1,)."""
        v0 = jnp.zeros(self.dim + 1,
                       dtype=theta.dtype).at[self.init_index].set(1.0)
        return self.apply(v0, theta, tables=tables)

    def to_full(self, v: jnp.ndarray) -> jnp.ndarray:
        """Scatter sector amplitudes into the full 2^N statevector."""
        full = jnp.zeros(2 ** self.num_qubits, dtype=v.dtype)
        return full.at[jnp.asarray(self.dets)].set(v[: self.dim])

    def full_state(self, theta: jnp.ndarray) -> jnp.ndarray:
        return self.to_full(self.state(theta))

    # -- sector Hamiltonian ----------------------------------------------------
    def build_values(self, h_so: jnp.ndarray, g_so: jnp.ndarray,
                     tables=None):
        """Nonzero Slater-Condon values of the sector Hamiltonian from
        spin-orbital (h, g) in the package convention E = sum h*gamma +
        sum g*Gamma (g = 1/2 physicist): (diag (nd,), s_val, d_val) for
        the precomputed singles/doubles index pairs.  Pure jnp on host
        structure — safe inside jit, so the fused OptOrb programs rebuild
        the values from rotated integrals on device.  O(nnz) storage, no
        dense (nd, nd) matrix and no scatter.

        With `tables` the index fields arrive as program arguments
        (flat-index gathers into h/C/g) instead of baked constants.

        With the string kernel active (self.kernel == 'strings') this
        returns the sigma-operator pytree of sim/strings.py instead of
        the Slater-Condon value triple — quadform_values dispatches on
        the pytree type, so callers thread it opaquely either way; the
        pairwise triple remains available via build_values_pairs."""
        if self.kernel == "strings" and (tables is None
                                         or "MA" in tables):
            tabs = (tables if tables is not None
                    else self._str_tabs._asdict())
            return _strings.build_ops(h_so, g_so, tabs)
        return self.build_values_pairs(h_so, g_so, tables=tables)

    def build_values_pairs(self, h_so: jnp.ndarray, g_so: jnp.ndarray,
                           tables=None):
        """The Slater-Condon value triple (diag, s_val, d_val) for the
        pairwise kernels (oracle / fallback path of build_values)."""
        st = self._sc
        dtype = h_so.dtype
        h = h_so
        g = g_so
        hdiag = jnp.diagonal(h)
        J = 2.0 * (jnp.einsum("pqpq->pq", g) - jnp.einsum("pqqp->pq", g))
        if tables is not None:
            N = self.num_qubits
            occf = tables["occf"]
            diag = occf @ hdiag + 0.5 * jnp.einsum("mp,pq,mq->m",
                                                   occf, J, occf)
            C = 2.0 * (jnp.einsum("prqr->pqr", g)
                       - jnp.einsum("prrq->pqr", g))
            Air = C.reshape(N * N, N)[tables["s_lin"]]
            s_val = (h.reshape(-1)[tables["s_lin"]]
                     + jnp.sum(Air * tables["s_common"], axis=1)) \
                * tables["s_phase"]
            gf = g.reshape(-1)
            d_val = 2.0 * (gf[tables["d_ijab"]] - gf[tables["d_ijba"]]) \
                * tables["d_phase"]
            return diag, s_val, d_val
        occf = jnp.asarray(st["occf"], dtype=dtype)
        diag = occf @ hdiag + 0.5 * jnp.einsum("mp,pq,mq->m", occf, J, occf)
        s_val = jnp.zeros((0,), dtype=dtype)
        d_val = jnp.zeros((0,), dtype=dtype)
        if len(st["su"]):
            i_idx = jnp.asarray(st["s_i"])
            a_idx = jnp.asarray(st["s_a"])
            C = 2.0 * (jnp.einsum("prqr->pqr", g) - jnp.einsum("prrq->pqr", g))
            Air = C[i_idx, a_idx]
            s_val = (h[i_idx, a_idx]
                     + jnp.sum(Air * jnp.asarray(st["s_common"], dtype=dtype),
                               axis=1)) * jnp.asarray(st["s_phase"],
                                                      dtype=dtype)
        if len(st["du"]):
            i_idx = jnp.asarray(st["d_i"])
            j_idx = jnp.asarray(st["d_j"])
            a_idx = jnp.asarray(st["d_a"])
            b_idx = jnp.asarray(st["d_b"])
            d_val = 2.0 * (g[i_idx, j_idx, a_idx, b_idx]
                           - g[i_idx, j_idx, b_idx, a_idx]) \
                * jnp.asarray(st["d_phase"], dtype=dtype)
        return diag, s_val, d_val

    def build_hamiltonian(self, h_so: jnp.ndarray,
                          g_so: jnp.ndarray) -> jnp.ndarray:
        """Dense sector Hamiltonian (small-nd oracle; the production
        energy path is the scatter-free quadform over build_values)."""
        st = self._sc
        nd = self.dim
        dtype = h_so.dtype
        diag, s_val, d_val = self.build_values_pairs(h_so, g_so)
        H = jnp.zeros((nd, nd), dtype=dtype)
        H = H.at[jnp.arange(nd), jnp.arange(nd)].set(diag)
        if len(st["su"]):
            su = jnp.asarray(st["su"])
            sv = jnp.asarray(st["sv"])
            H = H.at[su, sv].set(s_val)
            H = H.at[sv, su].set(s_val)
        if len(st["du"]):
            du = jnp.asarray(st["du"])
            dv = jnp.asarray(st["dv"])
            H = H.at[du, dv].set(d_val)
            H = H.at[dv, du].set(d_val)
        return H

    def _row_tables(self):
        """Padded per-determinant neighbor tables for the gather-only
        H·v kernel, cached: (VIDX, PTN), both (nd, maxdeg) int32.  Row i
        lists every determinant j with H[i, j] != 0 — PTN[i, k] = j and
        VIDX[i, k] indexes the pair's slot in concat([s_val, d_val])
        (each unordered pair appears in both rows).  Padding points VIDX
        at a zero value slot and PTN at the v padding slot."""
        cached = getattr(self, "_row_tabs", None)
        if cached is not None:
            return cached
        st = self._sc
        nd = self.dim
        su = np.asarray(st["su"], dtype=np.int64)
        sv = np.asarray(st["sv"], dtype=np.int64)
        du = np.asarray(st["du"], dtype=np.int64)
        dv = np.asarray(st["dv"], dtype=np.int64)
        ns, ndbl = len(su), len(du)
        rows = np.concatenate([su, sv, du, dv])
        cols = np.concatenate([sv, su, dv, du])
        vslot = np.concatenate([np.arange(ns), np.arange(ns),
                                ns + np.arange(ndbl), ns + np.arange(ndbl)])
        deg = np.bincount(rows, minlength=nd) if len(rows) else \
            np.zeros(nd, dtype=np.int64)
        maxdeg = int(deg.max()) if len(rows) else 0
        VIDX = np.full((nd, maxdeg), ns + ndbl, dtype=np.int32)
        PTN = np.full((nd, maxdeg), nd, dtype=np.int32)
        if len(rows):
            order = np.argsort(rows, kind="stable")
            rows, cols, vslot = rows[order], cols[order], vslot[order]
            starts = np.zeros(nd + 1, dtype=np.int64)
            np.cumsum(deg, out=starts[1:])
            pos = np.arange(len(rows)) - starts[rows]
            VIDX[rows, pos] = vslot
            PTN[rows, pos] = cols
        self._row_tabs = (VIDX, PTN)
        return self._row_tabs

    def _quadform_fn(self):
        """The gather-only <v|H|v> with an analytic custom VJP, cached.

        Forward: Hv[i] = diag[i] v[i] + sum_k VAL[i,k] v[PTN[i,k]] via
        the row tables — gathers only.  Backward: grad_v = 2 ct * Hv
        (H symmetric), grad_diag = ct v^2, grad_val = 2 ct v[u] v[w] —
        also gathers only.  This exists because autodiff of the naive
        pairwise quadform emits the VJP of ~nnz constant-index gathers
        as one giant constant-index scatter-add, which XLA compiles
        pathologically slowly at N>=16 scale (the round-3 suspect for
        the sector-program worker kill; cf. the rdm-table gather rewrite
        in fc8ff7b / CLAUDE.md gotchas)."""
        cached = getattr(self, "_qf_fn", None)
        if cached is not None:
            return cached
        st = self._sc
        nd = self.dim
        VIDX, PTN = self._row_tables()
        su, sv = np.asarray(st["su"]), np.asarray(st["sv"])
        du, dv = np.asarray(st["du"]), np.asarray(st["dv"])

        def hv(v_pad, diag, s_val, d_val):
            vals = jnp.concatenate(
                [s_val, d_val, jnp.zeros(1, dtype=v_pad.dtype)])
            return diag * v_pad[:nd] + jnp.sum(
                vals[jnp.asarray(VIDX)] * v_pad[jnp.asarray(PTN)], axis=1)

        @jax.custom_vjp
        def qf(v_pad, diag, s_val, d_val):
            return jnp.dot(v_pad[:nd], hv(v_pad, diag, s_val, d_val))

        def qf_fwd(v_pad, diag, s_val, d_val):
            w = hv(v_pad, diag, s_val, d_val)
            return jnp.dot(v_pad[:nd], w), (v_pad, w)

        def qf_bwd(res, ct):
            v_pad, w = res
            v = v_pad[:nd]
            pad = v_pad.shape[0] - nd
            g_v = jnp.concatenate(
                [2.0 * ct * w, jnp.zeros(pad, dtype=w.dtype)])
            g_diag = ct * v * v
            g_s = 2.0 * ct * v[jnp.asarray(su)] * v[jnp.asarray(sv)] \
                if len(su) else jnp.zeros(0, dtype=w.dtype)
            g_d = 2.0 * ct * v[jnp.asarray(du)] * v[jnp.asarray(dv)] \
                if len(du) else jnp.zeros(0, dtype=w.dtype)
            return g_v, g_diag, g_s, g_d

        qf.defvjp(qf_fwd, qf_bwd)
        self._qf_fn = qf
        return qf

    def quadform_values(self, v: jnp.ndarray, vals,
                        tables=None) -> jnp.ndarray:
        """<v|H|v> from a build_values pytree — dispatches on its type:
        a sigma-operator dict runs the string GEMM kernel
        (sim/strings.py); the Slater-Condon triple runs the gather-only
        row kernel with analytic VJP (see _quadform_fn); with `tables`
        the row/pair tables are program arguments (_qf_tabled)."""
        if isinstance(vals, dict):
            st = self._str_tabs
            tabs = (tables if tables is not None and "MA" in tables
                    else st._asdict())
            V = v[: self.dim].reshape(len(st.B), len(st.A))
            return _strings.quadform(V, vals, tabs)
        diag, s_val, d_val = vals
        if tables is not None:
            return _qf_tabled(v, diag, s_val, d_val,
                              tables["VIDX"], tables["PTN"],
                              tables["SU"], tables["SV"],
                              tables["DU"], tables["DV"])
        return self._quadform_fn()(v, diag, s_val, d_val)

    def _quadform_pairs(self, v: jnp.ndarray, vals) -> jnp.ndarray:
        """Pairwise-sum quadform (autodiff oracle for quadform_values;
        its VJP scatters, so it stays off the N>=16 hot path)."""
        st = self._sc
        diag, s_val, d_val = vals
        v = v[: self.dim]
        e = jnp.sum(diag * v * v)
        if len(st["su"]):
            e = e + 2.0 * jnp.sum(
                s_val * v[jnp.asarray(st["su"])] * v[jnp.asarray(st["sv"])])
        if len(st["du"]):
            e = e + 2.0 * jnp.sum(
                d_val * v[jnp.asarray(st["du"])] * v[jnp.asarray(st["dv"])])
        return e

    def energy_values(self, theta: jnp.ndarray, vals,
                      tables=None) -> jnp.ndarray:
        return self.quadform_values(self.state(theta, tables=tables), vals,
                                    tables=tables)

    def quadform(self, v: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
        """<v|H|v> for a (possibly padded) sector vector."""
        v = v[: self.dim]
        return v @ (H @ v)

    def energy(self, theta: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
        return self.quadform(self.state(theta), H)

    # -- sector-native RDMs ----------------------------------------------------
    def _rdm_tables(self):
        """Pure-gather tables for W[a,b] = a+_a a_b |v> over same-spin
        ordered pairs (the only pairs that keep a fixed-(na,nb) state in
        its own sector), cached on first use.  Returns (SRC, SG): both
        (N*N, nd), W = SG * v_padded[SRC] — a single gather, no scatter
        (scatters with large constant index sets compile poorly on XLA).
        Cross-spin rows point every entry at the zero padding slot."""
        cached = getattr(self, "_rdm_tabs", None)
        if cached is not None:
            return cached
        N = self.num_qubits
        n = N // 2
        dets = self.dets
        nd = self.dim
        idx = np.arange(nd, dtype=np.int32)
        SRC = np.full((N * N, nd), nd, dtype=np.int32)   # pad slot -> 0.0
        SG = np.zeros((N * N, nd), dtype=np.float64)
        for sig in (0, 1):
            lo, hi = sig * n, sig * n + n
            for a in range(lo, hi):
                for b in range(lo, hi):
                    row = a * N + b
                    if a == b:
                        SRC[row] = idx
                        SG[row] = ((dets >> a) & 1).astype(np.float64)
                        continue
                    # a+_a a_b vectorized over the domain (b occ, a empty),
                    # JW phases as in initializations.ci.excite
                    dom = (((dets >> b) & 1) == 1) & (((dets >> a) & 1) == 0)
                    src = idx[dom]
                    d0 = dets[dom]
                    s1 = 1.0 - 2.0 * (_bitcount(d0 & ((1 << b) - 1)) & 1)
                    d1 = d0 & ~(1 << b)
                    s2 = 1.0 - 2.0 * (_bitcount(d1 & ((1 << a) - 1)) & 1)
                    dst = np.searchsorted(dets, d1 | (1 << a))
                    SRC[row, dst] = src
                    SG[row, dst] = s1 * s2
        tabs = (SRC, SG)
        self._rdm_tabs = tabs
        return tabs

    def rdms(self, v: jnp.ndarray,
             tables=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Spin-orbital (gamma, Gamma) directly from sector amplitudes —
        never touching the 2^N space (the full-space path builds N^2/2
        annihilated copies of the 2^N statevector, sim/rdm.py).
        With `tables`, the (N^2, nd) gather tables are program arguments.

        Method: W[a,b] = a+_a a_b v for same-spin (a,b); then
          gamma[p,q]      = v . W[p,q]
          Gamma[p,q,r,s]  = <W[r,p], W[q,s]> - delta_qr gamma[p,s]
        (from a+_p a+_q a_s a_r = (a+_p a_r)(a+_q a_s) - delta_qr a+_p a_s),
        exact for the sigma(p)=sigma(r), sigma(q)=sigma(s) blocks; the
        remaining S_z-allowed blocks (sigma(p)=sigma(s) != sigma(q)=sigma(r))
        follow by operator antisymmetry Gamma[p,q,r,s] = -Gamma[p,q,s,r].
        Equality with one_rdm/two_rdm of the scattered full state is
        enforced by tests/test_sector.py."""
        N = self.num_qubits
        nd = self.dim
        dtype = v.dtype
        if self.kernel == "strings" and (tables is None
                                         or "MA" in tables):
            # string path: GEMMs + one (P, P)-matrix gather
            # (sim/strings.py rdms) instead of the (N^2, nd) tables
            st = self._str_tabs
            tabs = tables if tables is not None else st._asdict()
            # maps depend on the operator-axis length of the MA stack,
            # which mesh-sharded table placements zero-pad (parallel.
            # shard_sector_tables) — cache per padded length
            q_pad = int(tabs["MA"].shape[0])
            cache = getattr(self, "_rdm_maps", None)
            if cache is None:
                cache = self._rdm_maps = {}
            maps = cache.get(q_pad)
            if maps is None:
                maps = cache[q_pad] = _strings.build_rdm_maps(
                    N // 2, q_pad=q_pad)
            V = v[:nd].reshape(len(st.B), len(st.A))
            return _strings.rdms(V, tabs, maps)
        v = v[:nd]
        vp = jnp.concatenate([v, jnp.zeros(1, dtype=dtype)])
        if tables is not None:
            W = tables["rdm_SG"] * vp[tables["rdm_SRC"]]
        else:
            SRC, SG = self._rdm_tables()
            W = jnp.asarray(SG, dtype=dtype) * vp[jnp.asarray(SRC)]

        gamma = (W @ v).reshape(N, N)
        Q4 = (W @ W.T).reshape(N, N, N, N)          # Q4[r, p, q, s]
        eye = jnp.eye(N, dtype=dtype)
        Gamma_c = (jnp.transpose(Q4, (1, 2, 0, 3))
                   - jnp.einsum("qr,ps->pqrs", eye, gamma))

        spin = (np.arange(N) >= N // 2).astype(np.int64)
        sp, sq = spin[:, None, None, None], spin[None, :, None, None]
        sr, ss = spin[None, None, :, None], spin[None, None, None, :]
        case1 = jnp.asarray((sp == sr) & (sq == ss))
        case2 = jnp.asarray((sp == ss) & (sq == sr))
        Gamma = jnp.where(
            case1, Gamma_c,
            jnp.where(case2, -jnp.transpose(Gamma_c, (0, 1, 3, 2)),
                      jnp.zeros((), dtype=dtype)))
        return gamma, Gamma

    def transition_rdm1(self, u: jnp.ndarray, v: jnp.ndarray,
                        tables=None) -> jnp.ndarray:
        """Spin-orbital transition 1-RDM gamma[p, s] = <u|a+_p a_s|v>
        between sector states (e.g. SSVQE/MCVQE eigenstates via
        self.state(theta_k)) — the one-body input to transition dipoles
        / oscillator strengths (chem.properties.transition_dipoles).
        String kernel only (every product-grid sector); u may be
        batched (k, nd) -> (k, N, N).  Vectors may carry the +1 pad
        slot of `state`."""
        if self.kernel != "strings":
            raise ValueError(
                "transition_rdm1 requires the string kernel (product-"
                "grid sector); this sector fell back to 'pairs'")
        st = self._str_tabs
        tabs = tables if tables is not None else st._asdict()
        nB, nA = len(st.B), len(st.A)
        nd = self.dim
        u = jnp.asarray(u)
        U = (u[:, :nd].reshape(-1, nB, nA) if u.ndim == 2
             else u[:nd].reshape(nB, nA))
        V = jnp.asarray(v)[:nd].reshape(nB, nA)
        return _strings.transition_rdm1(U, V, tabs)


class SectorCI:
    """Gate-free determinant sector: the string-factorized sigma/RDM/
    diagonal kernels over the FULL (na, nb) sector, with no circuit at
    all — the operator backbone for exact active-space diagonalization
    (CASCI) inside the OptOrb outer loop (FusedOptOrbCASSCF).

    Exposes the same table/kernel surface the fused programs thread for
    SectorUCC (device_tables / build_values / quadform_values / rdms /
    kernel == 'strings'), so parallel.shard_sector_tables and the
    tables-as-arguments plumbing work unchanged, plus

      sigma_values(V, vals, tables=None)  -> H @ V on the string grid
      diagonal_values(vals, tables=None)  -> exact diag(H) over the grid
      hf_matrix(dtype)                    -> HF unit vector as (nB, nA)

    No reference counterpart (the reference has no exact-diagonalization
    eigensolver; its closest object is the FCI initializer,
    configuration_interaction_states.py) — this is the TPU-native upper
    baseline for every OptOrb* solver.
    """

    def __init__(self, num_spin_orbitals: int,
                 num_particles: Tuple[int, int]):
        N = num_spin_orbitals
        n = N // 2
        na, nb = num_particles
        self.num_qubits = N
        self.num_particles = (int(na), int(nb))
        dets = np.asarray(
            enumerate_determinants(N, (na, nb), max_excitation=na + nb),
            dtype=np.int64)
        self.dets = dets
        self.dim = len(dets)
        # full sector over both spins is always a product grid
        self._str_tabs = _strings.build_string_tables(dets, n, [], [], [])
        self.kernel = "strings"
        self.nA = len(self._str_tabs.A)
        self.nB = len(self._str_tabs.B)
        hf_mask = ((1 << na) - 1) | (((1 << nb) - 1) << n)
        self.init_index = int(np.searchsorted(dets, hf_mask))
        self._dev_tabs = {}
        self._rdm_maps = {}
        self._content_key = ("SectorCI", N, (int(na), int(nb)))

    def __hash__(self):
        return hash(self._content_key)

    def __eq__(self, other):
        return (type(other) is SectorCI
                and other._content_key == self._content_key)

    def device_tables(self, dtype=None, storage: str = "dense") -> dict:
        """Host tables pytree (see SectorUCC.device_tables); the gate
        tables are empty here — only the operator stacks and pair maps.

        storage='compact' keeps the operator stacks int8 (keys
        "MA8"/"MB8", entries are JW signs in {0, +-1}) and routes every
        kernel to the operator-chunked variants (strings.py compact
        section) — the single-chip HBM path past nd ~ 1M (H8 N=32:
        1.7 GB stacks vs 13.6 GB dense f64, T halves streamed).

        storage='int8' keeps the stacks int8 under the DENSE keys
        ("MA"/"MB"): the dense kernel graph runs unchanged with an
        on-device cast — the mesh-sharded large-sector placement, where
        GSPMD casts only the per-device shard (see
        parallel.shard_sector_tables(storage='compact'))."""
        dtype = np.dtype(dtype if dtype is not None else np.float64)
        key = (dtype.name, storage)
        if key in self._dev_tabs:
            return self._dev_tabs[key]
        s = self._str_tabs
        if storage == "compact":
            tabs = _strings.compact_tables(s, dtype)
        elif storage in ("dense", "int8"):
            f = lambda a: np.asarray(a, dtype=dtype)
            fm = (lambda a: np.asarray(a, dtype=np.int8)) \
                if storage == "int8" else f
            tabs = dict(MA=fm(s.MA), MB=fm(s.MB),
                        LIN_A=s.LIN_A, LIN_B=s.LIN_B, CROSS=f(s.CROSS))
        else:
            raise ValueError(
                "storage must be 'dense', 'compact', or 'int8'")
        self._dev_tabs[key] = tabs
        return tabs

    def _tabs(self, tables):
        return tables if tables is not None else self.device_tables()

    def hf_matrix(self, dtype) -> jnp.ndarray:
        """The Hartree-Fock determinant as a unit (nB, nA) string matrix
        (the Davidson starting vector)."""
        v = jnp.zeros(self.nB * self.nA, dtype=dtype)
        return v.at[self.init_index].set(1.0).reshape(self.nB, self.nA)

    def build_values(self, h_so: jnp.ndarray, g_so: jnp.ndarray,
                     tables=None):
        """Sigma-operator pytree from spin-orbital integrals (package
        convention E = sum h gamma + sum g Gamma); pure jnp, jit-safe."""
        return _strings.build_ops(h_so, g_so, self._tabs(tables))

    def sigma_values(self, V: jnp.ndarray, vals, tables=None):
        return _strings.sigma(V, vals, self._tabs(tables))

    def quadform_values(self, V: jnp.ndarray, vals, tables=None):
        return _strings.quadform(V, vals, self._tabs(tables))

    def diagonal_values(self, vals, tables=None):
        return _strings.diagonal(vals, self._tabs(tables))

    def rdms(self, V: jnp.ndarray, tables=None):
        """Spin-orbital (gamma, Gamma) from a normalized (nB, nA) string
        matrix (strings.rdms)."""
        tabs = self._tabs(tables)
        q_pad = int(tabs["MA8" if "MA8" in tabs else "MA"].shape[0])
        maps = self._rdm_maps.get(q_pad)
        if maps is None:
            maps = self._rdm_maps[q_pad] = _strings.build_rdm_maps(
                self.num_qubits // 2, q_pad=q_pad)
        return _strings.rdms(V, tabs, maps)

    def transition_rdm1(self, U: jnp.ndarray, V: jnp.ndarray,
                        tables=None) -> jnp.ndarray:
        """Spin-orbital transition 1-RDM gamma[p, s] = <u|a+_p a_s|v>
        between sector states; U may be batched (k, nB, nA) -> (k, N, N)
        with one T build against the whole bra stack.
        transition_rdm1(v, v) equals rdms(v)[0] (strings.transition_rdm1;
        brute-force Slater-Condon oracle: tests/test_properties.py)."""
        return _strings.transition_rdm1(U, V, self._tabs(tables))

    def to_full(self, V: jnp.ndarray) -> jnp.ndarray:
        """Scatter a (nB, nA) string matrix into the 2^N statevector."""
        full = jnp.zeros(2 ** self.num_qubits, dtype=V.dtype)
        return full.at[jnp.asarray(self.dets)].set(V.reshape(-1))
