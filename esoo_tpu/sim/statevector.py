"""JAX statevector simulation engine.

TPU-native replacement for the Qiskit Aer C++ statevector simulator the
reference leans on for every cost evaluation and RDM measurement
(Estimator(approximation=True), tests/test_optorbvqe.py:23).  Everything is
expressed as gathers, sign flips and small contractions so circuits compile
to a single XLA executable per (circuit structure), with parameters as the
only runtime input — vmap-able over parameter batches.

Pauli-string operations use the bitmask identities (see ops/pauli.py):
  (P s)[c] = i^y * (-1)^{popcount((c^x) & z)} * s[c ^ x]

REAL-PATH DESIGN NOTE (TPU).  The TPU backend here exposes f32/f64 but no
complex dtypes, and none are needed for the framework's hot path: HF
preparation, RY/CX/CZ/H layers, and JW-mapped UCC excitation rotations (whose
Pauli strings always carry an odd Y count) are all real-orthogonal in the
computational basis.  Circuits built from that gate set are simulated with a
REAL statevector:

  exp(-i a/2 P) s = cos(a/2) s + f * sin(a/2) * sign ⊙ s[perm],
  f = +1 if |x&z| % 4 == 1 else -1          (odd-Y Pauli, real state)

and Hermitian Pauli expectations only receive contributions from even-Y
terms.  Circuits outside the real-safe set use the complex path (runs on
CPU backend; TPU lacks complex support).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import complex_dtype, real_dtype
from .circuit import QuantumCircuit

# ---------------------------------------------------------------------------
# primitive state operations
# ---------------------------------------------------------------------------


def zero_state(num_qubits: int, dtype=None) -> jnp.ndarray:
    dtype = dtype or complex_dtype()
    s = jnp.zeros(1 << num_qubits, dtype=dtype)
    return s.at[0].set(1.0)


def basis_state(num_qubits: int, index: int, dtype=None) -> jnp.ndarray:
    dtype = dtype or complex_dtype()
    s = jnp.zeros(1 << num_qubits, dtype=dtype)
    return s.at[index].set(1.0)


def apply_x_mask(state: jnp.ndarray, mask: int) -> jnp.ndarray:
    """Product of X gates given by `mask` (a permutation of amplitudes)."""
    idx = jnp.arange(state.shape[0])
    return state[idx ^ mask]


def pauli_action(state: jnp.ndarray, x: int, z: int, y: int) -> jnp.ndarray:
    """Apply letter-Pauli P(x, z) (with i^y phase for the Y's)."""
    idx = jnp.arange(state.shape[0])
    perm = idx ^ x
    par = jax.lax.population_count(perm & z) & 1
    sign = (1 - 2 * par).astype(state.dtype)
    return ((1j) ** (y % 4)) * sign * state[perm]


def apply_pauli_rotation(state, x: int, z: int, y: int, angle) -> jnp.ndarray:
    """exp(-i angle/2 P) |state>  =  cos(a/2) s  - i sin(a/2) P s."""
    c = jnp.cos(angle / 2).astype(state.dtype)
    s = jnp.sin(angle / 2).astype(state.dtype)
    if jnp.issubdtype(state.dtype, jnp.floating):
        if y % 2 == 0:
            raise ValueError("even-Y Pauli rotation leaves the real subspace")
        f = 1.0 if y % 4 == 1 else -1.0
        idx = jnp.arange(state.shape[0])
        perm = idx ^ x
        par = jax.lax.population_count(perm & z) & 1
        sign = (1 - 2 * par).astype(state.dtype)
        return c * state + (f * s) * sign * state[perm]
    return c * state - 1j * s * pauli_action(state, x, z, y)


def apply_1q(state: jnp.ndarray, U: jnp.ndarray, q: int) -> jnp.ndarray:
    dim = state.shape[0]
    lo = 1 << q
    hi = dim // (2 * lo)
    sr = state.reshape(hi, 2, lo)
    out = jnp.einsum("ij,hjl->hil", U.astype(state.dtype), sr)
    return out.reshape(dim)


def apply_2q(state: jnp.ndarray, U4: jnp.ndarray, qa: int, qb: int) -> jnp.ndarray:
    """Apply a 4x4 unitary on qubits (qa, qb); row index order (qa, qb)."""
    n = int(round(math.log2(state.shape[0])))
    st = state.reshape((2,) * n)
    axa, axb = n - 1 - qa, n - 1 - qb
    Ur = U4.reshape(2, 2, 2, 2).astype(state.dtype)
    out = jnp.tensordot(Ur, st, axes=[[2, 3], [axa, axb]])
    # result axes: (qa_out, qb_out, remaining...) -> move back into place
    out = jnp.moveaxis(out, [0, 1], [axa, axb])
    return out.reshape(-1)


@jax.jit
def pauli_quadforms(state, xs, zs) -> jnp.ndarray:
    """q_k = sum_c conj(s[c]) * sign_k[c] * s[c ^ x_k]   (no i^y phase).

    <s|P_k|s> = i^{y_k} * q_k.  For real states this is a pure-real kernel,
    so the phase application happens on the host (see expectation_pauli).
    """
    idx = jnp.arange(state.shape[0])

    def one(x, z):
        perm = idx ^ x
        par = jax.lax.population_count(perm & z) & 1
        sign = (1 - 2 * par).astype(state.dtype)
        return jnp.sum(jnp.conj(state) * sign * state[perm])

    return jax.vmap(one)(jnp.asarray(xs), jnp.asarray(zs))


def expectation_pauli(state, xs, zs, ys, coeffs):
    """<state| sum_k coeffs[k] P_k |state> (complex host scalar)."""
    q = np.asarray(pauli_quadforms(state, jnp.asarray(xs), jnp.asarray(zs)))
    phases = np.power(1j, np.asarray(ys) % 4)
    return complex(np.sum(np.asarray(coeffs) * phases * q))


# ---------------------------------------------------------------------------
# gate matrices
# ---------------------------------------------------------------------------

_SQ2 = 1.0 / math.sqrt(2.0)

_CONST_1Q = {
    "x": np.array([[0, 1], [1, 0]], dtype=np.complex128),
    "y": np.array([[0, -1j], [1j, 0]], dtype=np.complex128),
    "z": np.array([[1, 0], [0, -1]], dtype=np.complex128),
    "h": np.array([[_SQ2, _SQ2], [_SQ2, -_SQ2]], dtype=np.complex128),
    "s": np.array([[1, 0], [0, 1j]], dtype=np.complex128),
    "sdg": np.array([[1, 0], [0, -1j]], dtype=np.complex128),
    "t": np.array([[1, 0], [0, np.exp(1j * math.pi / 4)]], dtype=np.complex128),
}


def _rot_1q(name: str, angle):
    cd = complex_dtype()
    c = jnp.cos(angle / 2).astype(cd)
    s = jnp.sin(angle / 2).astype(cd)
    if name == "rx":
        return jnp.stack([jnp.stack([c, -1j * s]), jnp.stack([-1j * s, c])])
    if name == "ry":
        return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    if name == "rz":
        e = jnp.exp(-0.5j * angle).astype(cd)
        return jnp.diag(jnp.stack([e, jnp.conj(e)]))
    if name == "p":
        one = jnp.asarray(1.0, dtype=cd)
        return jnp.diag(jnp.stack([one, jnp.exp(1j * angle).astype(cd)]))
    raise ValueError(name)


_CONST_2Q = {
    # row/col basis order |qa qb> = |00>,|01>,|10>,|11> with qa the first index
    "cx": np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                   dtype=np.complex128),
    "cz": np.diag([1, 1, 1, -1]).astype(np.complex128),
    "cy": np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, -1j], [0, 0, 1j, 0]],
                   dtype=np.complex128),
    "swap": np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                     dtype=np.complex128),
}


def _ctrl(U2):
    out = jnp.eye(4, dtype=complex_dtype())
    return out.at[2:, 2:].set(U2)


# ---------------------------------------------------------------------------
# circuit compilation
# ---------------------------------------------------------------------------


_REAL_SAFE_1Q = {"x", "z", "h"}
_REAL_SAFE_2Q = {"cx", "cz", "swap"}


def _circuit_is_real(gates) -> bool:
    """True iff every gate maps real statevectors to real statevectors."""
    for gt in gates:
        name = gt.name
        if name in _REAL_SAFE_1Q or name in _REAL_SAFE_2Q or name in ("ry", "cry"):
            continue
        if name == "prot":
            if gt.data[2] % 2 == 1:  # odd Y count: real rotation
                continue
            return False
        if name == "init_sv":
            if np.allclose(np.imag(gt.data[0]), 0.0):
                continue
            return False
        return False
    return True


def _ry_real(angle, dtype):
    c = jnp.cos(angle / 2).astype(dtype)
    s = jnp.sin(angle / 2).astype(dtype)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def _angle_value(expr, params):
    if expr[0] == "const":
        return expr[1]
    _, idx, mult, off = expr
    return mult * params[idx] + off


_SCAN_THRESHOLD = 48


def _prot_scan_arrays(gates):
    """Stack a run of 'prot' gates into arrays for lax.scan."""
    xs = np.array([g.data[0] for g in gates], dtype=np.int64)
    zs = np.array([g.data[1] for g in gates], dtype=np.int64)
    ys = np.array([g.data[2] for g in gates], dtype=np.int64)
    idx = np.zeros(len(gates), dtype=np.int32)
    mult = np.zeros(len(gates))
    off = np.zeros(len(gates))
    for k, g in enumerate(gates):
        if g.angle[0] == "param":
            _, i, m, o = g.angle
            idx[k], mult[k], off[k] = i, m, o
        else:
            idx[k], mult[k], off[k] = 0, 0.0, g.angle[1]
    return xs, zs, ys, idx, mult, off


# reverse-mode through a K-step gate scan stores one (dim,) residual per
# step; past this element budget (K*dim) the scan switches to sqrt(K)
# chunks with jax.checkpoint (remat), cutting residual memory from K*dim
# to ~2*sqrt(K)*dim at the cost of one extra forward pass in the backward.
# Root cause of the H8 m=112 -> N=16 worker fault: the 2696-gate UCCSD on
# a 65536-dim state made every L-BFGS gradient materialize ~0.7 GB of
# residuals (scripts/bisect_n16_fault.py: full_lbfgs_n16 crashed with NO
# transform involved); N=12 was 14 MB and ran fine.
_REMAT_RESIDUAL_BUDGET = 1 << 23


def _scan_gates(step, state, ops):
    """lax.scan over gate ops, with sqrt-K remat chunking past the
    residual budget.  Identical numerics either way (same op order; pad
    ops are exact identities: angle 0 -> cos 1, sin 0)."""
    K = int(ops[0].shape[0])
    dim = int(state.shape[0])
    if K * dim <= _REMAT_RESIDUAL_BUDGET:
        state, _ = jax.lax.scan(step, state, ops)
        return state
    cs = max(1, int(math.isqrt(K)))
    nc = -(-K // cs)
    pad = nc * cs - K
    if pad:
        x, z, fp, i, m, o = ops
        ops = (jnp.concatenate([x, jnp.zeros(pad, x.dtype)]),
               jnp.concatenate([z, jnp.zeros(pad, z.dtype)]),
               jnp.concatenate([fp, jnp.ones(pad, fp.dtype)]),
               jnp.concatenate([i, jnp.zeros(pad, i.dtype)]),
               jnp.concatenate([m, jnp.zeros(pad, m.dtype)]),
               jnp.concatenate([o, jnp.zeros(pad, o.dtype)]))
    ops_c = tuple(op.reshape((nc, cs) + op.shape[1:]) for op in ops)

    @jax.checkpoint
    def chunk(s, chunk_ops):
        s, _ = jax.lax.scan(step, s, chunk_ops)
        return s, None

    state, _ = jax.lax.scan(chunk, state, ops_c)
    return state


def _apply_prot_scan(state, params, gates, is_real, dtype):
    """lax.scan over a homogeneous run of Pauli rotations.

    Program size is O(1) in the number of gates — essential for large
    ansaetze (an unrolled 2700-gate UCCSD makes XLA compiles explode),
    at identical numerics to the unrolled path.
    """
    xs, zs, ys, idx, mult, off = _prot_scan_arrays(gates)
    basis = jnp.arange(state.shape[0])
    params = params.astype(dtype) if jnp.issubdtype(dtype, jnp.floating) \
        else params
    if is_real:
        if np.any(ys % 2 == 0):
            raise ValueError("even-Y Pauli rotation leaves the real subspace")
        f = np.where(ys % 4 == 1, 1.0, -1.0)
        ops = (jnp.asarray(xs), jnp.asarray(zs),
               jnp.asarray(f, dtype=dtype), jnp.asarray(idx),
               jnp.asarray(mult, dtype=dtype), jnp.asarray(off, dtype=dtype))

        def step(s, op):
            x, z, fk, i, m, o = op
            ang = m * params[i] + o
            c = jnp.cos(ang / 2)
            sn = jnp.sin(ang / 2)
            perm = basis ^ x
            par = jax.lax.population_count(perm & z) & 1
            sign = (1 - 2 * par).astype(s.dtype)
            return c * s + (fk * sn) * sign * s[perm], None

        return _scan_gates(step, state, ops)

    phase = -1j * np.power(1j, ys % 4)   # -i * i^y factor of the P-action
    ops = (jnp.asarray(xs), jnp.asarray(zs),
           jnp.asarray(phase, dtype=dtype), jnp.asarray(idx),
           jnp.asarray(mult), jnp.asarray(off))

    def step(s, op):
        x, z, ph, i, m, o = op
        ang = m * params[i] + o
        c = jnp.cos(ang / 2).astype(dtype)
        sn = jnp.sin(ang / 2).astype(dtype)
        perm = basis ^ x
        par = jax.lax.population_count(perm & z) & 1
        sign = (1 - 2 * par).astype(dtype)
        return c * s + (ph * sn) * sign * s[perm], None

    return _scan_gates(step, state, ops)


def _apply_gates(state, params, gates, is_real, dtype):
    """Apply a gate list to a statevector (shared by state_fn/apply_fn).

    Long homogeneous runs of Pauli rotations (UCC ansaetze are nothing
    else) go through one lax.scan instead of being unrolled."""
    gates = list(gates)
    i = 0
    while i < len(gates):
        j = i
        while j < len(gates) and gates[j].name == "prot":
            j += 1
        if j - i >= _SCAN_THRESHOLD:
            state = _apply_prot_scan(state, params, gates[i:j], is_real,
                                     dtype)
            i = j
            continue
        state = _apply_gates_unrolled(state, params, gates[i:i + 1] if
                                      gates[i].name != "prot" else
                                      gates[i:j], is_real, dtype)
        i = i + 1 if gates[i].name != "prot" else j
    return state


def _apply_gates_unrolled(state, params, gates, is_real, dtype):
    """Original unrolled gate application (small circuits / mixed runs)."""
    for gt in gates:
        name = gt.name
        if name == "prot":
            x, z, y = gt.data
            ang = _angle_value(gt.angle, params)
            state = apply_pauli_rotation(state, x, z, y, ang)
        elif name == "x":
            state = apply_x_mask(state, 1 << gt.qubits[0])
        elif name in _CONST_1Q:
            U = _CONST_1Q[name]
            U = jnp.asarray(np.real(U) if is_real else U, dtype=dtype)
            state = apply_1q(state, U, gt.qubits[0])
        elif name == "ry":
            ang = _angle_value(gt.angle, params)
            state = apply_1q(state, _ry_real(ang, dtype), gt.qubits[0])
        elif name in ("rx", "rz", "p"):
            ang = _angle_value(gt.angle, params)
            state = apply_1q(state, _rot_1q(name, ang), gt.qubits[0])
        elif name in _CONST_2Q:
            U = _CONST_2Q[name]
            U = jnp.asarray(np.real(U) if is_real else U, dtype=dtype)
            state = apply_2q(state, U, gt.qubits[0], gt.qubits[1])
        elif name == "cry":
            ang = _angle_value(gt.angle, params)
            eye = jnp.eye(4, dtype=dtype)
            U = eye.at[2:, 2:].set(_ry_real(ang, dtype))
            state = apply_2q(state, U, gt.qubits[0], gt.qubits[1])
        elif name in ("crx", "crz", "cp"):
            ang = _angle_value(gt.angle, params)
            U = _ctrl(_rot_1q(name[1:], ang))
            state = apply_2q(state, U, gt.qubits[0], gt.qubits[1])
        elif name == "init_sv":
            raise ValueError("init_sv must be the first gate")
        else:
            raise ValueError(f"unknown gate {name}")
    return state


class CompiledCircuit:
    """A circuit lowered to a pure function params -> statevector.

    Real-safe circuits (the framework's entire chemistry hot path) are
    simulated with a real dtype so they run natively on TPU (which has no
    complex types); everything else uses the complex path.
    """

    def __init__(self, circuit: QuantumCircuit, force_complex: bool = False):
        self.num_qubits = circuit.num_qubits
        self.num_parameters = circuit.num_parameters
        self._gates = list(circuit.gates)
        self.is_real = (not force_complex) and _circuit_is_real(self._gates)
        self._state_fn = jax.jit(self._build())
        self._apply_fn = None
        self._apply_raw = None

    def _build(self) -> Callable:
        gates = self._gates
        nq = self.num_qubits
        is_real = self.is_real

        def run(params):
            dtype = real_dtype() if is_real else complex_dtype()
            # merge leading X gates into the initial basis index
            i = 0
            start_index = 0
            if gates and gates[0].name == "init_sv":
                vec = gates[0].data[0]
                vec = np.real(vec) if is_real else vec
                state = jnp.asarray(vec, dtype=dtype)
                i = 1
            else:
                while i < len(gates) and gates[i].name == "x":
                    start_index ^= 1 << gates[i].qubits[0]
                    i += 1
                state = basis_state(nq, start_index, dtype=dtype)
            return _apply_gates(state, params, gates[i:], is_real, dtype)

        return run

    def _build_apply(self) -> Callable:
        """(state, params) -> state: the circuit applied to a given input
        state.  Dtype follows the input (complex input forces the complex
        gate path even for a real-safe circuit)."""
        gates = self._gates
        circuit_real = self.is_real

        def apply(state, params):
            dtype = state.dtype
            is_real = jnp.issubdtype(dtype, jnp.floating)
            if is_real and not circuit_real:
                raise ValueError(
                    "cannot apply a complex circuit to a real statevector")
            return _apply_gates(state, params, gates, is_real, dtype)

        return apply

    @property
    def apply_raw(self):
        """Unjitted (state, params) -> state closure, cached so it can serve
        as a STABLE static jit key for callers embedding it in larger
        programs (e.g. the fused OptOrb loops)."""
        if self._apply_raw is None:
            self._apply_raw = self._build_apply()
        return self._apply_raw

    @property
    def apply_fn(self):
        """Jitted (state, params) -> state (for batched/vmapped execution)."""
        if self._apply_fn is None:
            self._apply_fn = jax.jit(self.apply_raw)
        return self._apply_fn

    def state(self, params=None) -> jnp.ndarray:
        if params is None:
            params = jnp.zeros(self.num_parameters)
        return self._state_fn(jnp.asarray(params))

    @property
    def state_fn(self):
        """The raw jitted params -> state function (for grad/vmap)."""
        return self._state_fn


_compile_cache: dict = {}


def compile_circuit(circuit: QuantumCircuit) -> CompiledCircuit:
    key = circuit.fingerprint()
    hit = _compile_cache.get(key)
    if hit is None:
        hit = CompiledCircuit(circuit)
        _compile_cache[key] = hit
    return hit


def statevector(circuit: QuantumCircuit, params=None) -> jnp.ndarray:
    return compile_circuit(circuit).state(params)
