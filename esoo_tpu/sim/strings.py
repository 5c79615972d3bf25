"""String-factorized sector kernels (the MXU-shaped TPU fast path).

The particle-number sector of a UCC circuit is a *product* space: its
nd = C(n, na) * C(n, nb) determinants are exactly {beta string} x
{alpha string}, and with the package's block-spin Jordan-Wigner ordering
(alpha = bits 0..n-1) the sorted determinant list is the row-major
product grid — sector amplitudes reshape losslessly to a string matrix
V[ib, ia] of shape (nB, nA) (4,900 -> 70 x 70 at H8 N=16).

Every quantity the sector simulator needs then factorizes over that
grid, which converts the two gather-bound hot kernels of sim/sector.py
into small dense GEMMs — the shape the MXU wants (round-3 TPU probe:
the K-step gate scan and the sparse quadform are each bound by
nd-length *element* gathers at ~40 us per gate / 17 ms per H.v):

  * A UCC excitation generator T - T+ splits into (alpha operator)
    (x) (beta operator): its Givens partner map is (PA x PB), its
    dom/ran sets are products, and the fermionic sign factorizes as
    fA(sa) * fB(sb) (alpha JW phases count only alpha bits; beta-phase
    alpha-parity factors cancel within each T's ladder because the
    alpha occupation is fixed while the beta operators act).  One gate
    becomes two (nA x nA)/(nB x nB) one-hot matmuls plus outer-product
    masks — no element gathers:
        V' = V + (cos th - 1) * M (.) V + sin th * S (.) (EB V EA^T)
  * The sector Hamiltonian acts through same-spin one-body operators
    D_pq = a+_p a_q (cross-spin D vanish between fixed-(na, nb)
    states), each a signed string permutation: an (nA x nA) or
    (nB x nB) matrix.  With H = sum h~ D + sum_{(pr),(qs)} g~ D_pr
    D_qs (normal-ordering the quartic term; see _build_pair_tables for
    the exact g~ assembly including the cross-spin-pairing case), the
    sigma vector H.v is four batched GEMMs over the P = 2 n^2 same-spin
    pairs — and its autodiff VJP is again pure GEMMs, so no custom VJP
    is needed for the quadform (the pairwise kernel needed one because
    its gather transpose is a pathological scatter-add, sector.py).

Exact equality with the pairwise/dense kernels of sim/sector.py is
enforced by tests/test_strings.py; SectorUCC routes to these kernels
automatically when the factorization holds (it always does for
UCC-family circuits over the full sector) and falls back otherwise.

Reference anchor: no counterpart (the reference simulates in the full
2^N space via Aer, tests/test_optorbvqe.py:23); this is the TPU-native
answer to its scaling wall.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import split_precision as _sp


def _bitcount(a: np.ndarray) -> np.ndarray:
    return np.bitwise_count(a.astype(np.uint64)).astype(np.int64)


def _parity_below(masks: np.ndarray, pos: int) -> np.ndarray:
    """(-1)^(number of set bits below `pos`) for an array of bitmasks."""
    return 1.0 - 2.0 * (_bitcount(masks & ((1 << pos) - 1)) & 1)


class StringTables(NamedTuple):
    """Host-side constant tables for the string-factorized kernels."""
    # string basis
    A: np.ndarray            # (nA,) sorted alpha-string bitmasks
    B: np.ndarray            # (nB,) sorted beta-string bitmasks
    # per-gate factorized Givens tables, all (K, nA) / (K, nB)
    PA: np.ndarray           # int32 partner permutation on alpha strings
    PB: np.ndarray           # int32 partner permutation on beta strings
    AD: np.ndarray           # alpha dom mask (0/1 float)
    AR: np.ndarray           # alpha ran mask
    UD: np.ndarray           # alpha dom mask * alpha sign factor
    UR: np.ndarray           # alpha ran mask * alpha sign factor
    BD: np.ndarray           # beta dom mask
    BR: np.ndarray           # beta ran mask
    VD: np.ndarray           # beta dom mask * beta sign factor
    VR: np.ndarray           # beta ran mask * beta sign factor
    # same-spin one-body operator matrices, (n^2, nA, nA) / (n^2, nB, nB)
    MA: np.ndarray
    MB: np.ndarray
    # pair-coupling index tables for the on-device g~ assembly, (P, P)
    LIN_A: np.ndarray        # int32 flat indices into g.reshape(-1)
    LIN_B: np.ndarray        # int32 flat indices (cross-pairing term)
    CROSS: np.ndarray        # float 0/1 mask (cross-spin pair rows/cols)


def build_string_tables(dets: np.ndarray, n: int,
                        pair_lo, pair_hi, pair_sg) -> StringTables:
    """Factorize the sector + its per-gate Givens tables over alpha/beta
    strings.  Raises ValueError if the determinant set is not a full
    product grid or a gate's pair table does not factorize (callers
    fall back to the pairwise kernels)."""
    dets = np.asarray(dets, dtype=np.int64)
    nd = len(dets)
    A = np.unique(dets & ((1 << n) - 1))
    B = np.unique(dets >> n)
    nA, nB = len(A), len(B)
    if nA * nB != nd:
        raise ValueError("sector is not an alpha x beta product grid")
    grid = ((B[:, None] << n) | A[None, :]).ravel()
    if not np.array_equal(dets, grid):
        raise ValueError("determinant order is not the row-major "
                         "(beta, alpha) product grid")

    K = len(pair_lo)
    PA = np.tile(np.arange(nA, dtype=np.int32), (K, 1))
    PB = np.tile(np.arange(nB, dtype=np.int32), (K, 1))
    AD = np.zeros((K, nA)); AR = np.zeros((K, nA))
    UD = np.zeros((K, nA)); UR = np.zeros((K, nA))
    BD = np.zeros((K, nB)); BR = np.zeros((K, nB))
    VD = np.zeros((K, nB)); VR = np.zeros((K, nB))

    for k in range(K):
        lo = np.asarray(pair_lo[k], dtype=np.int64)
        hi = np.asarray(pair_hi[k], dtype=np.int64)
        sg = np.asarray(pair_sg[k], dtype=np.float64)
        if len(lo) == 0:
            raise ValueError(f"gate {k} has an empty domain")
        ibl, ial = lo // nA, lo % nA
        ibh, iah = hi // nA, hi % nA
        domA = np.unique(ial); domB = np.unique(ibl)
        ranA = np.unique(iah); ranB = np.unique(ibh)
        if len(domA) * len(domB) != len(lo):
            raise ValueError(f"gate {k} domain is not a product set")
        # partner maps must be consistent functions of one side alone
        pa = np.full(nA, -1, dtype=np.int64)
        pb = np.full(nB, -1, dtype=np.int64)
        pa[ial] = iah          # last write wins; verify below
        pb[ibl] = ibh
        if not (np.all(pa[ial] == iah) and np.all(pb[ibl] == ibh)):
            raise ValueError(f"gate {k} partner map does not factorize")
        # sign factorization sg(ia, ib) = fA(ia) * fB(ib)
        ib0, ia0 = domB[0], domA[0]
        fA = np.zeros(nA)
        fA[ial[ibl == ib0]] = sg[ibl == ib0]
        fB = np.zeros(nB)
        fB[ibl[ial == ia0]] = sg[ial == ia0] * fA[ia0]
        if not np.allclose(sg, fA[ial] * fB[ibl]):
            raise ValueError(f"gate {k} sign field does not factorize")
        # dom/ran products must be disjoint (T^2 = 0 on the sector):
        # overlap requires BOTH per-side intersections to be non-empty
        if (np.intersect1d(domA, ranA).size
                and np.intersect1d(domB, ranB).size):
            raise ValueError(f"gate {k} dom/ran products overlap")
        AD[k, domA] = 1.0; AR[k, ranA] = 1.0
        BD[k, domB] = 1.0; BR[k, ranB] = 1.0
        UD[k, domA] = fA[domA]
        VD[k, domB] = fB[domB]
        # ran-side factors mirror their dom partner's factor
        PA[k, domA] = pa[domA]
        PA[k, pa[domA]] = domA
        PB[k, domB] = pb[domB]
        PB[k, pb[domB]] = domB
        UR[k, pa[domA]] = fA[domA]
        VR[k, pb[domB]] = fB[domB]

    MA = _one_body_matrices(A, n)
    MB = _one_body_matrices(B, n)
    LIN_A, LIN_B, CROSS = _build_pair_tables(n)
    return StringTables(A=A, B=B, PA=PA, PB=PB,
                        AD=AD, AR=AR, UD=UD, UR=UR,
                        BD=BD, BR=BR, VD=VD, VR=VR,
                        MA=MA, MB=MB,
                        LIN_A=LIN_A, LIN_B=LIN_B, CROSS=CROSS)


def _one_body_matrices(S: np.ndarray, n: int) -> np.ndarray:
    """M[(p*n + r), j, i] = <S[j]| a+_p a_r |S[i]> over one spin's
    strings, with the within-block JW phases (for beta pairs the
    alpha-parity phase factors cancel between a_r and a+_p because the
    alpha occupation is untouched in between).

    Stored int8: every entry is a JW sign in {0, +-1}, and the compact
    (int8-on-device) kernel path consumes the stacks verbatim — at H8
    N=32 (nA=1820) the two stacks are 1.7 GB int8 vs 13.6 GB f64."""
    ns = len(S)
    M = np.zeros((n * n, ns, ns), dtype=np.int8)
    index = {int(s): i for i, s in enumerate(S)}
    for r in range(n):
        occ_r = ((S >> r) & 1) == 1
        src = np.nonzero(occ_r)[0]
        s1 = S[src] & ~(1 << r)
        sgn1 = _parity_below(S[src], r)
        for p in range(n):
            if p == r:
                M[p * n + r, src, src] = 1.0
                continue
            free_p = ((s1 >> p) & 1) == 0
            s2 = s1[free_p] | (1 << p)
            sgn = sgn1[free_p] * _parity_below(s1[free_p], p)
            dst = np.array([index[int(x)] for x in s2], dtype=np.int64)
            M[p * n + r, dst, src[free_p]] = sgn
    return M


def _build_pair_tables(n: int):
    """Index tables assembling the (P, P) pair-coupling matrix g~ from
    g_so.reshape(-1) on device, P = 2 n^2 same-spin pairs (alpha pairs
    (p, r) -> p*n + r first, then beta).

    H's quartic term sum_pqrs g_pqrs a+_p a+_q a_s a_r contributes, for
    each spin-conserving index combination, exactly one D-product:

      sigma(p)=sigma(r), sigma(q)=sigma(s):
          a+_p a+_q a_s a_r = D_pr D_qs - delta_qr D_ps
          -> g~[(p,r), (q,s)] += g_pqrs      (LIN_A; the delta term is
             folded into h~ = h - sum_q g[p,q,q,s] by the caller)
      sigma(p)=sigma(s) != sigma(q)=sigma(r):
          a+_p a+_q a_s a_r = -D_qr D_ps     (pure anticommutations,
             no delta: all swapped operators act on different spins)
          -> g~[(q,r), (p,s)] -= g_pqrs      (LIN_B on CROSS entries)

    All-same-spin terms satisfy both spin conditions but are expanded
    once, via the first identity only — CROSS masks the second to
    opposite-spin pair pairs."""
    N = 2 * n
    # pair t -> spin-orbital indices (x1, x2) = (creation, annihilation)
    p_ = np.arange(n)
    x1 = np.concatenate([np.repeat(p_, n), np.repeat(p_ + n, n)])
    x2 = np.concatenate([np.tile(p_, n), np.tile(p_ + n, n)])
    spin = np.concatenate([np.zeros(n * n, np.int64),
                           np.ones(n * n, np.int64)])
    # LIN_A[a, b] = flat index of g[pa, qb, ra, sb]
    pa, ra = x1[:, None], x2[:, None]
    qb, sb = x1[None, :], x2[None, :]
    LIN_A = (((pa * N + qb) * N + ra) * N + sb).astype(np.int32)
    # LIN_B[a, b] = flat index of g[y1, x1a, x2a, y2] with a=(x1a,x2a),
    # b=(y1,y2) of opposite spin
    y1, y2 = x1[None, :], x2[None, :]
    x1a, x2a = x1[:, None], x2[:, None]
    LIN_B = (((y1 * N + x1a) * N + x2a) * N + y2).astype(np.int32)
    CROSS = (spin[:, None] != spin[None, :]).astype(np.float64)
    return LIN_A, LIN_B, CROSS


# -- gate application ---------------------------------------------------------

def _one_hot(p, dt):
    return (p[:, None] == jnp.arange(p.shape[0],
                                     dtype=p.dtype)[None, :]).astype(dt)


def _perm_sandwich(V, pA, pB):
    """G = EB @ V @ EA^T with the partner permutations as on-the-fly
    one-hot matrices — the gather becomes two MXU matmuls.  By DEFAULT
    this runs on the ``highest``-precision f32 path (12 MXU passes per
    GEMM).  One-hot entries are exact in bf16, so the sandwich CAN run
    as two 3x-width bf16-split GEMMs (ops/split_precision.py: exact to
    f32 rounding, 6 MXU passes) — but that route measured SLOWER on the
    v5e (round 4, tests/test_split_precision.py provenance) and is
    opt-in via ops.split_precision.force_split(True) for genuinely
    pass-bound backends.  The N>=24 gate scan is compute-bound in
    exactly these sandwiches (measured 46.9 us/gate,
    scripts/probe_scan_bwd.py)."""
    if _sp.use_split(V.dtype):
        EA = _one_hot(pA, jnp.bfloat16)
        EB = _one_hot(pB, jnp.bfloat16)
        return _sp.exact_mm(EB, _sp.exact_mmT(V, EA))
    EA = _one_hot(pA, V.dtype)
    EB = _one_hot(pB, V.dtype)
    return EB @ V @ EA.T


def _gate_step_str(V, pA, pB, aD, aR, uD, uR, bD, bR, vD, vR, th,
                   inverse=False):
    """One factorized Givens-bank gate on the string matrix V (nB, nA):
        V' = V + (cos th - 1) * M (.) V + sin th * S (.) (EB V EA^T)
    with M = bD aD^T + bR aR^T (touched mask), S = vR uR^T - vD uD^T
    (sign field), and the permutation sandwich on the MXU
    (_perm_sandwich)."""
    c = jnp.cos(th)
    s = jnp.sin(th)
    s = -s if inverse else s
    G = _perm_sandwich(V, pA, pB)
    M = bD[:, None] * aD[None, :] + bR[:, None] * aR[None, :]
    S = vR[:, None] * uR[None, :] - vD[:, None] * uD[None, :]
    return V + (c - 1.0) * (M * V) + s * (S * G)


def _scan_xs(theta, tabs, dt):
    f = lambda a: jnp.asarray(a, dtype=dt)
    return (jnp.asarray(tabs["PA"]), jnp.asarray(tabs["PB"]),
            f(tabs["AD"]), f(tabs["AR"]), f(tabs["UD"]), f(tabs["UR"]),
            f(tabs["BD"]), f(tabs["BR"]), f(tabs["VD"]), f(tabs["VR"]),
            theta)


def _apply_gates_str(V0, theta, tabs):
    """Plain scan (autodiff oracle; production uses apply_rev_str)."""
    def gate(V, xs):
        return _gate_step_str(V, *xs), None

    V, _ = jax.lax.scan(gate, V0, _scan_xs(theta, tabs, V0.dtype),
                        unroll=min(8, max(int(theta.shape[0]), 1)))
    return V


@jax.custom_vjp
def _apply_rev_str(V0, theta, PA, PB, AD, AR, UD, UR, BD, BR, VD, VR):
    """Factorized gate application with the REVERSIBLE analytic VJP
    (same scheme as sector._apply_rev: gates are orthogonal, so the
    backward pass reconstructs intermediates by inverse rotation —
    O(1) residual memory — and the cotangent recursion w <- G^T w is
    the same matmul formula with th -> -th, because the sign field is
    antisymmetric under the partner permutation)."""
    def gate(V, xs):
        return _gate_step_str(V, *xs), None

    K = int(theta.shape[0])
    xs = (PA, PB, AD, AR, UD, UR, BD, BR, VD, VR, theta)
    V, _ = jax.lax.scan(gate, V0, xs, unroll=min(8, max(K, 1)))
    return V


def _apply_rev_str_fwd(V0, theta, PA, PB, AD, AR, UD, UR, BD, BR, VD, VR):
    V = _apply_rev_str(V0, theta, PA, PB, AD, AR, UD, UR, BD, BR, VD, VR)
    return V, (V, theta, PA, PB, AD, AR, UD, UR, BD, BR, VD, VR)


def _apply_rev_str_bwd(res, ct):
    V, theta, PA, PB, AD, AR, UD, UR, BD, BR, VD, VR = res
    dt = V.dtype

    def gate_bwd(carry, xs):
        W, Vk = carry
        pA, pB, aD, aR, uD, uR, bD, bR, vD, vR, th = xs
        c, s = jnp.cos(th), jnp.sin(th)
        split = _sp.use_split(dt)
        EA = _one_hot(pA, jnp.bfloat16 if split else dt)
        EB = _one_hot(pB, jnp.bfloat16 if split else dt)
        M = bD[:, None] * aD[None, :] + bR[:, None] * aR[None, :]
        S = vR[:, None] * uR[None, :] - vD[:, None] * uD[None, :]
        # The naive step needs THREE permutation sandwiches
        # perm(X) = EB @ X @ EA^T (for V_k, V_{k-1}, W).  Two exact
        # identities collapse it to ONE batched pair (the scan at
        # N>=24 is bound by sequential small-GEMM launches, not FLOPs):
        #   * perm is an involution that maps dom <-> ran, under which
        #     the touched mask is even and the sign field odd:
        #     perm(M (.) X) = M (.) perm(X), perm(S (.) X) = -S (.)
        #     perm(X), and perm(perm(X)) = X — so perm(V_{k-1}) needs
        #     no new GEMM:
        #       perm(V_{k-1}) = perm(V_k + (c-1) M(.)V_k - s S(.)G_k)
        #                     = G_k + (c-1) M(.)G_k + s S(.)V_k
        #   * the two remaining sandwiches (V_k and W) share EB/EA and
        #     batch into one einsum pair of twice the contraction width.
        nB, nA = Vk.shape
        X = jnp.concatenate([Vk, W], axis=1)          # (nB, 2 nA)
        Y = _sp.exact_mm(EB, X) if split else EB @ X  # one (nB, 2 nA) GEMM
        Z = jnp.concatenate([Y[:, :nA], Y[:, nA:]], axis=0)   # (2 nB, nA)
        GX = (_sp.exact_mmT(Z, EA) if split
              else Z @ EA.T)                          # one (2 nB, nA) GEMM
        G_k, GW = GX[:nB], GX[nB:]
        # V_{k-1} = G(-th) V_k (orthogonal inverse)
        V_prev = Vk + (c - 1.0) * (M * Vk) - s * (S * G_k)
        perm_V_prev = G_k + (c - 1.0) * (M * G_k) + s * (S * Vk)
        # dL/dth_k = W . (dG/dth) V_{k-1}
        dG_V = -s * (M * V_prev) + c * (S * perm_V_prev)
        dth = jnp.sum(W * dG_V)
        # W_{k-1} = G^T W = G(-th) W
        W_prev = W + (c - 1.0) * (M * W) - s * (S * GW)
        return (W_prev, V_prev), dth

    K = int(theta.shape[0])
    xs = (PA, PB, AD, AR, UD, UR, BD, BR, VD, VR, theta)
    (W0, _), dths = jax.lax.scan(gate_bwd, (ct, V), xs, reverse=True,
                                 unroll=min(8, max(K, 1)))
    z = lambda a: (np.zeros(a.shape, dtype=jax.dtypes.float0)
                   if jnp.issubdtype(a.dtype, jnp.integer)
                   else jnp.zeros_like(a))
    return (W0, dths, z(PA), z(PB), z(AD), z(AR), z(UD), z(UR),
            z(BD), z(BR), z(VD), z(VR))


_apply_rev_str.defvjp(_apply_rev_str_fwd, _apply_rev_str_bwd)


def apply_gates(V0, theta, tabs):
    """Production gate application on the string matrix (reversible
    VJP).  `tabs` is a mapping with the per-gate tables (host constants
    or device-buffer arguments — same kernel either way)."""
    if int(theta.shape[0]) == 0:
        return V0
    return _apply_rev_str(V0, theta, *_scan_xs(theta, tabs, V0.dtype)[:-1])


# -- sigma / quadform ---------------------------------------------------------

# -- compact (int8-stack, operator-chunked) kernel variants -------------------
#
# The dense kernels materialize the f32/f64 one-body stacks MA/MB
# ((n^2, ns, ns) per spin) plus the full (2 q_pad, nd) T tensor — at H8
# N=32 (nA = 1820, nd = 3.31M) that is > 20 GB, past one v5e's 16 GB
# HBM.  Every stack entry is a JW sign in {0, +-1}, so a compact tables
# pytree stores them int8 (keys "MA8"/"MB8", 1.7 GB at N=32) and the
# kernels below stream them in _OP_CHUNK-operator blocks (one f32 cast
# per block, ~0.4 GB transient), accumulating with lax.scan.  The T
# tensor is kept as two (q_pad, nd) halves (never concatenated).  Peak
# HBM at N=32: ~6.8 GB (T halves) + 1.7 GB (int8 stacks) + chunk
# transients — the single-chip path to the 3.3M-determinant sector.
# Dispatch is by key presence ("MA8" in tabs), so every dense-path
# program is unchanged.  Exact equality with the dense kernels:
# tests/test_strings.py (TestCompactKernels).

_OP_CHUNK = 32

# bwd specs for the exact-split operator-stack einsums (the sign stacks
# are exact in bf16; ops/split_precision.py)
_EIN_BWD = {
    "qji,bi->qbj": "qji,qbj->bi",
    "qji,ia->qja": "qji,qja->ia",
    "qji,qbi->bj": "qji,bj->qbi",
    "qji,qia->ja": "qji,ja->qia",
}


def _stack_einsum(ein, M, X, dt):
    """einsum(ein, M, X) with the sign-structured stack M: exact-split
    bf16 at f32 working precision, ``highest`` f-cast otherwise."""
    if _sp.use_split(dt):
        return _sp.exact_einsum(ein, _EIN_BWD[ein], M, X)
    return jnp.einsum(ein, M.astype(dt), X)


def compact_tables(tabs_or_strtabs, dtype):
    """Compact tables dict from a StringTables or a dense tables dict:
    int8 operator stacks under "MA8"/"MB8" (operator axis zero-padded to
    a _OP_CHUNK multiple — the kernels' static chunk size), pair maps at
    `dtype`.  Gate tables are not carried (the compact path serves the
    gate-free SectorCI eigensolver)."""
    dtype = np.dtype(dtype)
    if isinstance(tabs_or_strtabs, dict):
        MA, MB = tabs_or_strtabs["MA"], tabs_or_strtabs["MB"]
        LIN_A = tabs_or_strtabs["LIN_A"]
        LIN_B = tabs_or_strtabs["LIN_B"]
        CROSS = tabs_or_strtabs["CROSS"]
    else:
        s = tabs_or_strtabs
        MA, MB, LIN_A, LIN_B, CROSS = s.MA, s.MB, s.LIN_A, s.LIN_B, s.CROSS
    MA = np.asarray(MA, dtype=np.int8)
    MB = np.asarray(MB, dtype=np.int8)
    q = MA.shape[0]
    q_pad = ((q + _OP_CHUNK - 1) // _OP_CHUNK) * _OP_CHUNK
    if q_pad != q:
        pad = [(0, q_pad - q), (0, 0), (0, 0)]
        MA = np.pad(MA, pad)
        MB = np.pad(MB, pad)
    return dict(MA8=MA, MB8=MB, LIN_A=LIN_A, LIN_B=LIN_B,
                CROSS=np.asarray(CROSS, dtype=dtype))


def _fold_one_body(hvec, M8, dt):
    """F = sum_q hvec[q] M8[q] without materializing the f32 stack."""
    q_pad, ns = M8.shape[0], M8.shape[1]
    c = min(_OP_CHUNK, q_pad)

    def step(acc, xs):
        hc, Mc = xs
        return acc + jnp.einsum("q,qji->ji", hc, Mc.astype(dt)), None

    F, _ = jax.lax.scan(step, jnp.zeros((ns, ns), dt),
                        (hvec.reshape(-1, c), M8.reshape(-1, c, ns, ns)))
    return F


def _t_half(V, M8, dt, ein):
    """One (q_pad, nd) T-tensor half T_a = D_a v, built one operator
    chunk at a time (lax.scan ys write straight into the output buffer;
    no f32 stack).  ein: "qji,bi->qbj" (alpha) / "qji,ia->qja" (beta)."""
    nB, nA = V.shape
    q_pad, ns = M8.shape[0], M8.shape[1]
    c = min(_OP_CHUNK, q_pad)

    def step(_, Mc):
        return None, _stack_einsum(ein, Mc, V, dt)

    _, T = jax.lax.scan(step, None, M8.reshape(-1, c, ns, ns))
    return T.reshape(q_pad, nB * nA)


def _back_contract(Tf, G2blk, M8, dt, spin, nB, nA):
    """sum over operator chunks of M_chunk^T-applied((G2blk row chunk) @
    Tf) — the U = G2 T rows are formed c at a time and contracted back
    immediately, never materialized.  spin: 'A' accumulates the
    alpha-side (nB, nA) contribution, 'B' the beta-side."""
    q_pad, ns = M8.shape[0], M8.shape[1]
    c = min(_OP_CHUNK, q_pad)
    ein = "qji,qbi->bj" if spin == "A" else "qji,qia->ja"

    def step(acc, xs):
        Mc, Gc = xs                      # (c, ns, ns) int8, (c, q_pad)
        Uc = Gc @ Tf
        return acc + _stack_einsum(ein, Mc,
                                   Uc.reshape(c, nB, nA), dt), None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((nB, nA), dt),
        (M8.reshape(-1, c, ns, ns), G2blk.reshape(-1, c, q_pad)))
    return acc


def _sigma_compact(V, ops, tabs):
    """H . v with int8 stacks: same math as `sigma`, streamed over
    operator chunks.  Only ONE (q_pad, nd) T half is ever live: the G2
    coupling is split into its four spin blocks, the TAf contributions
    (AA + BA) are consumed first, and an optimization_barrier forces the
    TBf build after them so XLA's liveness frees TAf — peak HBM is one
    half (3.4 GB at H8 N=32) instead of two."""
    dt = V.dtype
    MA8, MB8 = tabs["MA8"], tabs["MB8"]
    nB, nA = V.shape
    q_pad = MA8.shape[0]
    s1 = V @ ops["FA"].T + ops["FB"] @ V
    G2 = ops["G2"]
    TAf = _t_half(V, MA8, dt, "qji,bi->qbj")
    sA = _back_contract(TAf, G2[:q_pad, :q_pad], MA8, dt, "A", nB, nA)
    sB = _back_contract(TAf, G2[q_pad:, :q_pad], MB8, dt, "B", nB, nA)
    # schedule fence: TBf may not be built before the TAf passes finish
    V2, sA, sB = jax.lax.optimization_barrier((V, sA, sB))
    TBf = _t_half(V2, MB8, dt, "qji,ia->qja")
    sA = sA + _back_contract(TBf, G2[:q_pad, q_pad:], MA8, dt, "A",
                             nB, nA)
    sB = sB + _back_contract(TBf, G2[q_pad:, q_pad:], MB8, dt, "B",
                             nB, nA)
    return s1 + sA + sB


def _rdms_compact(V, tabs, maps):
    """`rdms` with int8 stacks: the (2 q_pad)^2 pair-correlation matrix
    assembled per spin block with only one T half live at a time (the
    cross block TAf TBf^T streams TBf chunks recomputed on the fly; the
    full matrix is symmetric, so BA = AB^T), then the same
    constant-index gather as the dense path."""
    dt = V.dtype
    nB, nA = V.shape
    IDX, SGN, CASE_A = maps
    N = CASE_A.shape[0]
    nsp = N // 2
    MA8, MB8 = tabs["MA8"], tabs["MB8"]
    q_pad = MA8.shape[0]
    c = min(_OP_CHUNK, q_pad)
    v = V.reshape(-1)

    TAf = _t_half(V, MA8, dt, "qji,bi->qbj")
    gp_a = TAf @ v
    AA = TAf @ TAf.T

    def stepx(_, Mc):
        Tc = _stack_einsum("qji,ia->qja", Mc, V, dt).reshape(c, nB * nA)
        return None, TAf @ Tc.T                      # (q_pad, c)

    _, ABcols = jax.lax.scan(stepx, None, MB8.reshape(-1, c, nB, nB))
    AB = ABcols.transpose(1, 0, 2).reshape(q_pad, q_pad)
    V2, gp_a, AA, AB = jax.lax.optimization_barrier((V, gp_a, AA, AB))
    TBf = _t_half(V2, MB8, dt, "qji,ia->qja")
    gp_b = TBf @ V2.reshape(-1)
    BB = TBf @ TBf.T

    gamma = jnp.zeros((N, N), dtype=dt)
    gamma = gamma.at[:nsp, :nsp].set(
        gp_a[: nsp * nsp].reshape(nsp, nsp))
    gamma = gamma.at[nsp:, nsp:].set(
        gp_b[: nsp * nsp].reshape(nsp, nsp))
    G2f = jnp.concatenate([
        jnp.concatenate([AA, AB], axis=1),
        jnp.concatenate([AB.T, BB], axis=1),
    ], axis=0).reshape(-1)
    Gamma = (jnp.asarray(SGN, dtype=dt) * G2f[jnp.asarray(IDX)]
             ).reshape(N, N, N, N)
    eye = jnp.eye(N, dtype=dt)
    Gamma = Gamma - jnp.asarray(CASE_A, dtype=dt) * jnp.einsum(
        "qr,ps->pqrs", eye, gamma)
    return gamma, Gamma


def _diag_same_spin(G2blk, M8, dt):
    """d2[i] = sum_ab G2blk[a,b] sum_j M[a,i,j] M[b,j,i], both operator
    axes streamed in chunks (two casts of one chunk each per step)."""
    q_pad, ns = M8.shape[0], M8.shape[1]
    c = min(_OP_CHUNK, q_pad)
    Mr = M8.reshape(-1, c, ns, ns)

    def outer(acc, xs):
        Gc, Ma = xs                      # (c, q_pad), (c, ns, ns)
        Maf = Ma.astype(dt)

        def inner(W, ys):
            Gab, Mb = ys                 # (c, c), (c, ns, ns)
            return W + jnp.einsum("ab,bji->aij", Gab,
                                  Mb.astype(dt)), None

        W, _ = jax.lax.scan(
            inner, jnp.zeros((c, ns, ns), dt),
            (Gc.reshape(c, -1, c).swapaxes(0, 1), Mr))
        return acc + jnp.einsum("aij,aij->i", Maf, W), None

    d2, _ = jax.lax.scan(outer, jnp.zeros((ns,), dt), (
        G2blk.reshape(-1, c, q_pad), Mr))
    return d2


def _diagonal_compact(ops, tabs):
    """Exact diag(H) with int8 stacks (same identity as `diagonal`)."""
    dt = ops["FA"].dtype
    MA8, MB8 = tabs["MA8"], tabs["MB8"]
    q_pad = MA8.shape[0]
    G2 = ops["G2"]
    W_cross = G2[:q_pad, q_pad:] + G2[q_pad:, :q_pad].T
    dA1 = jnp.diagonal(ops["FA"])
    dB1 = jnp.diagonal(ops["FB"])
    # per-operator diagonals: a gather from the int8 stacks — tiny
    DA = jnp.diagonal(MA8, axis1=1, axis2=2).astype(dt)
    DB = jnp.diagonal(MB8, axis1=1, axis2=2).astype(dt)
    dA2 = _diag_same_spin(G2[:q_pad, :q_pad], MA8, dt)
    dB2 = _diag_same_spin(G2[q_pad:, q_pad:], MB8, dt)
    cross = jnp.einsum("ab,ai,bj->ji", W_cross, DA, DB)
    return (dA1 + dA2)[None, :] + (dB1 + dB2)[:, None] + cross


def build_ops(h_so, g_so, tabs):
    """Per-outer-iteration operator pytree for the sigma kernel, from
    spin-orbital integrals in the package convention E = sum h gamma +
    sum g Gamma: the (P, P) pair coupling g~ (gathered from g via the
    constant LIN tables) and the one-body string matrices
    F = sum h~ D with h~ = h - sum_q g[p, q, q, s].  Pure jnp — safe
    inside jit, differentiable through to (h, g).

    Padding-transparent: the one-body stacks MA/MB may be zero-padded
    on their operator axis (to a mesh-divisible multiple, see
    parallel.shard_sector_tables) — the true n^2 is read from the
    unpadded (P, P) CROSS table and G2 is block-embedded into the
    padded (2 q_pad, 2 q_pad) layout so `sigma` needs no special
    handling."""
    dt = h_so.dtype
    compact = "MA8" in tabs                         # int8-stack variant
    P_half = tabs["CROSS"].shape[0] // 2
    nsp = int(round(np.sqrt(P_half)))               # spatial orbitals
    q_pad = tabs["MA8" if compact else "MA"].shape[0]  # padded op axis
    gf = g_so.reshape(-1)
    LIN_A = jnp.asarray(tabs["LIN_A"])
    LIN_B = jnp.asarray(tabs["LIN_B"])
    CROSS = jnp.asarray(tabs["CROSS"], dtype=dt)
    G2 = gf[LIN_A] - CROSS * gf[LIN_B]
    if q_pad != P_half:
        # embed the true (2 n^2, 2 n^2) coupling at the padded block
        # offsets (alpha rows/cols 0..n^2-1, beta at q_pad..q_pad+n^2-1);
        # padded rows/cols stay zero so the padded zero operators in
        # MA/MB contribute nothing to sigma
        G2p = jnp.zeros((2 * q_pad, 2 * q_pad), dtype=dt)
        G2p = G2p.at[:P_half, :P_half].set(G2[:P_half, :P_half])
        G2p = G2p.at[:P_half, q_pad:q_pad + P_half].set(
            G2[:P_half, P_half:])
        G2p = G2p.at[q_pad:q_pad + P_half, :P_half].set(
            G2[P_half:, :P_half])
        G2p = G2p.at[q_pad:q_pad + P_half, q_pad:q_pad + P_half].set(
            G2[P_half:, P_half:])
        G2 = G2p
    # delta correction h~ = h - sum_q g[p,q,q,s] over SAME-SPIN q only:
    # the q = r terms with cross-spin q are expanded through the
    # second (cross-pairing) identity and already live in G2's
    # -D_qq D_ps products — subtracting them here would double-count
    sA = jnp.einsum("pqqs->ps", g_so[:, :nsp, :nsp, :])
    sB = jnp.einsum("pqqs->ps", g_so[:, nsp:, nsp:, :])
    hA = (h_so - sA)[:nsp, :nsp].reshape(-1)
    hB = (h_so - sB)[nsp:, nsp:].reshape(-1)
    if q_pad != P_half:
        hA = jnp.pad(hA, (0, q_pad - P_half))
        hB = jnp.pad(hB, (0, q_pad - P_half))
    if compact:
        FA = _fold_one_body(hA, tabs["MA8"], dt)
        FB = _fold_one_body(hB, tabs["MB8"], dt)
    else:
        MA = jnp.asarray(tabs["MA"], dtype=dt)
        MB = jnp.asarray(tabs["MB"], dtype=dt)
        FA = jnp.einsum("q,qji->ji", hA, MA)
        FB = jnp.einsum("q,qji->ji", hB, MB)
    return {"G2": G2, "FA": FA, "FB": FB}


def sigma(V, ops, tabs):
    """H . v on the string matrix — batched small GEMMs only.

    sigma = V FA^T + FB V + sum_a D_a (sum_b g~[a,b] D_b v), with the
    T tensors (P, nB, nA) materialized once (2.5 MB at H8 N=16).
    Compact (int8-stack) tables run the operator-chunked variant."""
    if "MA8" in tabs:
        return _sigma_compact(V, ops, tabs)
    dt = V.dtype
    nB, nA = V.shape
    s1 = V @ ops["FA"].T + ops["FB"] @ V
    if _sp.use_split(dt):
        # sign stacks are exact in bf16: T builds and back-contractions
        # run as 3-pass exact-split einsums (G2 @ T stays `highest` —
        # both operands generic)
        MA, MB = tabs["MA"], tabs["MB"]
        P_A = MA.shape[0]
        TA = _sp.exact_einsum("qji,bi->qbj", "qji,qbj->bi", MA, V)
        TB = _sp.exact_einsum("qji,ia->qja", "qji,qja->ia", MB, V)
        T = jnp.concatenate([TA, TB], axis=0).reshape(2 * P_A, nB * nA)
        U = (ops["G2"] @ T).reshape(2 * P_A, nB, nA)
        s2A = _sp.exact_einsum("qji,qbi->bj", "qji,bj->qbi", MA, U[:P_A])
        s2B = _sp.exact_einsum("qji,qia->ja", "qji,ja->qia", MB, U[P_A:])
        return s1 + s2A + s2B
    MA = jnp.asarray(tabs["MA"], dtype=dt)
    MB = jnp.asarray(tabs["MB"], dtype=dt)
    P_A = MA.shape[0]
    TA = jnp.einsum("qji,bi->qbj", MA, V)
    TB = jnp.einsum("qji,ia->qja", MB, V)
    T = jnp.concatenate([TA, TB], axis=0).reshape(2 * P_A, nB * nA)
    U = (ops["G2"] @ T).reshape(2 * P_A, nB, nA)
    s2A = jnp.einsum("qji,qbi->bj", MA, U[:P_A])
    s2B = jnp.einsum("qji,qia->ja", MB, U[P_A:])
    return s1 + s2A + s2B


def quadform(V, ops, tabs):
    """<v|H|v> = vec(V) . vec(sigma(V)).  No custom VJP: every factor
    is a GEMM, so the autodiff VJP is GEMMs too."""
    return jnp.sum(V * sigma(V, ops, tabs))


# -- RDMs ----------------------------------------------------------------------

def build_rdm_maps(n: int, q_pad: int = None):
    """Host-side assembly maps turning the pair-correlation matrix
    G2f[a, b] = (D_a v) . (D_b v) into the spin-orbital 2-RDM
    Gamma[p, q, r, s] = <a+_p a+_q a_s a_r>, using the same two
    operator identities as the Hamiltonian expansion:

      sigma(p)=sigma(r), sigma(q)=sigma(s):
          Gamma = <D_pr D_qs> - delta_qr gamma_ps
                = G2f[(r,p), (q,s)] - delta_qr gamma[p, s]
      sigma(p)=sigma(s) != sigma(q)=sigma(r):
          Gamma = -<D_qr D_ps> = -G2f[(r,q), (p,s)]
      otherwise 0  (does not conserve per-spin particle number).

    `q_pad` is the (possibly mesh-padded) per-spin operator-axis length
    of the MA/MB stacks (default n^2, the unpadded layout): the beta
    block then starts at row q_pad of the (2 q_pad, nd) T tensor.

    Returns (IDX, SGN, CASE_A) with IDX (N^4,) int32 into G2f.reshape(-1)
    (arbitrary where SGN = 0), SGN (N^4,) in {0, +-1}, CASE_A the
    (N, N, N, N) 0/1 mask gating the delta-gamma correction."""
    N = 2 * n
    sp = (np.arange(N) >= n).astype(np.int64)
    if q_pad is None:
        q_pad = n * n
    P = 2 * q_pad

    def pair(x, y):
        # same-spin pair index in the MA/MB ordering (alpha block first)
        return sp[x] * q_pad + (x % n) * n + (y % n)

    p = np.arange(N)[:, None, None, None]
    q = np.arange(N)[None, :, None, None]
    r = np.arange(N)[None, None, :, None]
    s = np.arange(N)[None, None, None, :]
    case_a = (sp[p] == sp[r]) & (sp[q] == sp[s])
    case_b = (sp[p] == sp[s]) & (sp[q] == sp[r]) & (sp[p] != sp[q])
    idx_a = pair(r, p) * P + pair(q, s)
    idx_b = pair(r, q) * P + pair(p, s)
    IDX = np.where(case_a, idx_a, np.where(case_b, idx_b, 0))
    SGN = np.where(case_a, 1.0, np.where(case_b, -1.0, 0.0))
    return (IDX.reshape(-1).astype(np.int32),
            SGN.reshape(-1),
            case_a.astype(np.float64))


def rdms(V, tabs, maps):
    """Spin-orbital (gamma, Gamma) from the string matrix — GEMMs plus
    one constant-index gather of the (P, P) pair-correlation matrix
    (vs the (N^2, nd)-table element gathers of sector._rdm_tables).
    `maps` is a build_rdm_maps triple."""
    if "MA8" in tabs:
        return _rdms_compact(V, tabs, maps)
    dt = V.dtype
    nB, nA = V.shape
    IDX, SGN, CASE_A = maps
    N = CASE_A.shape[0]
    nsp = N // 2
    if _sp.use_split(dt):
        MA, MB = tabs["MA"], tabs["MB"]
        q_pad = MA.shape[0]      # operator axis, possibly mesh-padded
        TA = _sp.exact_einsum("qji,bi->qbj", "qji,qbj->bi", MA, V)
        TB = _sp.exact_einsum("qji,ia->qja", "qji,qja->ia", MB, V)
    else:
        MA = jnp.asarray(tabs["MA"], dtype=dt)
        MB = jnp.asarray(tabs["MB"], dtype=dt)
        q_pad = MA.shape[0]      # operator axis, possibly mesh-padded
        TA = jnp.einsum("qji,bi->qbj", MA, V)
        TB = jnp.einsum("qji,ia->qja", MB, V)
    T = jnp.concatenate([TA, TB], axis=0).reshape(2 * q_pad, nB * nA)
    v = V.reshape(-1)
    gpairs = T @ v                                   # (2 q_pad,)
    gamma = jnp.zeros((N, N), dtype=dt)
    gamma = gamma.at[:nsp, :nsp].set(
        gpairs[: nsp * nsp].reshape(nsp, nsp))
    gamma = gamma.at[nsp:, nsp:].set(
        gpairs[q_pad: q_pad + nsp * nsp].reshape(nsp, nsp))
    G2f = (T @ T.T).reshape(-1)                      # (P*P,)
    Gamma = (jnp.asarray(SGN, dtype=dt) * G2f[jnp.asarray(IDX)]
             ).reshape(N, N, N, N)
    eye = jnp.eye(N, dtype=dt)
    Gamma = Gamma - jnp.asarray(CASE_A, dtype=dt) * jnp.einsum(
        "qr,ps->pqrs", eye, gamma)
    return gamma, Gamma


def transition_rdm1(U, V, tabs):
    """Spin-orbital transition 1-RDM gamma[p, s] = <u| a+_p a_s |v>
    between two states on the same string grid — the one-body input to
    transition dipoles / oscillator strengths (chem.properties).  Only
    same-spin blocks are nonzero (a cross-spin a+_p a_s leaves the
    fixed-(na, nb) sector).  transition_rdm1(v, v, tabs) equals
    rdms(v)[0]; for real states gamma_{uv} = gamma_{vu}^T.

    U may carry a leading batch axis (k, nB, nA) -> (k, N, N): one
    T build against the whole bra stack (the SA-CASSCF per-state-pair
    path costs k sigma-half builds total, not k^2).  Compact int8
    stacks stream operator chunks so only one (c, nd) chunk is live.
    """
    dt = V.dtype
    batched = U.ndim == 3
    Ub = U if batched else U[None]
    P_half = tabs["CROSS"].shape[0] // 2
    nsp = int(round(np.sqrt(P_half)))
    N = 2 * nsp
    k = Ub.shape[0]
    if "MA8" in tabs:
        MA8, MB8 = tabs["MA8"], tabs["MB8"]
        q_pad, c = MA8.shape[0], min(_OP_CHUNK, MA8.shape[0])

        def pairs(M8, ein):
            ns = M8.shape[1]

            def step(_, Mc):
                Tc = jnp.einsum(ein, Mc.astype(dt), V)
                return None, jnp.einsum("qba,kba->kq", Tc, Ub)

            _, g = jax.lax.scan(step, None, M8.reshape(-1, c, ns, ns))
            return g.transpose(1, 0, 2).reshape(k, q_pad)

        ga = pairs(MA8, "qji,bi->qbj")
        gb = pairs(MB8, "qji,ia->qja")
    else:
        MA = jnp.asarray(tabs["MA"], dtype=dt)
        MB = jnp.asarray(tabs["MB"], dtype=dt)
        ga = jnp.einsum("qbj,kbj->kq",
                        jnp.einsum("qji,bi->qbj", MA, V), Ub)
        gb = jnp.einsum("qja,kja->kq",
                        jnp.einsum("qji,ia->qja", MB, V), Ub)
    gamma = jnp.zeros((k, N, N), dtype=dt)
    gamma = gamma.at[:, :nsp, :nsp].set(
        ga[:, : nsp * nsp].reshape(k, nsp, nsp))
    gamma = gamma.at[:, nsp:, nsp:].set(
        gb[:, : nsp * nsp].reshape(k, nsp, nsp))
    return gamma if batched else gamma[0]


def diagonal(ops, tabs):
    """Exact diagonal of the sector Hamiltonian over the (nB, nA) string
    grid — the Davidson preconditioner for exact sector diagonalization
    (solvers/davidson.py, orbital_optimization FusedOptOrbCASSCF).

    diag(ib, ia) = FA[ia,ia] + FB[ib,ib]
                 + sum_{a,b alpha} G2[a,b] (MA[a] MA[b])[ia,ia]
                 + sum_{a,b beta}  G2[a,b] (MB[a] MB[b])[ib,ib]
                 + sum_{a alpha, b beta} (G2[a,b] + G2[b,a])
                       diag(MA[a])[ia] diag(MB[b])[ib]

    (same-spin products need the full intermediate sum Σ_j M[a,i,j]
    M[b,j,i]; cross-spin products factor over the grid).  A few batched
    GEMMs — O(P^2 ns^2) once per outer iteration.  Padding-transparent
    like `sigma` (padded operators are zero matrices).  Exactness vs the
    dense sector Hamiltonian: tests/test_strings.py."""
    if "MA8" in tabs:
        return _diagonal_compact(ops, tabs)
    dt = ops["FA"].dtype
    MA = jnp.asarray(tabs["MA"], dtype=dt)
    MB = jnp.asarray(tabs["MB"], dtype=dt)
    qp = MA.shape[0]
    G2 = ops["G2"]
    AA = G2[:qp, :qp]
    BB = G2[qp:, qp:]
    W_cross = G2[:qp, qp:] + G2[qp:, :qp].T          # (qp, qp)
    dA1 = jnp.diagonal(ops["FA"])                    # (nA,)
    dB1 = jnp.diagonal(ops["FB"])                    # (nB,)
    DA = jnp.diagonal(MA, axis1=1, axis2=2)          # (qp, nA)
    DB = jnp.diagonal(MB, axis1=1, axis2=2)          # (qp, nB)
    # same-spin: d2[i] = sum_ab G2[a,b] sum_j M[a,i,j] M[b,j,i]
    WA = jnp.einsum("ab,bji->aij", AA, MA)      # WA[a,i,j] = Σb AA M[b,j,i]
    dA2 = jnp.einsum("aij,aij->i", MA, WA)
    WB = jnp.einsum("ab,bji->aij", BB, MB)
    dB2 = jnp.einsum("aij,aij->i", MB, WB)
    cross = jnp.einsum("ab,ai,bj->ji", W_cross, DA, DB)   # (nB, nA)
    return (dA1 + dA2)[None, :] + (dB1 + dB2)[:, None] + cross
