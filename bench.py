"""Benchmark: OptOrbVQE on H2 cc-pVTZ (56 spin orbitals) -> 4 spin orbitals.

The reference's headline configuration (README.md:38-94; published result
-1.8712471686505392 Ha).  The reference publishes no timing numbers, so the
baseline is a reference-faithful torch-CPU implementation executed in the
same process: torch.einsum spin-orbital energy functional + torch.autograd
BB projected-gradient inner loop (partial_unitary_projection_optimizer.py
semantics), per-Pauli sequential RDM estimation, and a finite-difference
L-BFGS VQE over a numpy statevector (qiskit VQE's default has no gradient).

Prints ONE JSON line:
  {"metric": ..., "value": <our wall s>, "unit": "s",
   "vs_baseline": <baseline_s / ours_s>, ...extras}
"""

import json
import time

import numpy as np

REF_ENERGY = -1.8712471686505392


# --------------------------------------------------------------------------
# shared problem setup (host, identical for both implementations)
# --------------------------------------------------------------------------

def build_problem():
    from esoo_tpu.chem import MoleculeDriver
    return MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="cc-pvtz").run()


# --------------------------------------------------------------------------
# our TPU-native flow
# --------------------------------------------------------------------------

def run_ours(problem):
    from esoo_tpu.sim import UCCSD, HartreeFock
    from esoo_tpu.orbital_optimization.fused import FusedOptOrbVQE

    def make_solver():
        ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
        return FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz,
                              problem=problem, maxiter=20,
                              stopping_tolerance=1e-5)

    # cold run (includes every jit compile)
    t0 = time.perf_counter()
    r = make_solver().compute_minimum_energy()
    cold = time.perf_counter() - t0
    # warm run (compile caches hot — the production steady state)
    t0 = time.perf_counter()
    r = make_solver().compute_minimum_energy()
    warm = time.perf_counter() - t0
    return r.eigenvalue, cold, warm, r.outer_iterations


# --------------------------------------------------------------------------
# reference-faithful torch-CPU baseline
# --------------------------------------------------------------------------

class _NumpyPauliSim:
    """Sequential per-Pauli statevector expectations (Aer-call shape)."""

    def __init__(self, num_qubits):
        self.n = num_qubits
        self.idx = np.arange(1 << num_qubits)

    def pauli_expect(self, state, x, z, y):
        perm = self.idx ^ x
        par = np.bitwise_count(np.bitwise_and(perm, z)) & 1
        sign = 1.0 - 2.0 * par
        return ((1j) ** (y % 4)) * np.sum(np.conj(state) * sign * state[perm])

    def apply_prot(self, state, x, z, y, angle):
        c, s = np.cos(angle / 2), np.sin(angle / 2)
        perm = self.idx ^ x
        par = np.bitwise_count(np.bitwise_and(perm, z)) & 1
        sign = 1.0 - 2.0 * par
        return c * state - 1j * s * ((1j) ** (y % 4)) * sign * state[perm]


def _simulate(sim, gates, params):
    state = np.zeros(1 << sim.n, dtype=complex)
    start = 0
    i = 0
    while i < len(gates) and gates[i].name == "x":
        start ^= 1 << gates[i].qubits[0]
        i += 1
    state[start] = 1.0
    for gt in gates[i:]:
        assert gt.name == "prot"
        x, z, y = gt.data
        kind, pidx, mult, off = gt.angle
        ang = mult * params[pidx] + off if kind == "param" else gt.angle[1]
        state = sim.apply_prot(state, x, z, y, ang)
    return state


def run_baseline(problem, time_budget_s=1800.0):
    import torch
    from scipy.optimize import minimize as scipy_minimize
    from esoo_tpu.ops import (ActiveSpaceHamiltonianBuilder, FermionicOp,
                              JordanWignerMapper)
    from esoo_tpu.sim import UCCSD, HartreeFock

    t_start = time.perf_counter()
    h_np, g_np = problem.integral_tensors()
    h = torch.from_numpy(h_np)
    g = torch.from_numpy(g_np)
    M, N = h_np.shape[0], 4
    m, n = M // 2, N // 2
    mapper = JordanWignerMapper()
    builder = ActiveSpaceHamiltonianBuilder(N)
    sim = _NumpyPauliSim(N)
    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))

    # RDM operator dict: every Pauli of every element, measured one by one
    pauli_set = {}
    decomp = {}
    for p in range(N):
        for q in range(N):
            key = ("1", p, q)
            op = mapper.map(FermionicOp({f"+_{p} -_{q}": 1.0}, N))
            decomp[key] = list(zip(op.xs, op.zs, op.coeffs))
            for x, z in zip(op.xs, op.zs):
                pauli_set[(x, z)] = None
    for p in range(N):
        for q in range(N):
            if p == q:
                continue
            for r in range(N):
                for s in range(N):
                    if r == s:
                        continue
                    key = ("2", p, q, r, s)
                    op = mapper.map(FermionicOp(
                        {f"+_{p} +_{q} -_{s} -_{r}": 1.0}, N))
                    decomp[key] = list(zip(op.xs, op.zs, op.coeffs))
                    for x, z in zip(op.xs, op.zs):
                        pauli_set[(x, z)] = None

    def orth_t(V):
        lam, Q = torch.linalg.eigh(V.T @ V)
        return V @ Q @ torch.diag(lam.rsqrt()) @ Q.T

    def rotated_energy_t(U_spatial, gamma, Gamma):
        U = torch.block_diag(U_spatial, U_spatial)
        e1 = torch.einsum("pq,pi,qj,ij", h, U, U, gamma)
        e2 = torch.einsum("pqrs,pi,qj,rk,sl,ijkl", g, U, U, U, U, Gamma)
        return e1 + e2

    def pupo_t(U0, gamma, Gamma, tol=1e-5, maxiter=10000, decay=0.8,
               tau=1e-3):
        U = orth_t(U0.clone()).requires_grad_(True)
        E = rotated_energy_t(U, gamma, Gamma)
        G = torch.autograd.grad(E, U)[0]
        U_prev, G_prev, E_prev = U.detach(), G, float(E)
        U = orth_t(U_prev - tau * G).requires_grad_(True)
        S = 1.5 * tol
        k = 1
        while S > tol and k <= maxiter:
            E = rotated_energy_t(U, gamma, Gamma)
            G = torch.autograd.grad(E, U)[0]
            dU = U.detach() - U_prev
            dG = G - G_prev
            uu = float(torch.sum(dU * dU))
            ug = abs(float(torch.sum(dU * dG)))
            gg = float(torch.sum(dG * dG))
            tau = uu / (ug + 1e-30) if k % 2 == 1 else ug / (gg + 1e-30)
            S = (1 - decay) * abs(float(E) - E_prev) + decay * S
            U_prev, G_prev, E_prev = U.detach(), G, float(E)
            U = orth_t(U_prev - tau * G).requires_grad_(True)
            k += 1
        return U_prev

    def vqe_t(Hop, x0):
        xs, zs, ys, coeffs = Hop.mask_arrays()

        def cost(theta):
            state = _simulate(sim, ansatz.gates, theta)
            return float(np.real(sum(
                c * sim.pauli_expect(state, x, z, y)
                for x, z, y, c in zip(xs, zs, ys, coeffs))))

        res = scipy_minimize(cost, x0, method="L-BFGS-B")  # 2-point FD jac
        return float(res.fun), res.x

    def measure_rdms_t(theta):
        state = _simulate(sim, ansatz.gates, theta)
        vals = {}
        for (x, z) in pauli_set:          # one sequential "estimator call" each
            y = bin(x & z).count("1")
            vals[(x, z)] = sim.pauli_expect(state, x, z, y)
        gamma = np.zeros((N, N), dtype=complex)
        Gamma = np.zeros((N, N, N, N), dtype=complex)
        for key, terms in decomp.items():
            v = sum(c * vals[(x, z)] for x, z, c in terms)
            if key[0] == "1":
                gamma[key[1], key[2]] = v
            else:
                Gamma[key[1], key[2], key[3], key[4]] = v
        return (torch.from_numpy(np.real(gamma)),
                torch.from_numpy(np.real(Gamma)))

    # outer loop (reference skeleton)
    U = torch.zeros((m, n), dtype=torch.float64)
    U[:n, :n] = torch.eye(n, dtype=torch.float64)
    theta = np.zeros(ansatz.num_parameters)
    energies = []
    it = 0
    while True:
        Ufull = torch.block_diag(U, U)
        h_rot = torch.einsum("pq,pi,qj->ij", h, Ufull, Ufull)
        g_rot = torch.einsum("pqrs,pi,qj,rk,sl->ijkl", g, Ufull, Ufull,
                             Ufull, Ufull)
        Hop = builder.build(h_rot.numpy(), g_rot.numpy())
        Hop.fermionic = None
        E, theta = vqe_t(Hop, theta)
        energies.append(E)
        if (len(energies) >= 2 and abs(energies[-1] - energies[-2]) < 1e-5) \
                or it >= 20 \
                or time.perf_counter() - t_start > time_budget_s:
            break
        gamma, Gamma = measure_rdms_t(theta)
        U = pupo_t(U, gamma, Gamma)
        it += 1
    return energies[-1], time.perf_counter() - t_start, it + 1


def main():
    problem = build_problem()
    ours_E, cold_s, warm_s, outer_iters = run_ours(problem)
    base_E, base_s, base_iters = run_baseline(problem)
    line = {
        "metric": "optorb_vqe_h2_ccpvtz_to_4so_wall_s",
        "value": round(warm_s, 3),
        "unit": "s",
        "vs_baseline": round(base_s / warm_s, 2),
        "energy": ours_E,
        "ref_energy": REF_ENERGY,
        "delta_e_vs_ref": ours_E - REF_ENERGY,
        "baseline_energy": base_E,
        "cold_wall_s": round(cold_s, 3),
        "baseline_wall_s": round(base_s, 3),
        "outer_iters": outer_iters,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
