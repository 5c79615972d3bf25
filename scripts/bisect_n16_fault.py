"""Bisect the H8 m=112 -> N=16 TPU worker kernel fault.

The fused OptOrb program at (m=112, n=8) reproducibly crashes the v5e
worker in BOTH full-space and sector simulation modes, while (m=112, n=6)
runs clean — so the fault lives in a shape-dependent piece shared by both:
the two-electron transform, the BB inner loop, or the sector-H build /
L-BFGS at those shapes.  Each candidate runs in its own subprocess so a
worker crash is recorded instead of killing the bisect.

Usage: python scripts/bisect_n16_fault.py  (needs the axon TPU backend)
"""

import subprocess
import sys

CASES = {
    # 1. transform forward, m=112 n=8, repeated
    "transform_fwd": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.orbital_optimization.kernels import rotate_two_body
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(112,)*4) / 112, jnp.float32)
u = jnp.asarray(np.linalg.qr(rng.normal(size=(112, 8)))[0], jnp.float32)
@jax.jit
def chain(g, u):
    def body(c, _):
        out = rotate_two_body(g, u + 1e-9 * c)
        return jnp.sum(out * out) * 1e-20, None
    s, _ = jax.lax.scan(body, jnp.zeros((), u.dtype), None, length=50)
    return s
print("transform_fwd:", float(np.asarray(chain(g, u))))
""",
    # 2. transform value_and_grad (the BB hot op)
    "transform_vag": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.orbital_optimization.kernels import rotate_two_body, rotate_one_body
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(112,)*4) / 112, jnp.float32)
h = jnp.asarray(rng.normal(size=(112, 112)), jnp.float32)
u0 = jnp.asarray(np.linalg.qr(rng.normal(size=(112, 8)))[0], jnp.float32)
gam = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
Gam = jnp.asarray(rng.normal(size=(8,)*4), jnp.float32)
def e(u, h, g, gam, Gam):
    return (jnp.sum(rotate_one_body(h, u) * gam)
            + jnp.sum(rotate_two_body(g, u) * Gam))
vag = jax.value_and_grad(e)
@jax.jit
def chain(u, h, g, gam, Gam):
    # h/g as ARGS: closing over the m^4 tensor embeds it as a program
    # constant -> HTTP 413 on the remote compile (looks like a hang)
    def body(c, _):
        v, gr = vag(c, h, g, gam, Gam)
        return c - 1e-6 * gr, v
    u, vs = jax.lax.scan(body, u, None, length=50)
    return jnp.sum(u) + jnp.sum(vs)
print("transform_vag:", float(np.asarray(chain(u0, h, g, gam, Gam))))
""",
    # 3. full BB inner loop at m=112 n=8 (orth eigh included)
    "inner_bb": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.orbital_optimization.fused import _inner_bb, _ORBITAL_VAG
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(112,)*4) / 112, jnp.float32)
h = jnp.asarray(rng.normal(size=(112, 112)), jnp.float32)
h = (h + h.T) / 2
u0 = jnp.asarray(np.linalg.qr(rng.normal(size=(112, 8)))[0], jnp.float32)
gam = jnp.eye(8, dtype=jnp.float32)
Gam = jnp.asarray(rng.normal(size=(8,)*4), jnp.float32) * 0.01
f = jax.jit(lambda u, gam, Gam, h, g: _inner_bb(
    _ORBITAL_VAG, u, (gam, Gam, h, g), jnp.float32(1e-3),
    jnp.float32(1e-5), jnp.float32(0.8), 200))
print("inner_bb:", float(np.asarray(jnp.sum(f(u0, gam, Gam, h, g)))))
""",
    # 4. sector L-BFGS at N=16 with fixed sector H (no transform)
    "sector_lbfgs": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.sector import SectorUCC
from esoo_tpu.solvers.lbfgs import lbfgs_minimize
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
sec = SectorUCC(ans, 16)
rng = np.random.default_rng(0)
H = rng.normal(size=(sec.dim, sec.dim)) * 0.01
H = jnp.asarray((H + H.T) / 2, jnp.float32)
th0 = jnp.zeros(ans.num_parameters, jnp.float32)
f = jax.jit(lambda t: lbfgs_minimize(sec.energy, t, args=(H,),
                                     maxiter=60, gtol=1e-5).fun)
print("sector_lbfgs:", float(np.asarray(f(th0))))
""",
    # 5. sector H build from rotated integrals at N=16 (+ transform)
    "sector_hbuild": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.sector import SectorUCC
from esoo_tpu.orbital_optimization.kernels import (rotate_one_body,
    rotate_two_body, expand_spin_tensors)
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
sec = SectorUCC(ans, 16)
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(112,)*4) / 112, jnp.float32)
h = jnp.asarray(rng.normal(size=(112, 112)), jnp.float32)
u = jnp.asarray(np.linalg.qr(rng.normal(size=(112, 8)))[0], jnp.float32)
@jax.jit
def f(u, h, g):
    h_so, g_so = expand_spin_tensors(rotate_one_body(h, u),
                                     rotate_two_body(g, u))
    return jnp.sum(sec.build_hamiltonian(h_so, g_so))
print("sector_hbuild:", float(np.asarray(f(u, h, g))))
""",
    # 6. FULL-SPACE L-BFGS VQE at N=16 with fixed active integrals (no
    # m=112 transform).  Round 3: the two-dispatch eigensolver program
    # (transform + full-space L-BFGS + RDMs) still crashed the worker, so
    # the full-space N=16 VQE itself — untested in round 2 — is the next
    # suspect.
    "full_lbfgs_n16": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.statevector import compile_circuit
from esoo_tpu.sim.rdm import rdm_energy
from esoo_tpu.solvers.lbfgs import lbfgs_minimize
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
state_fn = compile_circuit(ans).state_fn
rng = np.random.default_rng(0)
h_so = jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)
h_so = (h_so + h_so.T) / 2
g_so = jnp.asarray(rng.normal(size=(16,)*4) * 0.005, jnp.float32)
def cost(t, h, g):
    return rdm_energy(state_fn(t), h, g)
f = jax.jit(lambda t, h, g: lbfgs_minimize(cost, t, args=(h, g),
                                           maxiter=60, gtol=1e-5).fun)
th0 = jnp.zeros(ans.num_parameters, jnp.float32)
print("full_lbfgs_n16:", float(np.asarray(f(th0, h_so, g_so))))
""",
    # 6b. ONE value_and_grad dispatch at N=16 (remat active), timed —
    # separates compile cost from execute cost and tests whether a short
    # dispatch survives where the 60-iteration L-BFGS program dies
    # (long-running-dispatch kill theory).
    "full_vag_n16": """
import numpy as np, jax, jax.numpy as jnp, time
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.statevector import compile_circuit
from esoo_tpu.sim.rdm import rdm_energy
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
state_fn = compile_circuit(ans).state_fn
rng = np.random.default_rng(0)
h_so = jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)
h_so = (h_so + h_so.T) / 2
g_so = jnp.asarray(rng.normal(size=(16,)*4) * 0.005, jnp.float32)
vag = jax.jit(jax.value_and_grad(
    lambda t, h, g: rdm_energy(state_fn(t), h, g)))
th0 = jnp.full((ans.num_parameters,), 0.01, jnp.float32)
t0 = time.perf_counter()
v, gr = vag(th0, h_so, g_so)
v = float(np.asarray(v)); print("cold_s", round(time.perf_counter()-t0, 1), flush=True)
for i in range(3):
    t0 = time.perf_counter()
    v2, gr = vag(th0 + 1e-4 * i, h_so, g_so)
    v2 = float(np.asarray(v2))
    print("warm_s", round(time.perf_counter()-t0, 2), flush=True)
print("full_vag_n16:", v)
""",
    # 6c. SHORT L-BFGS (5 iterations) at N=16 — if per-eval cost is t,
    # a server-side dispatch-duration kill predicts: survives while
    # 5-iteration wall << the 60-iteration wall that crashes.
    "full_lbfgs5_n16": """
import numpy as np, jax, jax.numpy as jnp, time
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.statevector import compile_circuit
from esoo_tpu.sim.rdm import rdm_energy
from esoo_tpu.solvers.lbfgs import lbfgs_minimize
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
state_fn = compile_circuit(ans).state_fn
rng = np.random.default_rng(0)
h_so = jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)
h_so = (h_so + h_so.T) / 2
g_so = jnp.asarray(rng.normal(size=(16,)*4) * 0.005, jnp.float32)
def cost(t, h, g):
    return rdm_energy(state_fn(t), h, g)
f = jax.jit(lambda t, h, g: lbfgs_minimize(cost, t, args=(h, g),
                                           maxiter=5, gtol=1e-5).fun)
th0 = jnp.zeros(ans.num_parameters, jnp.float32)
t0 = time.perf_counter()
v = float(np.asarray(f(th0, h_so, g_so)))
print("cold_s", round(time.perf_counter()-t0, 1), flush=True)
t0 = time.perf_counter()
v = float(np.asarray(f(th0 + 1e-5, h_so, g_so)))
print("warm_s", round(time.perf_counter()-t0, 2), flush=True)
print("full_lbfgs5_n16:", v)
""",
    # 7. full-space RDM extraction at N=16
    "full_rdms_n16": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.statevector import compile_circuit
from esoo_tpu.sim.rdm import one_rdm, two_rdm
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
state_fn = compile_circuit(ans).state_fn
@jax.jit
def f(t):
    s = state_fn(t)
    return jnp.sum(one_rdm(s, 16)) + jnp.sum(two_rdm(s, 16))
th0 = jnp.full((ans.num_parameters,), 0.01, jnp.float32)
print("full_rdms_n16:", float(np.asarray(f(th0))))
""",
    # 8. the two-dispatch eigensolver program at m=112 -> N=16 with a
    # SHORT L-BFGS (is the crash scan-length-dependent?)
    "eig_program_short": """
import numpy as np, jax, jax.numpy as jnp
from esoo_tpu.sim import UCCSD, HartreeFock
from esoo_tpu.sim.statevector import compile_circuit
from esoo_tpu.orbital_optimization.fused import _eig_rdm_program
ans = UCCSD(8, (4, 4), initial_state=HartreeFock(8, (4, 4)))
state_fn = compile_circuit(ans).state_fn
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(112,)*4) / 112, jnp.float32)
h = jnp.asarray(rng.normal(size=(112, 112)), jnp.float32)
h = (h + h.T) / 2
u = jnp.asarray(np.linalg.qr(rng.normal(size=(112, 8)))[0], jnp.float32)
th0 = jnp.zeros(ans.num_parameters, jnp.float32)
th, E, gam, Gam = _eig_rdm_program(state_fn, 8, th0, u, h, g,
                                   vqe_maxiter=10)
print("eig_program_short:", float(np.asarray(E)))
""",
}

PROBE = """
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
print("alive", float(np.asarray(x @ x)[0, 0]))
"""


def wait_for_worker(max_tries=12, wait_s=60):
    """Block until the shared TPU worker answers a trivial matmul (it can
    need many minutes to come back after a kernel fault)."""
    import time
    for i in range(max_tries):
        try:
            r = subprocess.run([sys.executable, "-c", PROBE],
                               capture_output=True, text=True, timeout=120)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"  worker not ready (probe {i + 1}), waiting {wait_s}s",
              flush=True)
        time.sleep(wait_s)
    return False


def main():
    results = {}
    only = set(sys.argv[1:])
    for name, body in CASES.items():
        if only and name not in only:
            continue
        if not wait_for_worker():
            results[name] = (False, "worker never recovered")
            print(name, "SKIPPED (worker down)", flush=True)
            continue
        print(f"--- {name}", flush=True)
        try:
            r = subprocess.run([sys.executable, "-c", body],
                               capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            results[name] = (False, "TIMEOUT (tunnel down or huge compile)")
            print(name, "TIMEOUT", flush=True)
            continue
        ok = r.returncode == 0
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
        results[name] = (ok, tail[0])
        if r.stdout.strip():
            print(r.stdout.strip(), flush=True)   # per-phase timings
        print(name, "OK" if ok else "CRASH", tail[0][:150], flush=True)
    print(results)


if __name__ == "__main__":
    main()
