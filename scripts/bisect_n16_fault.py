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
}


def main():
    results = {}
    for name, body in CASES.items():
        print(f"--- {name}", flush=True)
        try:
            r = subprocess.run([sys.executable, "-c", body],
                               capture_output=True, text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            results[name] = (False, "TIMEOUT (tunnel down or huge compile)")
            print(name, "TIMEOUT", flush=True)
            continue
        ok = r.returncode == 0
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
        results[name] = (ok, tail[0])
        print(name, "OK" if ok else "CRASH", tail[0][:150], flush=True)
    print(results)


if __name__ == "__main__":
    main()
