"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Mirrors the strategy SURVEY.md section 4 prescribes: tier-(a) unit tests and
tier-(b/c) end-to-end runs execute on CPU-backed JAX; sharding tests use the
8 virtual host devices.  NOTE: the axon sitecustomize force-sets
jax_platforms='axon,cpu', so the env var alone is not enough — the config
update below is what actually selects CPU.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# host-fingerprinted cache dir: foreign-host AOT entries SIGILL (see
# esoo_tpu/utils/xla_cache.py)
from esoo_tpu.utils import xla_cache  # noqa: E402

xla_cache.setup(jax, min_compile_secs=1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _map_count() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:          # non-Linux: no limit to manage
        return 0


def _map_ceiling() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except OSError:
        return 65_530        # Linux default


def _try_raise_map_ceiling():
    """Best-effort: lift vm.max_map_count so the suite never hits the
    XLA:CPU jit map-leak cliff (round-4 profile: the cache drops the
    default ceiling forces, plus the recompiles after each drop, were a
    top-10 suite cost — measured 63.5 s in-suite vs 15.7 s isolated for
    the worst test).  Root-only; silently a no-op elsewhere (the
    _bound_jit_memory_maps fixture still protects stock kernels)."""
    try:
        if _map_ceiling() < 1_048_576:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write("1048576")
    except OSError:
        pass


_try_raise_map_ceiling()

# clear caches at 80% of the ACTUAL kernel ceiling: on a stock kernel
# (65,530) this is ~52k — the round-3 behavior — but with the ceiling
# raised (above, or sysctl vm.max_map_count=1048576; the CI workflow
# sets it) the suite never clears, which removes the ~17-20 s teardown
# cache drops AND the recompilations of shared programs they forced
# (round-4 tier profile: the drops were a top-10 cost with the default
# trigger)
_CLEAR_MAPS_AT = max(50_000, int(_map_ceiling() * 0.8))


def pytest_collection_modifyitems(config, items):
    """Run the two cache-wiping modules FIRST: test_split_precision's
    force_split toggles drop every live executable on each flip (the
    split policy is read at trace time, so toggling must invalidate jit
    caches) and test_parallel's module fixture does the same once (an
    XLA:CPU GSPMD-compile crash workaround, see
    test_parallel._fresh_compile_state).  jax.clear_caches() costs time
    proportional to what is cached (measured: ~3 s after one module,
    78.8 s at the tail of the full tier — the single most expensive
    "test" of round-5's profile), while process-exit teardown is ~free;
    so the wipes must run while the cache is still empty.  Head order
    also beats the round-4 tail order on sharing: test_parallel's
    unsharded twin programs stay cached for every later module instead
    of dying with the suite, and the GSPMD compiles run in the
    near-fresh compile state the crash workaround wants.
    test_split_precision goes absolutely first — its LAST flip restore
    still wipes, so it must precede test_parallel's compiles.

    After the two wipe modules, compile-HEAVY modules run before light
    ones: XLA:CPU compile latency grows with accumulated live JIT state
    (measured round 5: the sector energy/gradient oracles cost 28 s as
    the first module vs 73 s late in the tier, same box, warm disk
    cache, RAM free), so the suite minimizes sum(compile x
    state-at-compile-time) by front-loading the big compiles while the
    process is young.  Ranks follow the round-5 in-suite duration
    profile; unlisted modules keep collection order (stable sort)."""
    _ORDER = {
        "test_split_precision.py": -20, "test_parallel.py": -19,
        "test_sector.py": -18, "test_optorb_e2e.py": -17,
        "test_fused.py": -16, "test_casscf.py": -15,
        "test_properties.py": -14, "test_strings.py": -13,
        "test_eigensolvers.py": -12, "test_eigensolvers_matrix.py": -11,
        "test_geometry.py": -10, "test_sim.py": -9,
        "test_fused_diagnostics.py": -8, "test_cube.py": -7,
        "test_mappers.py": -6, "test_n2_showcase.py": -5,
        "test_fcidump.py": -4,
    }
    items.sort(key=lambda it: _ORDER.get(it.fspath.basename, 0))


@pytest.fixture(autouse=True)
def _bound_jit_memory_maps():
    """Every XLA:CPU jit compile leaks ~6+ virtual-memory mappings into
    the process (JIT code pages stay mapped while the executable is
    cached); the full suite's thousands of compiles exhaust the default
    vm.max_map_count=65530, after which the NEXT compile's mmap fails
    and LLVM SEGFAULTS (observed 3/3 at ~35%% of the tier, each time at
    whatever test compiled next; 67k maps measured at that point).
    Dropping jax's executable caches when the count nears the cliff
    keeps the suite on stock kernels at the cost of recompiling shared
    programs once past the drop; raising the kernel ceiling moves the
    trigger out of reach entirely (see _CLEAR_MAPS_AT)."""
    yield
    if _map_count() > _CLEAR_MAPS_AT:
        jax.clear_caches()


@pytest.fixture(scope="session")
def h2_sto3g():
    from esoo_tpu.chem import MoleculeDriver
    return MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="sto-3g").run()


@pytest.fixture(scope="session")
def h2_631g():
    from esoo_tpu.chem import MoleculeDriver
    return MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="6-31g").run()


@pytest.fixture(scope="session")
def h4_631g():
    from esoo_tpu.chem import MoleculeDriver
    return MoleculeDriver(
        atom="H 0 0 0; H 0 0 1.23; H 0 0 2.46; H 0 0 3.69",
        basis="6-31g").run()


@pytest.fixture(scope="session")
def h2_sto3g_hamiltonian(h2_sto3g):
    from esoo_tpu.ops import ActiveSpaceHamiltonianBuilder
    h, g = h2_sto3g.integral_tensors()
    return ActiveSpaceHamiltonianBuilder(4).build(h, g)


def random_hermitian_tensors(n, seed=0):
    """Random (h, g) with the index symmetries of real chemistry tensors."""
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(n, n))
    h = (h + h.T) / 2
    g = rng.normal(size=(n, n, n, n))
    # symmetrize like <pq|rs>: g[p,q,r,s] = g[q,p,s,r] = g[r,s,p,q]
    g = g + g.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    return h, g
