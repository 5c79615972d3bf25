"""Host-fingerprinted persistent XLA compile-cache location.

The XLA:CPU AOT cache embeds the COMPILE machine's CPU feature set; the
round driver reschedules work across VMs whose CPU flags differ, and
loading a foreign entry makes XLA warn "could lead to execution errors
such as SIGILL" — and then actually SIGILL/crash mid-suite (observed:
the fast tier died with a faulthandler dump after a cache populated on
another host was reused).  Keying the cache directory by a hash of the
host's CPU flags makes entries machine-local; data caches (MO-tensor
npz, Slater-Condon structure) stay in the shared base dir because they
are pure numerical content.
"""

from __future__ import annotations

import hashlib
import os

# $ESOO_CACHE_DIR relocates every esoo cache (same convention as the
# Slater-Condon structure cache, sim/sector.py) — lets a test run use a
# cloned cache while another process writes the primary one.
BASE = os.environ.get("ESOO_CACHE_DIR",
                      os.path.expanduser("~/.cache/esoo_jax"))


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def setup(jax, min_compile_secs: float = 5.0) -> str:
    """Point jax's persistent compile cache at the host-local dir.

    Two hardening choices, both from an observed in-process SEGV inside
    `compilation_cache.put_executable_and_time` while serializing a
    GSPMD (4-device-mesh) executable mid-suite (jax 0.9.0):
      * XLA-side auxiliary caches are not written
        (`jax_persistent_cache_enable_xla_caches='none'`) — the jax
        executable cache alone is what saves the minutes-long fused
        recompiles;
      * by default only compiles >= 5 s are persisted, so the many
        small programs (whose recompiles are cheap anyway) never
        exercise the serializer.  The test conftest lowers the bar to
        1 s: the GSPMD crash sites now compile at the HEAD of the suite
        (near-empty JIT state — the trigger was accumulated state), and
        persisting the hundreds of 1-5 s test programs makes repeat
        tier runs disk loads instead of recompiles.
    """
    path = os.path.join(BASE, f"xla-{_cpu_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "none")
    except Exception:  # pragma: no cover - older jax without the knob
        pass
    return path
