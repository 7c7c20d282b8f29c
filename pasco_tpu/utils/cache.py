"""Persistent-compile-cache location, keyed by host CPU features.

The sandbox VM migrates between physical hosts; XLA:CPU AOT artifacts
compiled with one host's feature set (amx/avx512 variants) load on
another with only a warning (``cpu_aot_loader: Machine type used for
XLA:CPU compilation doesn't match``) and then SIGSEGV/SIGILL mid-test —
observed as a segfault inside a cached ``pjit`` program.  Keying the
cache directory by a fingerprint of ``/proc/cpuinfo`` flags makes stale
foreign-host artifacts unreachable (they just recompile once per host
flavor).  TPU-backend artifacts are host-agnostic but segregating them
too only costs one recompile after a migration.
"""

from __future__ import annotations

import hashlib
import os


def jax_cache_dir(base: str = "/tmp/pasco_jax_cache") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.md5(line.encode()).hexdigest()[:8]
                    return f"{base}_{fp}"
    except OSError:
        pass
    return base


def enable_persistent_cache(jax) -> None:
    jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
