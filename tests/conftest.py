"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices.  The environment pins
``JAX_PLATFORMS=axon`` (the tunnelled TPU); tests must override it — eager
op-by-op dispatch over the tunnel is seconds per primitive, and mesh tests
need 8 devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: full-model compiles are minutes on CPU; the
# cache makes repeat test runs fast.
from pasco_tpu.utils.cache import jax_cache_dir
jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
# Do NOT serialize XLA-internal (CPU AOT) blobs into cache entries: writing
# them intermittently aborts the process on the big train-step executables
# (observed twice at tests/test_train_step.py late in a full run), and
# loading blobs produced under another host's CPU features SIGILLs.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
