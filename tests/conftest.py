"""Test configuration: force an 8-device virtual CPU platform.

Per SURVEY.md SS4/SS7: multi-device (pjit data-parallel) paths are exercised
on forced CPU devices because only one physical TPU chip is attached.  Must
run before jax is imported anywhere.
"""

import os
import sys
from pathlib import Path

# The machine profile exports JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on virtual CPU devices, so override unconditionally.  Also unload the
# axon PJRT plugin entirely (its registration can block on the TPU tunnel
# even when only the CPU backend is requested).
os.environ["JAX_PLATFORMS"] = "cpu"
for _var in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
    os.environ.pop(_var, None)
# Full-f32 matmuls for golden-value comparisons; production TPU code uses the
# bf16-friendly default instead.
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The axon distribution force-selects its platform programmatically at
# ``import jax`` (ignoring the JAX_PLATFORMS env var), so the env vars above
# are not sufficient -- override the config explicitly before any backend
# initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent XLA compile cache: the suite is compile-bound on this host's
# single CPU core (~15-25 s per full-model jit), so cache hits cut repeat
# suite runs several-fold.  The env var alone does not reliably enable the
# cache here; the config calls do (probed round 3).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
