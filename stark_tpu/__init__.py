"""stark_tpu — a TPU-native strongly-coupled rigid/deformable simulator.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
InteractiveComputerGraphics/stark (reference surveyed in SURVEY.md): one global
incremental potential per time step, every physical effect expressed as an
energy term over next-step velocities, minimized by projected Newton with a
matrix-free block-diagonal-preconditioned CG and a 4-stage line search.

The reference's SymX symbolic-differentiation + C-codegen engine
(stark/extern/symx) is replaced by `jax.grad`/`jax.hessian` over vmapped
per-element energy functions compiled by XLA; its OpenMP data parallelism is
replaced by SPMD sharding over a `jax.sharding.Mesh`.
"""
import os

# f64 support must be enabled before any jax array is created. The reference
# is all-double (SYMX float type, Eigen::VectorXd); trajectory-parity tests
# need f64, while performance paths may select f32 per-simulation.
import jax

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache — the analog of the reference's SHA-keyed
# kernel cache (symx Compilation.cpp:59-121 caches dlopen'ed .so files by
# expression checksum; warm starts skip codegen entirely). Critical on TPU
# where compiles go through a remote-compile service.
_cache_dir = os.environ.get("STARK_TPU_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/stark_tpu_xla"))
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from .simulation import Simulation  # noqa: E402,F401
from .core.settings import Settings  # noqa: E402,F401

__version__ = "0.1.0"
