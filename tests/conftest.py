import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (see SURVEY.md §2.3 / driver contract).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start; override it back so tests stay on the CPU mesh.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tests (deselect with -m 'not slow')"
    )
