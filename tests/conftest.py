import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is not enough when a TPU plugin (axon) is installed —
# it registers itself regardless, so pin the platform via jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
