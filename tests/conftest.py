import os

# Tests run on a virtual 8-device CPU mesh so collectives (SyncBN pmean,
# grad psum, memobank all_gather) are exercised without TPU hardware.
#
# The sandbox exports JAX_PLATFORMS=axon and a sitecustomize that imports
# jax at interpreter startup to register the tunneled TPU plugin — so both
# the env var and an os.environ override here are ineffective.  The backend
# itself is created lazily, so forcing the platform through jax.config
# BEFORE any device use still works; without it the whole suite silently
# runs on one real TPU chip, where f32 convs use the backend's fast
# (bf16-pass) precision and numeric-parity tolerances break.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "a non-CPU jax backend was already initialized before tests/conftest.py "
    "could force the CPU platform; run pytest in a fresh process"
)
assert len(jax.devices()) >= 8, jax.devices()
