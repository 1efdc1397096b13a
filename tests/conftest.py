import os

# Multi-chip sharding is tested on a virtual 8-device CPU mesh (the axon
# TPU platform ignores JAX_PLATFORMS/XLA_FLAGS, so request virtual CPU
# devices through the config knob before any backend initializes; tests
# that need them use jax.local_devices(backend="cpu")).
os.environ.setdefault("JAX_PLATFORMS", "")
import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
