import os

# Default tier runs everything on virtual CPU devices for speed and
# determinism (the shared axon TPU chip must never be used by two jobs at
# once).  TPU-marked tests opt in with PPP_TEST_TPU=1, which leaves the
# default platform (axon) available.
if os.environ.get("PPP_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "")
else:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Multi-chip sharding is tested on a virtual 8-device CPU mesh (the axon
# TPU platform ignores XLA_FLAGS-based forcing, so request virtual CPU
# devices through the config knob before any backend initializes; tests
# that need them use jax.local_devices(backend="cpu")).
jax.config.update("jax_num_cpu_devices", 8)
