import os

import jax

# Default tier runs everything on virtual CPU devices for speed and
# determinism (the shared axon TPU chip must never be used by two jobs at
# once).  IMPORTANT: this environment IGNORES the JAX_PLATFORMS env var -
# the platform must be restricted through the config knob before any
# backend initializes.  TPU-marked tests opt in with PPP_TEST_TPU=1.
if not os.environ.get("PPP_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Multi-chip sharding is tested on a virtual 8-device CPU mesh; tests that
# need it use jax.local_devices(backend="cpu").
jax.config.update("jax_num_cpu_devices", 8)
