"""Test configuration: force an 8-virtual-device CPU platform.

All correctness and sharding tests run on CPU so they are independent of TPU
availability; the same code paths are exercised on real TPU by bench.py and
__graft_entry__.py.

Note: the container's sitecustomize imports jax at interpreter startup and
registers the 'axon' TPU platform, so env vars are too late here — we must go
through jax.config.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
