"""Test configuration: force an 8-virtual-device CPU platform.

All correctness and sharding tests run on CPU so they are independent of TPU
availability; the same code paths are exercised on real TPU by bench.py and
__graft_entry__.py.
"""

import os

# hard-set: the environment presets JAX_PLATFORMS=axon (TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
