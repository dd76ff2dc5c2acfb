"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (synthetic in-memory fixtures,
``/root/reference/tests``) and adds multi-device sharding tests on the CPU
backend per SURVEY.md §4: sharded results must equal single-device results.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("KAPTIVE_TPU_INTERPRET", "1")  # Pallas interpret mode on CPU
