"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (synthetic in-memory fixtures,
``/root/reference/tests``) and adds multi-device sharding tests on the CPU
backend per SURVEY.md §4: sharded results must equal single-device results.
"""

import os

# Force CPU for tests: fast compiles, deterministic, and enables a virtual
# 8-device mesh.  Set KAPTIVE_TPU_TEST_DEVICE=tpu to run the suite on a real
# chip instead.
if os.environ.get("KAPTIVE_TPU_TEST_DEVICE", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("KAPTIVE_TPU_INTERPRET", "1")  # Pallas interpret mode on CPU

    # The axon TPU plugin ignores JAX_PLATFORMS, so pin the default device to CPU
    # explicitly (tests that want the mesh use jax.devices("cpu") directly).
    import jax

    jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
