"""Test configuration: run on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count), mirroring how the reference treats
its SERIAL backend as the reference implementation all device backends must
match (reference: tests/mgard-x/CMakeLists.txt:12-53). Set MGARD_TPU_TEST_TPU=1
to run the suite on real TPU devices instead.

The platform is *forced* (not setdefault): on machines where JAX_PLATFORMS
is already exported (e.g. a TPU bench rig) the numeric-oracle suite must
still run on CPU; the TPU smoke matrix is the deliberate opt-in.
"""

import os

if os.environ.get("MGARD_TPU_TEST_TPU"):
    # Deliberate TPU run: leave JAX_PLATFORMS alone (or whatever the rig set).
    pass
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Some rigs register an accelerator PJRT plugin from a sitecustomize
    # hook that force-updates jax.config jax_platforms, overriding the env
    # var. Counter it before any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")
