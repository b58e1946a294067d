"""Test configuration: run on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count), mirroring how the reference treats
its SERIAL backend as the reference implementation all device backends must
match (reference: tests/mgard-x/CMakeLists.txt:12-53). Set MGARD_TPU_TEST_TPU=1
to run the suite on real TPU devices instead.
"""

import os

if not os.environ.get("MGARD_TPU_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
