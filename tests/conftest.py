"""Test configuration: force an 8-device CPU mesh before JAX is imported.

Mirrors the reference's test philosophy (no physical accelerator needed,
/root/reference SURVEY §4): multi-device sharding is exercised via XLA's
host-platform device-count override.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
