"""Test harness config: force CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh exactly as on a TPU slice (standard JAX practice;
see SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
