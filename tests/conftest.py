"""Test harness config: force CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh exactly as on a TPU slice (standard JAX practice;
see SURVEY.md section 4).

NOTE: this environment pre-imports jax via sitecustomize with
``JAX_PLATFORMS=axon`` (the TPU tunnel), so env vars are too late - the
platform must be overridden through jax.config before any backend is
touched."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Interpret-mode megakernel cost scales with tile size (lanes x slots, no
# real VPU); the TPU default (96) makes tiny test renders crawl. 32 keeps
# multi-tile coverage on 64px-wide test images. Perf-knob only - kernel
# output is tile-size invariant (tests in test_megakernel assert that).
os.environ.setdefault("RTX_MEGA_TS", "32")
