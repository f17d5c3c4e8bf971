"""Test configuration: CPU backend with 8 virtual devices, float64.

Tests run on a virtual 8-device CPU mesh (the layout-invariance harness
of the reference, .testing/Makefile test.layout, needs ≥2 "ranks") with
float64 enabled for tight conservation checks.  TPU execution is
exercised separately by bench.py / __graft_entry__.py.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU platform; tests want the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
