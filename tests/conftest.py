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


# ---- test tiering ----------------------------------------------------
# ``pytest -m smoke`` runs a <2-minute subset covering the load-bearing
# paths (halo exchange, EFP sums, continuity/remap/EOS units, config
# parsing, one end-to-end split step); everything else is the full
# suite (.testing's test-vs-regression split).
_SMOKE_MODULES = {
    "test_halo", "test_efp", "test_config", "test_eos",
    "test_continuity", "test_remapping", "test_coriolis",
    "test_pressure_force", "test_vert_friction", "test_tracer",
    "test_rotation", "test_kappa_convergence", "test_bt_cont",
    # the flagship verbatim-reference-config goldens: these being red
    # at snapshot is exactly what the smoke tier exists to prevent
    "test_ref_cases",
    # the fused Pallas continuity must stay bitwise-equivalent to the
    # jnp path (interpret mode); it is the default production path
    "test_continuity_pallas",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast load-bearing subset (<2 min)")
