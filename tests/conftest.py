"""Test harness config.

All tests run on CPU with a virtual 8-device mesh (fake multi-chip, the
pattern the reference lacks — SURVEY.md §4(d)), keeping the suite hermetic
and runnable anywhere.  TPU-only tests are marked `tpu` and skipped unless a
TPU is attached AND RTM_TPU_TESTS=1.
"""
import os

# IMPORTANT environment note: the host bakes a TPU-tunnel PJRT plugin into
# every interpreter via sitecustomize, which imports jax at interpreter
# start — so the JAX_PLATFORMS *env var* is already consumed before this
# file runs, and setting os.environ here is a no-op.  jax.config.update is
# the only reliable override.  Without it, "CPU" tests silently execute on
# the tunneled TPU: ~20x slower compiles (remote compile round-trips),
# bf16-default matmuls, and hangs when the remote worker is wedged.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# RTM_TPU_TESTS=1 keeps the tunneled TPU REGISTERED (lowest priority, so
# every unmarked test still defaults to cpu) for the tpu-marked subset,
# which opts in per-test via jax.default_device.
if os.environ.get("RTM_TPU_TESTS") == "1":
    jax.config.update("jax_platforms", "cpu,axon")
else:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compile cache: the renderer's scan graphs are compile-heavy
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RTM_TPU_TESTS") != "1":
        skip = pytest.mark.skip(reason="TPU tests disabled (set RTM_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


def images_close(a, b, tol=2e-2, frac_bad=0.01, outlier_frac=0.003, mean_tol=5e-3):
    """Robust image comparison between two f32 path-tracer implementations.

    Grazing rays amplify last-bit f32 divergence, and a handful of chaotic
    paths may hit/miss differently (one lane's whole radiance changes), so:
    the mean abs diff must be tiny, at most `frac_bad` pixels may exceed
    `tol`, and at most `outlier_frac` may diverge catastrophically."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    diff = np.abs(a - b).max(axis=-1)
    assert diff.mean() <= mean_tol, f"mean diff {diff.mean():.5f} > {mean_tol}"
    frac = np.mean(diff > tol)
    assert frac <= frac_bad, f"{frac*100:.2f}% pixels differ > {tol} (max {diff.max()})"
    out = np.mean(diff > 0.2)
    assert out <= outlier_frac, f"{out*100:.2f}% catastrophic outliers (max {diff.max()})"


@pytest.fixture
def image_compare():
    return images_close
