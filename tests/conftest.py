"""Test configuration: force CPU jax with 8 virtual devices so multi-chip sharding
logic is testable without a TPU pod (SURVEY §4 TPU-build implication).

NOTE: this environment's TPU plugin (axon) force-registers itself and overrides
``JAX_PLATFORMS`` from the environment, so we must override via ``jax.config``
*before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("GR4TPU_TEST_TPU"):
    # default: CPU (the axon plugin would otherwise force the TPU backend);
    # set GR4TPU_TEST_TPU=1 to run the suite against the real chip
    jax.config.update("jax_platforms", "cpu")
else:
    # On the chip, unpinned dots (test-side ``@``, interpret-mode Pallas)
    # default to bf16 operands: measured 2.4e-3 relative error
    # (scripts/tpu_precision_probe.py) — which fails every f32-tolerance
    # equivalence assert while saying nothing about the op under test. The
    # SUITE's correctness contract is f32: pin the *default* to HIGHEST.
    # Ops that explicitly choose a perf rung (precision=HIGH/bf16/int8
    # arguments) are unaffected — their contracts are asserted separately.
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
