"""Test harness: force CPU with 8 virtual devices (the JAX-native fake
backend for multi-chip tests — SURVEY §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and
sets jax_platforms programmatically, so the env var alone is not enough —
we override the config after import, before any backend initializes.
Tests also pin matmul precision to 'highest': parity oracles (torch CPU)
are fp32-exact, while TPU's default matmul precision is bf16.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
