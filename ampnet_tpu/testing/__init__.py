"""Test-support utilities: the PyG-free reference execution harness.

These modules exist so parity can be measured against the reference's
OWN code (imported unmodified from the reference checkout) instead of
against re-implementations of it. Nothing here is on any training or
serving path.
"""
from ampnet_tpu.testing.pyg_shim import (  # noqa: F401
    Data,
    install_shims,
    load_reference,
    reference_available,
)
