"""PyG-free execution harness for the UNMODIFIED reference implementation.

BASELINE.md's validation clause asks for per-layer allclose and trained
accuracy against "the reference PyG implementation" — but the reference
has `torch_geometric` as a dependency and this environment has torch
(CPU) only. In the reference's model path PyG supplies exactly three
things:

  * ``MessagePassing`` with ``aggr='mean'`` and ``propagate(edge_index,
    x=x)`` — gather ``x_i = x[dst]`` / ``x_j = x[src]``, call
    ``self.message(x_i, x_j)``, scatter-mean by destination
    (reference: src/ampnet/conv/amp_conv.py:9-26);
  * ``dropout_adj(edge_index, p, training)`` — Bernoulli edge dropout
    (reference: src/ampnet/module/amp_gcn.py:241);
  * ``Planetoid`` dataset loading — replaced here by the same surrogate
    arrays the JAX framework trains on, so both sides see identical data.

This module installs minimal, semantically-exact stand-ins for those into
``sys.modules`` (plus an inert ``umap`` stub — imported by
src/ampnet/utils/preprocess.py:3 but unused on the model path), then
imports the reference's own ``AMPGCN`` / ``AMPConv`` classes from the
reference checkout. Parity tests therefore execute the reference's actual
forward code (amp_gcn.py:239-276, amp_conv.py:24-51) line for line.

PyG semantics reproduced (and unit-tested in tests/test_reference_parity.py):
  * default flow='source_to_target': ``edge_index[0]`` is the message
    SOURCE (j), ``edge_index[1]`` the TARGET (i); ``x_i`` gathers targets,
    ``x_j`` sources; aggregation groups by target index.
  * mean aggregation over incoming edges; nodes with no incoming edge
    produce zeros (torch_scatter's scatter-mean convention).
  * output row count = x.size(0).
"""
from __future__ import annotations

import os
import sys
import types
from typing import Optional

DEFAULT_REFERENCE_ROOT = "/root/reference"


def reference_available(root: Optional[str] = None) -> bool:
    root = root or os.environ.get("AMPNET_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)
    return os.path.isdir(os.path.join(root, "src", "ampnet"))


class Data:
    """Minimal stand-in for torch_geometric.data.Data: an attribute bag
    with the `.to(device)` the reference calls (amp_gcn.py:240)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def to(self, device):
        return self

    @property
    def num_nodes(self):
        return self.x.shape[0]


def _build_shims():
    """Construct the fake torch_geometric (+umap) module tree."""
    import torch

    class MessagePassing(torch.nn.Module):
        """PyG MessagePassing, restricted to what the reference uses:
        aggr='mean', propagate(edge_index, x=x), message(x_i, x_j)."""

        def __init__(self, aggr: str = "add", **kwargs):
            super().__init__()
            if aggr != "mean":
                raise NotImplementedError(
                    f"shim supports aggr='mean' only (got {aggr!r}); the "
                    "reference always constructs with aggr='mean' "
                    "(amp_conv.py:11)"
                )
            self.aggr = aggr

        def propagate(self, edge_index, x=None, **kwargs):
            if x is None:
                raise ValueError("shim propagate requires x=")
            src, dst = edge_index[0], edge_index[1]
            x_i = x.index_select(0, dst)   # target/query rows
            x_j = x.index_select(0, src)   # source/key-value rows
            msg = self.message(x_i=x_i, x_j=x_j)
            n = x.shape[0]
            out = torch.zeros((n, msg.shape[1]), dtype=msg.dtype)
            out.index_add_(0, dst, msg)
            count = torch.zeros((n,), dtype=msg.dtype)
            count.index_add_(0, dst, torch.ones(dst.shape[0], dtype=msg.dtype))
            return out / count.clamp(min=1).unsqueeze(-1)

        def message(self, x_i, x_j):  # pragma: no cover - always overridden
            raise NotImplementedError

    def dropout_adj(edge_index=None, edge_attr=None, p=0.5, training=True,
                    **kwargs):
        """PyG dropout_adj: keep each edge independently with prob 1-p."""
        if not training or p == 0.0:
            return edge_index, edge_attr
        import torch as _t

        keep = _t.rand(edge_index.shape[1]) >= p
        edge_index = edge_index[:, keep]
        if edge_attr is not None:
            edge_attr = edge_attr[keep]
        return edge_index, edge_attr

    class Planetoid:  # pragma: no cover - harness feeds surrogate arrays
        def __init__(self, *a, **k):
            raise RuntimeError(
                "Planetoid is not available in the harness; build a Data "
                "object from ampnet_tpu.data.planetoid arrays instead"
            )

    class GCNConv(torch.nn.Module):  # pragma: no cover - baseline-only import
        def __init__(self, *a, **k):
            raise NotImplementedError("shim does not implement GCNConv")

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_nn.GCNConv = GCNConv
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data.Data = Data
    tg_datasets = types.ModuleType("torch_geometric.datasets")
    tg_datasets.Planetoid = Planetoid
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils_dropout = types.ModuleType("torch_geometric.utils.dropout")
    tg_utils_dropout.dropout_adj = dropout_adj
    tg_utils.dropout = tg_utils_dropout
    tg_utils.dropout_adj = dropout_adj
    tg.nn = tg_nn
    tg.data = tg_data
    tg.datasets = tg_datasets
    tg.utils = tg_utils

    umap_mod = types.ModuleType("umap")

    class _UMAPUnavailable:
        def __init__(self, *a, **k):
            # ImportError (not RuntimeError) so callers with an
            # import-guarded fallback (interpret.embedding.plot_umap_2d)
            # treat the fake module exactly like an absent one — the fake
            # exists only so the reference's module-level `import umap`
            # succeeds, and it leaks process-wide via sys.modules once
            # pytest collects the parity tests.
            raise ImportError("umap-learn is not installed (pyg_shim fake)")

    umap_mod.UMAP = _UMAPUnavailable

    return {
        "torch_geometric": tg,
        "torch_geometric.nn": tg_nn,
        "torch_geometric.data": tg_data,
        "torch_geometric.datasets": tg_datasets,
        "torch_geometric.utils": tg_utils,
        "torch_geometric.utils.dropout": tg_utils_dropout,
        "umap": umap_mod,
    }


def install_shims() -> None:
    """Install the fake modules (idempotent; never clobbers a real PyG)."""
    mods = _build_shims()
    for name, mod in mods.items():
        if name not in sys.modules:
            sys.modules[name] = mod


def load_reference(root: Optional[str] = None):
    """Import the reference's AMPGCN/AMPConv unmodified.

    Returns a namespace with .AMPGCN, .AMPConv, .amp_gcn (module),
    .amp_conv (module). Raises FileNotFoundError when the reference
    checkout is absent (tests skip on that).
    """
    root = root or os.environ.get("AMPNET_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)
    if not reference_available(root):
        raise FileNotFoundError(f"reference checkout not found at {root}")
    os.environ.setdefault("MPLBACKEND", "Agg")
    install_shims()
    if root not in sys.path:
        sys.path.insert(0, root)
    from src.ampnet.conv import amp_conv  # noqa: E402  (reference code)
    from src.ampnet.module import amp_gcn  # noqa: E402

    ns = types.SimpleNamespace(
        AMPGCN=amp_gcn.AMPGCN,
        AMPConv=amp_conv.AMPConv,
        amp_gcn=amp_gcn,
        amp_conv=amp_conv,
        root=root,
    )
    return ns
