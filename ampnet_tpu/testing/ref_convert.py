"""Convert reference (torch) AMPGCN weights into ampnet_tpu flax params.

Used by the parity harness: initialize the reference model, convert its
state_dict, and run both sides on identical inputs. Torch stores Linear
weights as [out, in]; flax Dense kernels are [in, out], hence the
transposes. The MHA packed in-projection (in_proj_weight [3D, D],
reference: torch nn.MultiheadAttention / amp_conv.py:18-22) maps to this
framework's w_qkv [D, 3D] with the same q|k|v block order.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(x.detach().cpu().numpy())


def _mha_params(mha) -> Dict[str, np.ndarray]:
    if mha.in_proj_weight is None:  # pragma: no cover - reference uses packed
        raise ValueError("expected packed in_proj_weight (kdim=vdim=embed_dim)")
    return {
        "w_qkv": _t(mha.in_proj_weight).T,     # [3D, D] -> [D, 3D]
        "b_qkv": _t(mha.in_proj_bias),
        "w_out": _t(mha.out_proj.weight).T,    # [D, D] -> [D, D] (in, out)
        "b_out": _t(mha.out_proj.bias),
    }


def reference_state_to_params(ref_model) -> Dict[str, Any]:
    """Map a reference AMPGCN (src/ampnet/module/amp_gcn.py:20-118) onto
    the flax param tree of ampnet_tpu.models.amp_gcn.AMPGCN."""
    params: Dict[str, Any] = {
        "tokenizer": {
            "feature_embedding_table": _t(ref_model.feature_embedding_table.weight)
        },
        "conv1": _mha_params(ref_model.conv1.multi_head_attention),
        "conv2": _mha_params(ref_model.conv2.multi_head_attention),
        "final_linear_out": {
            "kernel": _t(ref_model.final_linear_out.weight).T,
            "bias": _t(ref_model.final_linear_out.bias),
        },
    }
    if getattr(ref_model, "cls_token", None) is not None:
        # reference cls_token is [1, 1, D]; this framework stores the same
        params["cls_token"] = _t(ref_model.cls_token)
    return params
