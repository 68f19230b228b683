"""Graph conv layers: AMPConv (edge attention) and GCNConv (baseline).

AMPConv is the reference's core op (src/ampnet/conv/amp_conv.py:9-51):
per-edge multi-head cross-attention messages, mean-aggregated per
destination node. Here attention weights are returned functionally
instead of cached on the module (the reference's mutable
`attn_output_weights` cache, amp_conv.py:12-13, is a data race under any
intra-process parallelism — SURVEY §5.2).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
from ampnet_tpu.ops.gcn import gcn_aggregate


class AMPConv(nn.Module):
    """Per-edge multi-head cross-attention message passing.

    Parameters mirror torch nn.MultiheadAttention (packed QKV projection,
    xavier-uniform kernels, zero biases — torch _reset_parameters).

    call: (x [N,S,D], senders [E], receivers [E], edge_mask [E]) ->
          (out [N,S,D], head-averaged attention weights [E,S,S] | None)
    """

    embed_dim: int
    num_heads: int
    softmax: bool = True          # False = no-softmax mode (see SURVEY §2.1)
    attn_dropout: float = 0.0
    use_pallas: bool = False
    dtype: Any = None             # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        edge_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = True,
        fused_fn=None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        d = self.embed_dim
        if x.shape[-1] != d:
            raise ValueError(f"expected last dim {d}, got {x.shape}")
        # torch nn.MultiheadAttention._reset_parameters xavier-inits only
        # in_proj; out_proj.weight keeps torch Linear's kaiming-uniform
        # default (a=sqrt(5) => bound 1/sqrt(fan_in), i.e. variance
        # scale 1/3 uniform over fan_in) and out_proj.bias is zeroed.
        kaiming_linear = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"
        )
        params = MHAParams(
            w_qkv=self.param("w_qkv", nn.initializers.xavier_uniform(), (d, 3 * d)),
            b_qkv=self.param("b_qkv", nn.initializers.zeros, (3 * d,)),
            w_out=self.param("w_out", kaiming_linear, (d, d)),
            b_out=self.param("b_out", nn.initializers.zeros, (d,)),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            params = MHAParams(*(p.astype(self.dtype) for p in params))
        dropout_rng = None
        if self.attn_dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        if fused_fn is not None:
            # fused Pallas path: edge layout precomputed host-side via
            # ops.pallas.make_pallas_edge_attention (weights not returned)
            return fused_fn(x, params), None
        return amp_edge_attention(
            x,
            senders,
            receivers,
            edge_mask,
            params,
            self.num_heads,
            softmax=self.softmax,
            dropout_rate=self.attn_dropout if not deterministic else 0.0,
            dropout_rng=dropout_rng,
            return_weights=return_weights,
        )


class GCNConv(nn.Module):
    """Kipf-Welling GCN layer: out = D^-1/2 (A+I) D^-1/2 X W + b
    (reference baseline: src/ampnet/module/gcn_classifier.py:52-55 via
    PyG GCNConv)."""

    features: int
    use_bias: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # PyG GCNConv: glorot kernel, zero bias; transform then propagate.
        h = nn.Dense(
            self.features,
            use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        out = gcn_aggregate(
            h, senders, receivers, x.shape[0], edge_mask, self.add_self_loops
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b
        return out


def dropout_edges(
    key: jax.Array,
    edge_mask: jnp.ndarray,
    rate: float,
) -> jnp.ndarray:
    """Randomly drop edges (PyG dropout_adj, used at amp_gcn.py:241):
    each real edge kept with probability 1-rate."""
    keep = jax.random.bernoulli(key, 1.0 - rate, edge_mask.shape)
    return edge_mask & keep
