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

from ampnet_tpu.ops.edge_attention import (
    MHAParams,
    amp_edge_attention,
    edge_attention_weights,
)
from ampnet_tpu.ops.gcn import gcn_aggregate
from ampnet_tpu.ops.pallas.format import DEFAULT_TILE_NODES


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
        layout=None,            # ops.pallas.format.EdgeLayout for use_pallas
        pallas_interpret: Optional[bool] = None,
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

        if fused_fn is None and self.use_pallas and layout is not None:
            # cfg.use_pallas honored end-to-end: build the fused call from
            # the layout (tiled-CSR arrays are DATA — one executable across
            # GraphSAINT subgraphs sharing a pad budget).
            from ampnet_tpu.ops.pallas.edge_attention_fused import (
                amp_edge_attention_pallas,
            )

            if pallas_interpret is None:
                pallas_interpret = jax.default_backend() != "tpu"

            if d % 128 and not pallas_interpret:
                # Mosaic requires the kernels' K|V lane-dim slices (offsets
                # at multiples of D) aligned to the 128-lane tiling — a
                # D=100 (the reference's default emb) or D=16 config fails
                # at compile with "Slice shape ... must be aligned to
                # tiling (128)" (found r3 validating the README snippet on
                # chip). Fall back to the XLA path rather than crash.
                import warnings

                warnings.warn(
                    f"use_pallas: embed_dim={d} is not a multiple of 128; "
                    "the fused TPU kernels need 128-lane-aligned K|V "
                    "slices — falling back to the XLA conv path "
                    "(use embed_dim=128/256/... for the fused kernels)",
                    stacklevel=2,
                )
                self_use_pallas = False
            else:
                self_use_pallas = True

            # Runtime edge validity: scatter the (possibly dropout-
            # modified) edge mask into the layout's slots so the kernel
            # honors it; trip counts stay STRUCTURAL (layout counts).
            tile_valid = layout.tile_valid
            tile_counts = getattr(layout, "tile_counts", None)
            edge_slot = getattr(layout, "edge_slot", None)
            if edge_mask is not None and edge_slot is not None:
                t, emax = layout.tile_valid.shape
                slot = jnp.where(edge_slot < 0, t * emax, edge_slot)
                flat = jnp.zeros((t * emax + 1,), jnp.int32).at[slot].set(
                    edge_mask.astype(jnp.int32)
                )
                tile_valid = flat[:-1].reshape(t, emax)
                if tile_counts is None:
                    tile_counts = jnp.sum(layout.tile_valid != 0, axis=-1)

            if self_use_pallas:
                def fused_fn(xx, pp):
                    return amp_edge_attention_pallas(
                        xx, pp, senders, receivers, edge_mask,
                        layout.tile_senders, layout.tile_recv, tile_valid,
                        num_heads=self.num_heads, softmax=self.softmax,
                        tile_nodes=getattr(layout, "tile_nodes", DEFAULT_TILE_NODES),
                        interpret=pallas_interpret, tile_counts=tile_counts,
                        # transposed layout (scatter-free backward); the op
                        # scatters the runtime edge_mask into snd validity
                        # itself via snd_edge_slot
                        snd_receivers=getattr(layout, "snd_receivers", None),
                        snd_local=getattr(layout, "snd_local", None),
                        snd_valid=getattr(layout, "snd_valid", None),
                        snd_counts=getattr(layout, "snd_counts", None),
                        snd_edge_slot=getattr(layout, "snd_edge_slot", None),
                    )

        if fused_fn is not None:
            # Fused Pallas path. The kernel never materializes per-edge
            # weights; when the caller asks for them (interpretability is a
            # first-class output, SURVEY §3.4) run the half-cost
            # weights-only pass on the side.
            if dropout_rng is not None:
                raise ValueError(
                    "attn_dropout is not supported on the fused Pallas path "
                    "(reference runs MHA with dropout=0, amp_conv.py:18)"
                )
            out = fused_fn(x, params)
            weights = None
            if return_weights:
                weights = edge_attention_weights(
                    x, senders, receivers, params, self.num_heads,
                    softmax=self.softmax,
                )
            return out, weights
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
