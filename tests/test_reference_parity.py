"""Parity against the reference's OWN code (BASELINE.md validation clause:
"activations allclose vs reference PyG implementation").

The reference AMPGCN/AMPConv are imported UNMODIFIED from the reference
checkout through the PyG-free shim (ampnet_tpu/testing/pyg_shim.py — torch
is installed here; PyG's role in the model path is a gather + scatter-mean
the shim reproduces exactly). Both sides then run the same graph with the
reference's sampled token indices injected and dropout off (SURVEY §7.4:
"per-layer allclose requires injecting identical sampled indices and
disabling dropout"), per-layer activations compared:

  tokens -> conv1 (pre-ReLU) -> conv2 (pre-ReLU) -> pooled -> log-probs
  (reference: src/ampnet/module/amp_gcn.py:239-276, conv/amp_conv.py:24-51)

plus the head-averaged attention weights of both convs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ampnet_tpu.testing import pyg_shim

if not pyg_shim.reference_available():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models.amp_gcn import AMPGCN
from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
from ampnet_tpu.testing.ref_convert import _mha_params, reference_state_to_params

REF = pyg_shim.load_reference()

# small but non-trivial: multiple heads, uneven in-degrees, all dims distinct
N, F, S, D, H, C, E = 24, 40, 6, 16, 2, 3, 60


def make_case(seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((N, F)) < 0.25).astype(np.float32) * rng.random((N, F)).astype(np.float32)
    x[x.sum(1) == 0, 0] = 0.5  # reference's np.random.choice crashes on empty nodes
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
    return x, ei


def test_shim_scatter_mean_semantics():
    """The shim's propagate must match PyG MessagePassing(aggr='mean')
    semantics — hand-computed oracle in the style of the reference's own
    star-graph check (synthetic_benchmark/testing_message_passing_pyg.py:37-40):
    identity message, mean over INCOMING edges grouped by edge_index[1],
    zero for nodes with no in-edges."""

    class Identity(pyg_shim.load_reference().amp_conv.AMPConv.__bases__[0]):
        def message(self, x_i, x_j):
            return x_j

    x = torch.tensor([[1.0, 1.0], [2.0, 2.0], [0.0, 0.0], [5.0, 5.0], [0.0, 0.0]])
    # edges: 0->2, 1->2, 3->4
    ei = torch.tensor([[0, 1, 3], [2, 2, 4]])
    out = Identity(aggr="mean").propagate(ei, x=x)
    expected = torch.tensor(
        [[0.0, 0.0], [0.0, 0.0], [1.5, 1.5], [0.0, 0.0], [5.0, 5.0]]
    )
    torch.testing.assert_close(out, expected)


def test_amp_conv_parity():
    """Reference AMPConv (amp_conv.py:9-51) vs ops.amp_edge_attention on
    identical tokenized inputs + identical weights: outputs and
    head-averaged attention weights allclose."""
    rng = np.random.default_rng(1)
    x_tok = rng.standard_normal((N, S * D)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)

    torch.manual_seed(0)
    conv = REF.AMPConv(embed_dim=D, num_heads=H).eval()
    with torch.no_grad():
        ref_out = conv(torch.from_numpy(x_tok), torch.from_numpy(ei))
    ref_w = conv.attn_output_weights.detach().numpy()        # [E, S, S]

    p = {k: jnp.asarray(v) for k, v in _mha_params(conv.multi_head_attention).items()}
    out, w = amp_edge_attention(
        jnp.asarray(x_tok.reshape(N, S, D)),
        jnp.asarray(ei[0].astype(np.int32)),
        jnp.asarray(ei[1].astype(np.int32)),
        None,
        MHAParams(**p),
        H,
        softmax=True,
        return_weights=True,
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(N, S * D), ref_out.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(w), ref_w, rtol=1e-4, atol=2e-5)


def run_reference_forward(x, ei, seed=7):
    """Run the unmodified reference AMPGCN end-to-end (eval mode), return
    per-layer activations + the sampled indices it drew."""
    torch.manual_seed(seed)
    model = REF.AMPGCN(
        device="cpu", embedding_dim=D, num_heads=H, num_node_features=F,
        num_sampled_vectors=S, output_dim=C, softmax_out=True,
        feat_emb_dim=D - 1, val_emb_dim=1, downsample_feature_vectors=True,
        average_pooling_flag=True, dropout_rate=0.0, dropout_adj_rate=0.0,
        feature_repeats=1,
    ).eval()
    np.random.seed(seed)  # reference samples via global numpy RNG (amp_gcn.py:135)
    with torch.no_grad():
        out = model(pyg_shim.Data(x=torch.from_numpy(x), edge_index=torch.from_numpy(ei)))
    acts = {
        "logits": out.numpy(),
        "sampled_idx": np.asarray(model.sampled_node_feat_indices),
        "conv1": model.conv1_embedding.numpy().reshape(N, S, D),
        "conv2": model.conv2_embedding.numpy().reshape(N, S, D),
        "attn1": model.conv1.attn_output_weights.numpy(),
        "attn2": model.conv2.attn_output_weights.numpy(),
    }
    return model, acts


def test_ampgcn_per_layer_parity():
    x, ei = make_case()
    ref_model, ref = run_reference_forward(x, ei)

    cfg = AMPGCNConfig(
        embedding_dim=D, num_heads=H, num_node_features=F,
        num_sampled_vectors=S, output_dim=C, feat_emb_dim=D - 1,
        val_emb_dim=1, dropout_rate=0.0, dropout_adj_rate=0.0,
        scaler="batch",  # reference refits per batch (amp_gcn.py:122-124)
    )
    g = from_arrays(x, ei, node_multiple=N)  # N already aligned: no pad rows
    params = jax.tree_util.tree_map(
        jnp.asarray, reference_state_to_params(ref_model)
    )
    out = AMPGCN(config=cfg).apply(
        {"params": params}, g, deterministic=True,
        sampled_idx=jnp.asarray(ref["sampled_idx"].astype(np.int32)),
        return_aux=True,
    )

    np.testing.assert_allclose(
        np.asarray(out.aux["conv1_embedding"])[:N], ref["conv1"],
        rtol=1e-4, atol=2e-5, err_msg="conv1 embedding mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["conv2_embedding"])[:N], ref["conv2"],
        rtol=1e-4, atol=3e-5, err_msg="conv2 embedding mismatch",
    )
    # attention weights: compare only REAL edge rows (pad rows are masked)
    np.testing.assert_allclose(
        np.asarray(out.aux["attn_weights_1"])[:E], ref["attn1"],
        rtol=1e-4, atol=2e-5, err_msg="conv1 attention weights mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["attn_weights_2"])[:E], ref["attn2"],
        rtol=1e-4, atol=2e-5, err_msg="conv2 attention weights mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(out.logits)[:N], ref["logits"],
        rtol=1e-4, atol=3e-5, err_msg="final log-probs mismatch",
    )


def test_ampgcn_parity_under_padding():
    """Same comparison with pad rows/edges present: padding must be
    invisible to the real rows (masked scaler stats + masked aggregation)."""
    x, ei = make_case(seed=3)
    ref_model, ref = run_reference_forward(x, ei, seed=11)

    cfg = AMPGCNConfig(
        embedding_dim=D, num_heads=H, num_node_features=F,
        num_sampled_vectors=S, output_dim=C, feat_emb_dim=D - 1,
        val_emb_dim=1, dropout_rate=0.0, dropout_adj_rate=0.0, scaler="batch",
    )
    n_pad, e_pad = N + 16, 256
    g = from_arrays(x, ei, pad_nodes_to=n_pad, pad_edges_to=e_pad)
    sidx = np.zeros((n_pad, S), np.int32)
    sidx[:N] = ref["sampled_idx"]
    params = jax.tree_util.tree_map(
        jnp.asarray, reference_state_to_params(ref_model)
    )
    out = AMPGCN(config=cfg).apply(
        {"params": params}, g, deterministic=True,
        sampled_idx=jnp.asarray(sidx), return_aux=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["conv2_embedding"])[:N], ref["conv2"],
        rtol=1e-4, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.logits)[:N], ref["logits"], rtol=1e-4, atol=3e-5
    )
