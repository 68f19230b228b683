from ampnet_tpu.interpret.curves import (
    plot_loss_curves,
    plot_acc_curves,
    history_to_csv,
    plot_history,
)
from ampnet_tpu.interpret.histograms import (
    visualize_gradients,
    plot_grad_flow,
    visualize_activations,
    activation_stages_from_aux,
)
from ampnet_tpu.interpret.attention import (
    incoming_edge_attention,
    top_k_features_for_class,
    calculate_attn_heatmap,
    plot_attn_heatmap,
    visualize_attention_coefficients,
    plot_xor_attn_weights,
)
from ampnet_tpu.interpret.embedding import (
    plot_pca_2d,
    plot_subgraph,
    plot_tsne_2d,
    plot_umap_2d,
)

__all__ = [
    "plot_loss_curves",
    "plot_acc_curves",
    "history_to_csv",
    "plot_history",
    "visualize_gradients",
    "plot_grad_flow",
    "visualize_activations",
    "activation_stages_from_aux",
    "top_k_features_for_class",
    "calculate_attn_heatmap",
    "plot_attn_heatmap",
    "visualize_attention_coefficients",
    "incoming_edge_attention",
    "plot_xor_attn_weights",
    "plot_pca_2d",
    "plot_umap_2d",
    "plot_tsne_2d",
    "plot_subgraph",
]
