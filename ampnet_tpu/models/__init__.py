from ampnet_tpu.models.amp_gcn import AMPGCN, ModelOutput
from ampnet_tpu.models.layers import AMPConv, GCNConv, dropout_edges
from ampnet_tpu.models.tokenizer import FeatureTokenizer
from ampnet_tpu.models.classifiers import (
    AMPNetClassifier,
    GCN,
    GCNOneLayer,
    LinearLayer,
    TwoLayerSigmoid,
    get_model,
)

__all__ = [
    "AMPGCN",
    "ModelOutput",
    "AMPConv",
    "GCNConv",
    "dropout_edges",
    "FeatureTokenizer",
    "AMPNetClassifier",
    "GCN",
    "GCNOneLayer",
    "LinearLayer",
    "TwoLayerSigmoid",
    "get_model",
]
