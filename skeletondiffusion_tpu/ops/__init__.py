"""Graph NN primitives (L0): graph-structural linear, graph GRU/LSTM,
joint attention and FiLM blocks — flax modules with ``nn.scan`` recurrences.
Mirrors the reference layer surface `src/core/network/layers/__init__.py:1-3`.
"""
from .attention import (
    Attention,
    Block,
    PreNormAttentionResidual,
    ResnetBlock,
    RMSNorm,
    sinusoidal_pos_emb,
)
from .graph_gru import (
    GraphGRUState,
    GraphLSTMState,
    StaticGraphGRU,
    StaticGraphGRUCell,
    StaticGraphLSTM,
    StaticGraphLSTMCell,
)
from .graph_linear import DynamicGraphLinear, StaticGraphLinear, gmm, l1_normalize_rows
from .initializers import (
    graph_linear_bias,
    graph_linear_weight,
    torch_linear_weight,
    uniform_stdv,
)

__all__ = [
    "Attention", "Block", "GraphGRUState", "GraphLSTMState",
    "PreNormAttentionResidual", "RMSNorm", "ResnetBlock", "StaticGraphGRU",
    "StaticGraphGRUCell", "StaticGraphLSTM", "StaticGraphLSTMCell",
    "DynamicGraphLinear", "StaticGraphLinear", "gmm", "graph_linear_bias", "graph_linear_weight",
    "l1_normalize_rows", "sinusoidal_pos_emb", "torch_linear_weight",
    "uniform_stdv",
]
