"""Port reference (PyTorch) checkpoints into skeletondiffusion_tpu flax
parameter trees.

The reference distributes trained checkpoints as torch ``state_dict``s
(HuggingFace, README.md:154-157).  This module maps those tensors — given as
a ``{name: np.ndarray}`` dict, no torch dependency — onto the flax param
structure of :class:`~skeletondiffusion_tpu.models.Denoiser` and
:class:`~skeletondiffusion_tpu.models.AutoEncoder`, so users of the
reference can switch frameworks and keep their trained weights.

Layout conventions translated:
* graph-linear ``weight`` [types,out,in] → [types,in,out]  (x@W layout)
* recurrent ``weight_ih/hh`` [types,gates·H,in] → [types,in,gates·H]
* plain ``nn.Linear`` ``weight`` [out,in] → kernel [in,out]
* RNN ``G`` lives on the cell upstream (`recurrent.py:246-251`) but on the
  sequence module here (``G0..``); decoder ``G`` maps to ``Decoder.G0``.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _glin(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"weight": np.swapaxes(sd[f"{prefix}.weight"], -1, -2)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    if f"{prefix}.G" in sd:
        out["G"] = sd[f"{prefix}.G"]
    return out


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _rnn_cell(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {
        "weight_ih": np.swapaxes(sd[f"{prefix}.weight_ih"], -1, -2),
        "weight_hh": np.swapaxes(sd[f"{prefix}.weight_hh"], -1, -2),
    }
    # LSTM cells (4H gates): the reference defines bias_ih but never uses it
    # in the forward pass (`recurrent.py:149-150`), so the flax LSTM cell
    # doesn't declare it — porting it over would leave an unexpected key
    hidden = out["weight_hh"].shape[-2]
    is_lstm = out["weight_hh"].shape[-1] == 4 * hidden
    biases = ("bias_hh",) if is_lstm else ("bias_ih", "bias_hh")
    for b in biases:
        if f"{prefix}.{b}" in sd:
            out[b] = sd[f"{prefix}.{b}"]
    if f"{prefix}.G_add" in sd:
        out["G_add"] = sd[f"{prefix}.G_add"]
    return out


def port_denoiser(sd: Dict[str, np.ndarray], depth: int = 4, use_attention: bool = True) -> Dict:
    """Reference ``Denoiser`` state_dict → flax params dict (pass as
    ``{'params': result}`` to ``Denoiser.apply``)."""
    p: Dict[str, Dict] = {}
    p["init_lin"] = _glin(sd, "init_lin")
    p["time_mlp0"] = _dense(sd, "time_mlp.1")
    p["time_mlp1"] = _dense(sd, "time_mlp.3")

    n_pairs = 2 * depth
    for i in range(n_pairs):
        res = {
            "mlp": _dense(sd, f"layers.{i}.0.mlp.1"),
            "block1": {"proj": _glin(sd, f"layers.{i}.0.block1.proj")},
            "block2": {"proj": _glin(sd, f"layers.{i}.0.block2.proj")},
        }
        if f"layers.{i}.0.res_linear.weight" in sd:
            res["res_linear"] = _glin(sd, f"layers.{i}.0.res_linear")
        p[f"res{i}"] = res
        if i != n_pairs - 1:
            if use_attention:
                p[f"attn{i}"] = {
                    "norm": {"g": sd[f"layers.{i}.1.fn.norm.g"]},
                    "attn": {
                        "to_qkv": _glin(sd, f"layers.{i}.1.fn.fn.to_qkv"),
                        "to_out": _glin(sd, f"layers.{i}.1.fn.fn.to_out"),
                    },
                }
            else:
                p[f"attn{i}_norm"] = {"g": sd[f"layers.{i}.1.fn.norm.g"]}
                p[f"attn{i}_lin"] = _glin(sd, f"layers.{i}.1.fn.fn")

    p["final_res_block"] = {
        "mlp": _dense(sd, "final_res_block.mlp.1"),
        "block1": {"proj": _glin(sd, "final_res_block.block1.proj")},
        "block2": {"proj": _glin(sd, "final_res_block.block2.proj")},
        "res_linear": _glin(sd, "final_res_block.res_linear"),
    }
    p["final_glin"] = _glin(sd, "final_glin")
    return p


def port_autoencoder(sd: Dict[str, np.ndarray], enc_num_layers: int = 1) -> Dict:
    """Reference ``AutoEncoder`` state_dict → flax params dict."""
    enc: Dict[str, Dict] = {
        "initial_hidden1": _glin(sd, "encoder.initial_hidden1"),
        "fc": _glin(sd, "encoder.fc"),
        "rnn": {},
    }
    for i in range(enc_num_layers):
        enc["rnn"][f"cell{i}"] = _rnn_cell(sd, f"encoder.rnn.layers.{i}")
        enc["rnn"][f"G{i}"] = sd[f"encoder.rnn.layers.{i}.G"]
    if "encoder.initial_hidden_c.weight" in sd:
        enc["initial_hidden_c"] = _glin(sd, "encoder.initial_hidden_c")

    dec: Dict[str, Dict] = {
        "initial_hidden_h": _glin(sd, "decoder.initial_hidden_h"),
        # the rollout scan step owns the cell + output head
        "rollout": {
            "cell": _rnn_cell(sd, "decoder.rnn.layers.0"),
            "fc": _glin(sd, "decoder.fc"),
        },
        "G0": sd["decoder.rnn.layers.0.G"],
    }
    if "decoder.initial_hidden_c.weight" in sd:
        dec["initial_hidden_c"] = _glin(sd, "decoder.initial_hidden_c")

    return {"encoder": enc, "decoder": dec}
