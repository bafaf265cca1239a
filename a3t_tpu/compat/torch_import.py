"""Import ESPnet/A3T PyTorch checkpoints into a3t_tpu parameter trees.

Users of the reference train with ``espnet2.bin.mlm_train`` and get a
``*.pth`` state dict for ``ESPnetMLMEncAsDecoderModel``
(espnet2/tts/sedit/sedit_model.py:348).  This module maps those tensors
onto the flax parameter tree of :class:`a3t_tpu.models.A3TMLMModel`, so
published checkpoints (README.md's Google-Drive links) run unchanged on
TPU.  It also backs the golden parity tests in tests/test_parity.py.

Conventions:
* torch Linear weight (out, in)  -> flax Dense kernel (in, out): transpose
* torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out)
* torch BatchNorm1d -> flax BatchNorm {scale, bias} + batch_stats
* the reference loader renames ``encoder.embed -> encoder.speech_embed``
  for old checkpoints (espnet2/tasks/mlm.py:490-494); we accept both.
"""

from __future__ import annotations

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:
    # (out, in, k) -> (k, in, out)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _to_np(state_dict: dict) -> dict:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix, bias=True):
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _positionwise(sd, prefix):
    """MultiLayeredConv1d (w_1/w_2 Conv1d) or PositionwiseFeedForward (w_1/w_2 Linear)."""
    w1 = sd[f"{prefix}.w_1.weight"]
    if w1.ndim == 3:
        return {
            "Conv_0": {"kernel": _conv(w1), "bias": sd[f"{prefix}.w_1.bias"]},
            "Conv_1": {"kernel": _conv(sd[f"{prefix}.w_2.weight"]),
                       "bias": sd[f"{prefix}.w_2.bias"]},
        }
    return {
        "Dense_0": _dense(sd, f"{prefix}.w_1"),
        "Dense_1": _dense(sd, f"{prefix}.w_2"),
    }


def _attention(sd, prefix):
    p = {
        "linear_q": _dense(sd, f"{prefix}.linear_q"),
        "linear_k": _dense(sd, f"{prefix}.linear_k"),
        "linear_v": _dense(sd, f"{prefix}.linear_v"),
        "linear_out": _dense(sd, f"{prefix}.linear_out"),
    }
    if f"{prefix}.linear_pos.weight" in sd:
        p["linear_pos"] = _dense(sd, f"{prefix}.linear_pos", bias=False)
        p["pos_bias_u"] = sd[f"{prefix}.pos_bias_u"]
        p["pos_bias_v"] = sd[f"{prefix}.pos_bias_v"]
    return p


def _conv_module(sd, prefix):
    params = {
        "Conv_0": {"kernel": _conv(sd[f"{prefix}.pointwise_conv1.weight"]),
                   "bias": sd[f"{prefix}.pointwise_conv1.bias"]},
        "Conv_1": {"kernel": _conv(sd[f"{prefix}.depthwise_conv.weight"]),
                   "bias": sd[f"{prefix}.depthwise_conv.bias"]},
        "Conv_2": {"kernel": _conv(sd[f"{prefix}.pointwise_conv2.weight"]),
                   "bias": sd[f"{prefix}.pointwise_conv2.bias"]},
    }
    bn_params, bn_stats = _bn(sd, f"{prefix}.norm")
    params["BatchNorm_0"] = bn_params
    return params, {"BatchNorm_0": bn_stats}


def _block(sd, prefix):
    """One reference EncoderLayer -> one flax ConformerBlock."""
    params: dict = {}
    stats: dict = {}
    params["self_attn"] = _attention(sd, f"{prefix}.self_attn")
    params["norm_mha"] = _ln(sd, f"{prefix}.norm_mha")
    params["feed_forward"] = _positionwise(sd, f"{prefix}.feed_forward")
    params["norm_ff"] = _ln(sd, f"{prefix}.norm_ff")
    if f"{prefix}.feed_forward_macaron.w_1.weight" in sd:
        params["feed_forward_macaron"] = _positionwise(
            sd, f"{prefix}.feed_forward_macaron")
        params["norm_ff_macaron"] = _ln(sd, f"{prefix}.norm_ff_macaron")
    if f"{prefix}.conv_module.pointwise_conv1.weight" in sd:
        cm_params, cm_stats = _conv_module(sd, f"{prefix}.conv_module")
        params["conv_module"] = cm_params
        stats["conv_module"] = cm_stats
        params["norm_conv"] = _ln(sd, f"{prefix}.norm_conv")
        params["norm_final"] = _ln(sd, f"{prefix}.norm_final")
    return params, stats


def _stack(sd, prefix, num_blocks):
    params: dict = {}
    stats: dict = {}
    for i in range(num_blocks):
        p, s = _block(sd, f"{prefix}.encoders.{i}")
        params[f"block_{i}"] = p
        if s:
            stats[f"block_{i}"] = s
    if f"{prefix}.after_norm.weight" in sd:
        params["after_norm"] = _ln(sd, f"{prefix}.after_norm")
    return params, stats


def _count_blocks(sd, prefix):
    n = 0
    while f"{prefix}.encoders.{n}.norm_ff.weight" in sd:
        n += 1
    return n


def convert_encoder_state(state_dict: dict, prefix: str = "encoder"):
    """Reference MLMEncoder state -> ({params}, {batch_stats}) subtrees for
    the embedding layers + encoder stack of A3TMLMModel."""
    sd = _to_np(state_dict)
    # accept old `embed` naming (tasks/mlm.py:490-494)
    for k in list(sd):
        if k.startswith(f"{prefix}.embed."):
            sd[k.replace(f"{prefix}.embed.", f"{prefix}.speech_embed.")] = sd.pop(k)

    params: dict = {
        "speech_masked_input": {
            "mask_feature": sd[f"{prefix}.speech_embed.0.mask_feature"]
        },
        "speech_proj": _dense(sd, f"{prefix}.speech_embed.1"),
        "speech_norm": _ln(sd, f"{prefix}.speech_embed.2"),
        "text_embed": {"embedding": sd[f"{prefix}.text_embed.0.weight"]},
    }
    if f"{prefix}.segment_emb.weight" in sd:
        params["segment_emb"] = {"embedding": sd[f"{prefix}.segment_emb.weight"]}

    enc_params, enc_stats = _stack(sd, prefix, _count_blocks(sd, prefix))
    params["encoder"] = enc_params
    stats = {"encoder": enc_stats} if enc_stats else {}
    return params, stats


def convert_model_state(state_dict: dict):
    """Full ESPnetMLMEncAsDecoderModel state dict -> flax variables dict."""
    sd = _to_np(state_dict)
    params, stats = convert_encoder_state(sd, "encoder")

    n_dec = _count_blocks(sd, "decoder")
    if n_dec:
        dec_params, dec_stats = _stack(sd, "decoder", n_dec)
        params["decoder"] = dec_params
        if dec_stats:
            stats["decoder"] = dec_stats

    if "sfc.weight" in sd:
        params["sfc"] = _dense(sd, "sfc")

    # Postnet: postnet.postnet.{i}.0 Conv1d(bias=False) + .1 BatchNorm1d
    if "postnet.postnet.0.0.weight" in sd:
        pn_params: dict = {}
        pn_stats: dict = {}
        i = 0
        while f"postnet.postnet.{i}.0.weight" in sd:
            pn_params[f"Conv_{i}"] = {
                "kernel": _conv(sd[f"postnet.postnet.{i}.0.weight"])
            }
            bn_p, bn_s = _bn(sd, f"postnet.postnet.{i}.1")
            pn_params[f"BatchNorm_{i}"] = bn_p
            pn_stats[f"BatchNorm_{i}"] = bn_s
            i += 1
        params["postnet"] = pn_params
        stats["postnet"] = pn_stats

    # Duration-aware variant (ESPnetMLMTTSModel)
    if "duration_predictor.linear.weight" in sd:
        dp: dict = {}
        i = 0
        while f"duration_predictor.conv.{i}.0.weight" in sd:
            dp[f"Conv_{i}"] = {
                "kernel": _conv(sd[f"duration_predictor.conv.{i}.0.weight"]),
                "bias": sd[f"duration_predictor.conv.{i}.0.bias"],
            }
            # espnet LayerNorm(dim=1) inside the conv stack
            dp[f"LayerNorm_{i}"] = _ln(sd, f"duration_predictor.conv.{i}.2")
            i += 1
        dp["Dense_0"] = _dense(sd, "duration_predictor.linear")
        params["duration_predictor"] = dp

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str):
    """Load a reference ``*.pth`` file and convert (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_model_state(sd)
