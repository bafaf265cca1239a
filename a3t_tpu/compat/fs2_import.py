"""Import espnet2 FastSpeech2 PyTorch checkpoints (the pretrained duration
predictors sedit inference loads, sedit_inference.py:391-396) into the flax
FastSpeech2 of a3t_tpu.models.fastspeech2.

Covers the transformer-encoder configuration with scaled absolute
positional encoding, GST, x-vector projection and the variance adaptors.
"""

from __future__ import annotations

import numpy as np

from a3t_tpu.compat.torch_import import (
    _bn,
    _conv,
    _dense,
    _ln,
    _t,
    _to_np,
)


def _transformer_block(sd, prefix):
    """espnet transformer EncoderLayer -> flax ConformerBlock (macaron/conv
    off): norm1 -> norm_mha, norm2 -> norm_ff."""
    p = {
        "self_attn": {
            "linear_q": _dense(sd, f"{prefix}.self_attn.linear_q"),
            "linear_k": _dense(sd, f"{prefix}.self_attn.linear_k"),
            "linear_v": _dense(sd, f"{prefix}.self_attn.linear_v"),
            "linear_out": _dense(sd, f"{prefix}.self_attn.linear_out"),
        },
        "norm_mha": _ln(sd, f"{prefix}.norm1"),
        "norm_ff": _ln(sd, f"{prefix}.norm2"),
    }
    w1 = sd[f"{prefix}.feed_forward.w_1.weight"]
    if w1.ndim == 3:
        p["feed_forward"] = {
            "Conv_0": {"kernel": _conv(w1),
                       "bias": sd[f"{prefix}.feed_forward.w_1.bias"]},
            "Conv_1": {"kernel": _conv(sd[f"{prefix}.feed_forward.w_2.weight"]),
                       "bias": sd[f"{prefix}.feed_forward.w_2.bias"]},
        }
    else:
        p["feed_forward"] = {
            "Dense_0": _dense(sd, f"{prefix}.feed_forward.w_1"),
            "Dense_1": _dense(sd, f"{prefix}.feed_forward.w_2"),
        }
    return p


def _stack(sd, prefix):
    params = {}
    i = 0
    while f"{prefix}.encoders.{i}.norm1.weight" in sd:
        params[f"block_{i}"] = _transformer_block(sd, f"{prefix}.encoders.{i}")
        i += 1
    if f"{prefix}.after_norm.weight" in sd:
        params["after_norm"] = _ln(sd, f"{prefix}.after_norm")
    return params


def _variance_predictor(sd, prefix):
    p = {}
    i = 0
    while f"{prefix}.conv.{i}.0.weight" in sd:
        p[f"Conv_{i}"] = {"kernel": _conv(sd[f"{prefix}.conv.{i}.0.weight"]),
                          "bias": sd[f"{prefix}.conv.{i}.0.bias"]}
        p[f"LayerNorm_{i}"] = _ln(sd, f"{prefix}.conv.{i}.2")
        i += 1
    p["Dense_0"] = _dense(sd, f"{prefix}.linear")
    return p


def _gru_cell(sd, prefix):
    """torch GRU (l0) -> flax GRUCell {ir,iz,in,hr,hz,hn}.

    torch gate order in the stacked weights is (r, z, n); torch has both
    b_ih and b_hh for every gate while flax only biases the input side for
    r/z (fold b_hh into it) and the hidden side for n (b_hn stays inside
    the reset gate product, matching torch's formulation).
    """
    w_ih = np.asarray(sd[f"{prefix}.weight_ih_l0"])  # (3H, in)
    w_hh = np.asarray(sd[f"{prefix}.weight_hh_l0"])  # (3H, H)
    b_ih = np.asarray(sd[f"{prefix}.bias_ih_l0"])
    b_hh = np.asarray(sd[f"{prefix}.bias_hh_l0"])
    hdim = w_hh.shape[1]
    wr_i, wz_i, wn_i = (w_ih[i * hdim:(i + 1) * hdim] for i in range(3))
    wr_h, wz_h, wn_h = (w_hh[i * hdim:(i + 1) * hdim] for i in range(3))
    br_i, bz_i, bn_i = (b_ih[i * hdim:(i + 1) * hdim] for i in range(3))
    br_h, bz_h, bn_h = (b_hh[i * hdim:(i + 1) * hdim] for i in range(3))
    return {
        "ir": {"kernel": _t(wr_i), "bias": br_i + br_h},
        "iz": {"kernel": _t(wz_i), "bias": bz_i + bz_h},
        "in": {"kernel": _t(wn_i), "bias": bn_i},
        "hr": {"kernel": _t(wr_h)},
        "hz": {"kernel": _t(wz_h)},
        "hn": {"kernel": _t(wn_h), "bias": bn_h},
    }


def _conv2d(w):
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _gst(sd):
    params = {"ref_enc": {}, "stl": {}}
    stats = {"ref_enc": {}}
    i = 0
    ci = 0
    while f"gst.ref_enc.convs.{ci}.weight" in sd:
        params["ref_enc"][f"Conv_{i}"] = {
            "kernel": _conv2d(sd[f"gst.ref_enc.convs.{ci}.weight"])}
        bn_p, bn_s = _bn(sd, f"gst.ref_enc.convs.{ci + 1}")
        params["ref_enc"][f"BatchNorm_{i}"] = bn_p
        stats["ref_enc"][f"BatchNorm_{i}"] = bn_s
        i += 1
        ci += 3  # Sequential: conv, bn, relu
    params["ref_enc"]["GRUCell_0"] = _gru_cell(sd, "gst.ref_enc.gru")
    params["stl"] = {
        "gst_embs": sd["gst.stl.gst_embs"],
        "linear_q": _dense(sd, "gst.stl.mha.linear_q"),
        "linear_k": _dense(sd, "gst.stl.mha.linear_k"),
        "linear_v": _dense(sd, "gst.stl.mha.linear_v"),
        "linear_out": _dense(sd, "gst.stl.mha.linear_out"),
    }
    return params, stats


def convert_fs2_state(state_dict: dict) -> dict:
    """espnet2 FastSpeech2 state dict -> flax variables for
    a3t_tpu.models.fastspeech2.FastSpeech2 (transformer configuration)."""
    sd = _to_np(state_dict)
    # espnet wraps as model.tts.* inside ESPnetTTSModel; accept both
    if any(k.startswith("tts.") for k in sd):
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("tts.")}

    params: dict = {
        "text_embed": {"embedding": sd["encoder.embed.0.weight"]},
        "encoder": _stack(sd, "encoder"),
        "decoder": _stack(sd, "decoder"),
        "duration_predictor": _variance_predictor(sd, "duration_predictor"),
        "pitch_predictor": _variance_predictor(sd, "pitch_predictor"),
        "energy_predictor": _variance_predictor(sd, "energy_predictor"),
        "pitch_embed": {"kernel": _conv(sd["pitch_embed.0.weight"]),
                        "bias": sd["pitch_embed.0.bias"]},
        "energy_embed": {"kernel": _conv(sd["energy_embed.0.weight"]),
                         "bias": sd["energy_embed.0.bias"]},
        "feat_out": _dense(sd, "feat_out"),
    }
    stats: dict = {}
    if "encoder.embed.1.alpha" in sd:
        params["enc_posenc"] = {"alpha": sd["encoder.embed.1.alpha"].reshape(())}
    if "decoder.embed.0.alpha" in sd:
        params["dec_posenc"] = {"alpha": sd["decoder.embed.0.alpha"].reshape(())}
    if "projection.weight" in sd:
        params["projection"] = _dense(sd, "projection")
    if "gst.stl.gst_embs" in sd:
        g_params, g_stats = _gst(sd)
        params["gst"] = g_params
        stats["gst"] = g_stats

    if "postnet.postnet.0.0.weight" in sd:
        pn_params: dict = {}
        pn_stats: dict = {}
        i = 0
        while f"postnet.postnet.{i}.0.weight" in sd:
            pn_params[f"Conv_{i}"] = {
                "kernel": _conv(sd[f"postnet.postnet.{i}.0.weight"])}
            bn_p, bn_s = _bn(sd, f"postnet.postnet.{i}.1")
            pn_params[f"BatchNorm_{i}"] = bn_p
            pn_stats[f"BatchNorm_{i}"] = bn_s
            i += 1
        params["postnet"] = pn_params
        stats["postnet"] = pn_stats

    return {"params": params, "batch_stats": stats}
