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


# ---------------------------------------------------------------------------
# espnet exp-dir loading (the published A3T checkpoints,
# README.md:5-8 / sedit_inference.py:350-373)
# ---------------------------------------------------------------------------

def espnet_frontend_config(cfg: dict, n_mels_default: int = 80):
    """espnet exp config's feats_extract_conf -> LogMelConfig (shared by
    the A3T and FS2 checkpoint loaders)."""
    from a3t_tpu.dsp import LogMelConfig

    fx = cfg.get("feats_extract_conf", {}) or {}
    return LogMelConfig(
        fs=int(fx.get("fs", 24000)), n_fft=int(fx.get("n_fft", 2048)),
        hop_length=int(fx.get("hop_length", 300)),
        win_length=int(fx.get("win_length") or fx.get("n_fft", 2048)),
        n_mels=int(fx.get("n_mels", n_mels_default)),
        fmin=float(fx.get("fmin") or 80.0),
        fmax=float(fx.get("fmax") or 7600.0),
    )


def _espnet_stack_config(conf: dict):
    """espnet encoder_conf/decoder_conf (fsp2_conformer.yaml:27-64) ->
    EncoderConfig."""
    from a3t_tpu.models.conformer import EncoderConfig

    attn = conf.get("selfattention_layer_type", "rel_selfattn")
    # this fork's MLM task falls rel_selfattn back to the legacy variant
    # (reference tasks/mlm.py:366-395; same rel_pos_type="legacy" default)
    if attn == "rel_selfattn" and conf.get(
            "rel_pos_type", "legacy") == "legacy":
        attn = "legacy_rel_selfattn"
    return EncoderConfig(
        attention_dim=int(conf.get("attention_dim", 384)),
        attention_heads=int(conf.get("attention_heads", 2)),
        linear_units=int(conf.get("linear_units", 1536)),
        num_blocks=int(conf.get("num_blocks", 4)),
        dropout_rate=float(conf.get("dropout_rate", 0.2)),
        positional_dropout_rate=float(
            conf.get("positional_dropout_rate", 0.2)),
        attention_dropout_rate=float(
            conf.get("attention_dropout_rate", 0.2)),
        normalize_before=bool(conf.get("normalize_before", True)),
        macaron_style=bool(conf.get("macaron_style", True)),
        use_cnn_module=bool(conf.get("use_cnn_module", True)),
        cnn_module_kernel=int(conf.get("cnn_module_kernel", 7)),
        positionwise_layer_type=conf.get("positionwise_layer_type", "conv1d"),
        positionwise_conv_kernel_size=int(
            conf.get("positionwise_conv_kernel_size", 3)),
        selfattention_layer_type=attn,
        attention_window=int(conf.get("attention_window", 0)),
        attention_dilation=int(conf.get("attention_dilation", 1)),
        pre_speech_layers=int(conf.get("pre_speech_layer", 0)),
    )


def load_espnet_a3t(model_file: str, config_file: str | None = None):
    """Load a published espnet A3T checkpoint (train.loss.ave_5best.pth
    with its exp config.yaml alongside).

    Returns (model, variables, frontend_config, token_converter).
    """
    import os

    import torch
    import yaml

    from a3t_tpu.models.mlm import A3TMLMModel, A3TModelConfig
    from a3t_tpu.text import TokenIDConverter

    if config_file is None:
        config_file = os.path.join(os.path.dirname(model_file), "config.yaml")
    with open(config_file, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    token_list = cfg["token_list"]
    if isinstance(token_list, str):
        with open(token_list, encoding="utf-8") as f:
            token_list = [ln.rstrip("\n") for ln in f if ln.strip()]

    fe_cfg = espnet_frontend_config(cfg)

    enc_conf = dict(cfg.get("encoder_conf", {}) or {})
    dec_conf = cfg.get("decoder_conf")
    model_conf = dict(cfg.get("model_conf", {}) or {})
    model_cfg = A3TModelConfig(
        odim=fe_cfg.n_mels,
        vocab_size=len(token_list),
        encoder=_espnet_stack_config(enc_conf),
        decoder=_espnet_stack_config(dict(dec_conf)) if dec_conf else None,
        use_segment_emb=enc_conf.get("input_layer", "sega_mlm") == "sega_mlm",
        postnet_layers=int(model_conf.get("postnet_layers", 5)),
        postnet_chans=int(model_conf.get("postnet_chans", 256)),
        postnet_filts=int(model_conf.get("postnet_filts", 5)),
        use_mse_loss=float(model_conf.get("lsm_weight", 0.1)) > 50,
        mlm_prob=float(model_conf.get("mlm_prob", 0.8)),
        mean_phn_span=int(model_conf.get("mean_phn_span", 8)),
    )
    model = A3TMLMModel(model_cfg)

    sd = torch.load(model_file, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    variables = convert_model_state(sd)
    unk = "<unk>" if "<unk>" in token_list else token_list[0]
    return model, variables, fe_cfg, TokenIDConverter(token_list,
                                                      unk_symbol=unk)
