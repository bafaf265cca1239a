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
    """Encoder/decoder stack -> (params, batch_stats); handles both plain
    transformer EncoderLayers (norm1/norm2) and conformer EncoderLayers
    (norm_ff/norm_mha/conv_module, the published gst+xvector conformer FS2)."""
    from a3t_tpu.compat.torch_import import _block as _conformer_block

    params: dict = {}
    stats: dict = {}
    i = 0
    while True:
        if f"{prefix}.encoders.{i}.norm1.weight" in sd:
            params[f"block_{i}"] = _transformer_block(
                sd, f"{prefix}.encoders.{i}")
        elif f"{prefix}.encoders.{i}.norm_ff.weight" in sd:
            p, s = _conformer_block(sd, f"{prefix}.encoders.{i}")
            params[f"block_{i}"] = p
            if s:
                stats[f"block_{i}"] = s
        else:
            break
        i += 1
    if f"{prefix}.after_norm.weight" in sd:
        params["after_norm"] = _ln(sd, f"{prefix}.after_norm")
    return params, stats


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

    enc_params, enc_stats = _stack(sd, "encoder")
    dec_params, dec_stats = _stack(sd, "decoder")
    params: dict = {
        "text_embed": {"embedding": sd["encoder.embed.0.weight"]},
        "encoder": enc_params,
        "decoder": dec_params,
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
    if enc_stats:
        stats["encoder"] = enc_stats
    if dec_stats:
        stats["decoder"] = dec_stats
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


# ---------------------------------------------------------------------------
# espnet exp-dir loading (the published duration predictors,
# sedit_inference.py:31-37 + get_fs2_model :391-396)
# ---------------------------------------------------------------------------

def espnet_fs2_config(tts_conf: dict, idim: int, odim: int):
    """espnet ``tts_conf`` (train_gst+xvector_conformer_fastspeech2.yaml)
    -> a3t_tpu FastSpeech2Config."""
    from a3t_tpu.models.conformer import EncoderConfig
    from a3t_tpu.models.fastspeech2 import (
        FastSpeech2Config,
        transformer_stack_config,
    )

    c = dict(tts_conf)
    adim = int(c.get("adim", 384))
    conformer = c.get("encoder_type", "transformer") == "conformer"

    def _stack_cfg(side: str) -> EncoderConfig:
        n, units = (c.get("elayers", 6), c.get("eunits", 1536)) \
            if side == "enc" else (c.get("dlayers", 6), c.get("dunits", 1536))
        dropout = float(c.get(f"transformer_{side}_dropout_rate", 0.1))
        pos_dropout = float(
            c.get(f"transformer_{side}_positional_dropout_rate", 0.1))
        attn_dropout = float(
            c.get(f"transformer_{side}_attn_dropout_rate", 0.1))
        common = dict(
            attention_dim=adim, attention_heads=int(c.get("aheads", 4)),
            linear_units=int(units), num_blocks=int(n),
            dropout_rate=dropout, positional_dropout_rate=pos_dropout,
            attention_dropout_rate=attn_dropout,
            positionwise_layer_type=c.get("positionwise_layer_type", "conv1d"),
            positionwise_conv_kernel_size=int(
                c.get("positionwise_conv_kernel_size", 1)),
        )
        if conformer:
            attn = c.get("conformer_self_attn_layer_type", "rel_selfattn")
            # rel_pos_type defaults to "legacy": rel_selfattn silently
            # falls back to the legacy variant (fastspeech2.py:258-274)
            if (c.get("conformer_rel_pos_type", "legacy") == "legacy"
                    and attn == "rel_selfattn"):
                attn = "legacy_rel_selfattn"
            if c.get("conformer_pos_enc_layer_type") == "legacy_rel_pos":
                attn = "legacy_rel_selfattn"
            return EncoderConfig(
                macaron_style=bool(
                    c.get("use_macaron_style_in_conformer", True)),
                use_cnn_module=bool(c.get("use_cnn_in_conformer", True)),
                cnn_module_kernel=int(
                    c.get(f"conformer_{side}_kernel_size", 7)),
                selfattention_layer_type=attn,
                **common,
            )
        return EncoderConfig(
            macaron_style=False, use_cnn_module=False,
            selfattention_layer_type="selfattn", **common)

    return FastSpeech2Config(
        idim=idim, odim=odim, adim=adim,
        encoder=_stack_cfg("enc"), decoder=_stack_cfg("dec"),
        encoder_conformer=conformer,
        use_scaled_pos_enc=bool(c.get("use_scaled_pos_enc", True)),
        postnet_layers=int(c.get("postnet_layers", 5)),
        postnet_chans=int(c.get("postnet_chans", 512)),
        postnet_filts=int(c.get("postnet_filts", 5)),
        duration_predictor_layers=int(c.get("duration_predictor_layers", 2)),
        duration_predictor_chans=int(c.get("duration_predictor_chans", 384)),
        duration_predictor_kernel=int(
            c.get("duration_predictor_kernel_size", 3)),
        pitch_predictor_layers=int(c.get("pitch_predictor_layers", 2)),
        pitch_predictor_chans=int(c.get("pitch_predictor_chans", 384)),
        pitch_predictor_kernel=int(c.get("pitch_predictor_kernel_size", 3)),
        pitch_embed_kernel=int(c.get("pitch_embed_kernel_size", 9)),
        energy_predictor_layers=int(c.get("energy_predictor_layers", 2)),
        energy_predictor_chans=int(c.get("energy_predictor_chans", 384)),
        energy_predictor_kernel=int(c.get("energy_predictor_kernel_size", 3)),
        energy_embed_kernel=int(c.get("energy_embed_kernel_size", 9)),
        use_gst=bool(c.get("use_gst", False)),
        gst_tokens=int(c.get("gst_tokens", 10)),
        gst_heads=int(c.get("gst_heads", 4)),
        gst_conv_chans_list=tuple(
            c.get("gst_conv_chans_list", (32, 32, 64, 64, 128, 128))),
        gst_gru_units=int(c.get("gst_gru_units", 128)),
        spk_embed_dim=c.get("spk_embed_dim"),
        spk_embed_integration_type=c.get(
            "spk_embed_integration_type", "add"),
    )


def load_espnet_fs2(model_file: str, config_file: str | None = None):
    """Load a pretrained espnet2 FastSpeech2 torch checkpoint.

    ``config_file`` defaults to ``config.yaml`` next to the checkpoint (the
    layout of espnet exp dirs / espnet_model_zoo unpacks).  Returns
    ``(model, variables, token_list)``.
    """
    import os

    import torch
    import yaml

    from a3t_tpu.models.fastspeech2 import FastSpeech2

    if config_file is None:
        config_file = os.path.join(os.path.dirname(model_file), "config.yaml")
    with open(config_file, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    token_list = cfg["token_list"]
    if isinstance(token_list, str):  # path instead of inline list
        with open(token_list, encoding="utf-8") as f:
            token_list = [ln.rstrip("\n") for ln in f if ln.strip()]

    state = torch.load(model_file, map_location="cpu")
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    sd = _to_np(state)
    if any(k.startswith("tts.") for k in sd):
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("tts.")}

    odim = int(np.asarray(sd["feat_out.weight"]).shape[0])
    model_cfg = espnet_fs2_config(
        cfg.get("tts_conf", {}), idim=len(token_list), odim=odim)
    model = FastSpeech2(model_cfg)
    variables = convert_fs2_state(sd)
    return model, variables, token_list
