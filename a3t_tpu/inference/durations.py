"""FastSpeech2-predicted phone durations for speech editing.

The reference predicts per-phone durations of the new text with a pretrained
FastSpeech2 (encoder -> GST style embedding from the prompt waveform ->
optional x-vector integration -> duration_predictor.inference), converts
frames to seconds and drops the trailing eos (sedit_inference.py:398-424).
Two sources are supported:

* a trained a3t_tpu FS2 experiment dir (a3t_tpu.tasks.fs2.FS2Task), and
* an imported espnet2 FastSpeech2 torch checkpoint
  (a3t_tpu.compat.fs2_import.load_espnet_fs2 — the published
  gst+xvector conformer duration predictors, sedit_inference.py:31-37).

Both produce a ``duration_fn(phones, wav) -> list[seconds]`` plugging into
:class:`a3t_tpu.inference.SpeechEditor`.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from a3t_tpu.dsp import LogMelConfig, LogMelFrontend


def make_fs2_duration_fn(
    model,
    variables: dict,
    tokens,
    frontend: LogMelConfig | LogMelFrontend,
    spembs: Optional[np.ndarray] = None,
    sp_map: Optional[dict[str, str]] = None,
) -> Callable[[Sequence[str], np.ndarray], list[float]]:
    """Build ``(phones, wav) -> seconds`` from a flax FastSpeech2.

    ``sp_map`` remaps alignment-only tokens before vocabulary lookup (the
    reference maps silence 'sp' to '<blank>', sedit_inference.py:399).
    """
    fe = (LogMelFrontend(frontend) if isinstance(frontend, LogMelConfig)
          else frontend)
    c = fe.config
    eos = model.config.idim - 1

    predict = jax.jit(lambda v, text, mask, speech, sp: model.apply(
        v, text, mask, speech, sp, method="predict_durations"))
    mel = jax.jit(fe)

    def duration_fn(phones: Sequence[str], wav: np.ndarray) -> list[float]:
        phns = [sp_map.get(p, p) for p in phones] if sp_map else list(phones)
        ids = np.asarray(tokens.tokens2ids(phns) + [eos], np.int32)
        text = jnp.asarray(ids[None])
        mask = jnp.ones_like(text, bool)
        speech = None
        if model.config.use_gst:
            feats, _ = mel(jnp.asarray(np.asarray(wav, np.float32)[None]))
            speech = feats
        sp = (jnp.asarray(np.asarray(spembs, np.float32)[None])
              if spembs is not None else None)
        frames = np.asarray(predict(variables, text, mask, speech, sp))[0]
        secs = frames.astype(np.float64) * c.hop_length / c.fs
        return [float(x) for x in secs[:-1]]  # drop eos (ref :424)

    return duration_fn


def load_duration_fn(
    path: str,
    spembs: Optional[np.ndarray] = None,
    which: str = "ave",
) -> Callable[[Sequence[str], np.ndarray], list[float]]:
    """Duration function from a model path.

    ``path`` is either an a3t_tpu FS2 experiment directory (config.yaml +
    tokens.txt + checkpoints/) or an espnet2 ``.pth`` checkpoint with its
    ``config.yaml`` alongside.
    """
    if os.path.isdir(path):
        from a3t_tpu.tasks.fs2 import FS2Task
        from a3t_tpu.text.tokenizer import UNK

        model, variables, cfg, conv = FS2Task.build_model_from_dir(
            path, which=which)
        sp_map = None
        if "sp" not in conv.token2id:
            sp_map = {"sp": UNK}
        return make_fs2_duration_fn(model, variables, conv, cfg.frontend,
                                    spembs=spembs, sp_map=sp_map)

    from a3t_tpu.compat.fs2_import import load_espnet_fs2
    from a3t_tpu.compat.torch_import import espnet_frontend_config
    from a3t_tpu.text import TokenIDConverter

    model, variables, token_list = load_espnet_fs2(path)
    conv = TokenIDConverter(token_list)
    # frontend settings travel in the espnet config next to the checkpoint
    import yaml

    with open(os.path.join(os.path.dirname(path), "config.yaml"),
              encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    fe_cfg = espnet_frontend_config(cfg, n_mels_default=model.config.odim)
    return make_fs2_duration_fn(
        model, variables, conv, fe_cfg, spembs=spembs,
        sp_map={"sp": "<blank>"})
