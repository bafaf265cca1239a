"""Speaker embeddings: TDNN x-vector network + spk2xvector builder.

The reference conditions prompt-TTS duration prediction on Kaldi nnet3
x-vectors (pretrained 0008_sitw_v2_1a, extracted via
egs2/TEMPLATE/tts1/tts.sh:332-370) collapsed to a per-speaker dict by
aggregate_output/generate_spk2xv.py.  This module provides the TPU-native
equivalent:

* :class:`XVectorNet` — the standard x-vector TDNN (5 dilated frame-level
  conv layers -> mean+std stats pooling -> bottleneck embedding), trainable
  with an AAM/softmax speaker classification head;
* :func:`build_spk2xvector` — average per-speaker embeddings over a corpus,
  saved as ``.npz`` (the ``*_spk2xvector.pt`` replacement).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.layers import xavier, zeros


@dataclasses.dataclass(frozen=True)
class XVectorConfig:
    n_mels: int = 80
    channels: int = 512
    embed_dim: int = 192
    n_speakers: int = 0  # > 0 adds the classification head
    # TDNN context/dilation per layer (classic x-vector layout)
    kernels: tuple = (5, 3, 3, 1, 1)
    dilations: tuple = (1, 2, 3, 1, 1)


class XVectorNet(nn.Module):
    config: XVectorConfig = XVectorConfig()

    @nn.compact
    def __call__(self, feats, frame_mask=None, train: bool = False):
        """feats (B, T, n_mels) -> (embedding (B, E), logits|None)."""
        c = self.config
        h = feats
        for i, (k, dil) in enumerate(zip(c.kernels, c.dilations)):
            out_ch = c.channels if i < len(c.kernels) - 1 else c.channels * 3
            h = nn.Conv(out_ch, (k,), kernel_dilation=dil, padding="SAME",
                        kernel_init=xavier(), bias_init=zeros,
                        name=f"tdnn_{i}")(h)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                             name=f"bn_{i}")(h)

        # statistics pooling over valid frames
        if frame_mask is None:
            mean = h.mean(axis=1)
            var = h.var(axis=1)
        else:
            w = frame_mask.astype(h.dtype)[..., None]
            denom = w.sum(axis=1) + 1e-6
            mean = (h * w).sum(axis=1) / denom
            var = (h * h * w).sum(axis=1) / denom - mean**2
        std = jnp.sqrt(jnp.maximum(var, 1e-8))
        stats = jnp.concatenate([mean, std], axis=-1)

        emb = nn.Dense(c.embed_dim, kernel_init=xavier(), bias_init=zeros,
                       name="embed_a")(stats)
        logits = None
        if c.n_speakers > 0:
            h2 = nn.relu(emb)
            h2 = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                              name="bn_embed")(h2)
            h2 = nn.Dense(c.embed_dim, kernel_init=xavier(), bias_init=zeros,
                          name="embed_b")(h2)
            h2 = nn.relu(h2)
            logits = nn.Dense(c.n_speakers, kernel_init=xavier(),
                              bias_init=zeros, name="classifier")(h2)
        return emb, logits

    def embed(self, variables, feats, frame_mask=None):
        emb, _ = self.apply(variables, feats, frame_mask, train=False)
        return emb


def speaker_classification_loss(logits, speaker_ids):
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, speaker_ids[:, None], axis=1)[:, 0]
    acc = (jnp.argmax(logits, -1) == speaker_ids).mean()
    return nll.mean(), acc


def build_spk2xvector(
    model: XVectorNet,
    variables: dict,
    frontend,
    dataset,
    out_path: Optional[str] = None,
    max_frames: int = 1024,
) -> dict[str, np.ndarray]:
    """Per-speaker averaged x-vectors over a corpus
    (aggregate_output/generate_spk2xv.py analogue; saved as .npz)."""
    import jax.numpy as jnp

    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}
    embed_fn = jax.jit(
        lambda feats, mask: model.apply(variables, feats, mask, train=False)[0])
    hop = frontend.config.hop_length
    for uid in dataset.uids:
        item = dataset[uid]
        spk = item.get("speaker", uid)
        wav = item["audio"]
        n_f = min(1 + len(wav) // hop, max_frames)
        pad_wav = np.zeros(((max_frames - 1) * hop,), np.float32)
        n = min(len(wav), len(pad_wav))
        pad_wav[:n] = wav[:n]
        feats, _ = frontend(jnp.asarray(pad_wav[None]))
        mask = jnp.arange(feats.shape[1])[None, :] < n_f
        emb = np.asarray(embed_fn(feats, mask))[0]
        if spk in sums:
            sums[spk] += emb
            counts[spk] += 1
        else:
            sums[spk] = emb.copy()
            counts[spk] = 1
    spk2xv = {s: sums[s] / counts[s] for s in sums}
    if out_path:
        np.savez(out_path, **spk2xv)
    return spk2xv


def load_spk2xvector(path: str) -> dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}
