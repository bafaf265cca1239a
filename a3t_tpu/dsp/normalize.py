"""Feature normalization + statistics collection.

* :class:`GlobalMVN` — global mean/variance normalization from collected
  stats (espnet2/layers/global_mvn.py:14-70); the shipped A3T recipe runs
  with ``normalize: none`` but the component and its stats pipeline are part
  of the framework surface.
* :class:`UtteranceMVN` — per-utterance normalization.
* :func:`collect_stats` — streaming pass writing per-utt shape files plus
  sum/sqsum/count (espnet2/main_funcs/collect_stats.py:24), mergeable across
  split jobs with :func:`aggregate_stats`.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


class GlobalMVN:
    def __init__(self, mean: np.ndarray, std: np.ndarray,
                 norm_means: bool = True, norm_vars: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.maximum(np.asarray(std, np.float32), 1e-20)
        self.norm_means = norm_means
        self.norm_vars = norm_vars

    @classmethod
    def from_stats(cls, path: str, **kw) -> "GlobalMVN":
        z = np.load(path)
        count = z["count"]
        mean = z["sum"] / count
        var = z["sqsum"] / count - mean**2
        return cls(mean, np.sqrt(np.maximum(var, 1e-20)), **kw)

    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        out = feats
        if self.norm_means:
            out = out - self.mean
        if self.norm_vars:
            out = out / self.std
        return out

    def inverse(self, feats: jnp.ndarray) -> jnp.ndarray:
        out = feats
        if self.norm_vars:
            out = out * self.std
        if self.norm_means:
            out = out + self.mean
        return out


class UtteranceMVN:
    def __init__(self, norm_means: bool = True, norm_vars: bool = False):
        self.norm_means = norm_means
        self.norm_vars = norm_vars

    def __call__(self, feats, frame_mask=None):
        if frame_mask is None:
            mean = feats.mean(axis=1, keepdims=True)
            var = feats.var(axis=1, keepdims=True)
        else:
            w = frame_mask.astype(feats.dtype)[..., None]
            denom = w.sum(axis=1, keepdims=True) + 1e-6
            mean = (feats * w).sum(axis=1, keepdims=True) / denom
            var = (feats**2 * w).sum(axis=1, keepdims=True) / denom - mean**2
        out = feats
        if self.norm_means:
            out = out - mean
        if self.norm_vars:
            out = out / jnp.sqrt(jnp.maximum(var, 1e-20))
        return out


def collect_stats(frontend, dataset, out_dir: str) -> dict:
    """Write speech_shape/text_shape + feats stats npz for a corpus."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    hop = frontend.config.hop_length
    n_mels = frontend.config.n_mels
    total = np.zeros(n_mels, np.float64)
    sq = np.zeros(n_mels, np.float64)
    count = 0
    speech_shape, text_shape = {}, {}

    mel_fn = jax.jit(lambda a: frontend(a)[0])
    for uid in dataset.uids:
        item = dataset[uid]
        wav = item["audio"]
        feats = np.asarray(mel_fn(jnp.asarray(wav[None])))[0]
        n_f = 1 + len(wav) // hop
        feats = feats[:n_f]
        total += feats.sum(axis=0)
        sq += (feats.astype(np.float64) ** 2).sum(axis=0)
        count += n_f
        speech_shape[uid] = f"{n_f},{n_mels}"
        if "text_ids" in item:
            text_shape[uid] = str(len(item["text_ids"]))

    np.savez(os.path.join(out_dir, "feats_stats.npz"),
             sum=total, sqsum=sq, count=count)
    with open(os.path.join(out_dir, "speech_shape"), "w") as f:
        for k in sorted(speech_shape):
            f.write(f"{k} {speech_shape[k]}\n")
    if text_shape:
        with open(os.path.join(out_dir, "text_shape"), "w") as f:
            for k in sorted(text_shape):
                f.write(f"{k} {text_shape[k]}\n")
    return {"count": count}


def aggregate_stats(dirs: list[str], out_dir: str):
    """Merge split-job stats (espnet2/bin/aggregate_stats_dirs.py analogue)."""
    os.makedirs(out_dir, exist_ok=True)
    total = sq = None
    count = 0
    shapes: dict[str, str] = {}
    text_shapes: dict[str, str] = {}
    for d in dirs:
        z = np.load(os.path.join(d, "feats_stats.npz"))
        total = z["sum"] if total is None else total + z["sum"]
        sq = z["sqsum"] if sq is None else sq + z["sqsum"]
        count += int(z["count"])
        for name, dst in (("speech_shape", shapes), ("text_shape", text_shapes)):
            p = os.path.join(d, name)
            if os.path.exists(p):
                for line in open(p):
                    k, v = line.split(maxsplit=1)
                    dst[k] = v.strip()
    np.savez(os.path.join(out_dir, "feats_stats.npz"),
             sum=total, sqsum=sq, count=count)
    for name, src in (("speech_shape", shapes), ("text_shape", text_shapes)):
        if src:
            with open(os.path.join(out_dir, name), "w") as f:
                for k in sorted(src):
                    f.write(f"{k} {src[k]}\n")
