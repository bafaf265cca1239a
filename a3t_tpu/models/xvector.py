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
        # LayerNorm rather than the classic BatchNorm: no train/eval
        # running-stats drift (small-batch BN statistics were measurably
        # unreliable here) and no mutable state to thread through jit
        for i, (k, dil) in enumerate(zip(c.kernels, c.dilations)):
            out_ch = c.channels if i < len(c.kernels) - 1 else c.channels * 3
            h = nn.Conv(out_ch, (k,), kernel_dilation=dil, padding="SAME",
                        kernel_init=xavier(), bias_init=zeros,
                        name=f"tdnn_{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(name=f"bn_{i}")(h)

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
            h2 = nn.LayerNorm(name="bn_embed")(h2)
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


def train_xvector(
    data_dir: str,
    frontend,
    out_dir: str,
    config: Optional[XVectorConfig] = None,
    crop_frames: int = 256,
    batch_size: int = 32,
    total_steps: int = 3000,
    lr: float = 1e-3,
    seed: int = 0,
    eval_data_dir: Optional[str] = None,
    log_fn=print,
    max_utts: Optional[int] = None,
):
    """Train the speaker classifier on a data dir (wav.scp + utt2spk).

    The reference uses a pretrained Kaldi nnet3 x-vector extractor
    (0008_sitw_v2_1a, egs2/TEMPLATE/tts1/tts.sh:332-370); corpora without
    that artifact train this TDNN from scratch.  Returns
    (model, variables, report) and writes ``xvector.npz`` params +
    ``xvector.json`` metadata into ``out_dir``.
    """
    import json
    import os

    import optax

    from a3t_tpu.data.fileio import SoundScpReader, read_2column_text

    os.makedirs(out_dir, exist_ok=True)
    fe = frontend

    from a3t_tpu.dsp.frontend import corpus_mvn, extract_corpus_mels

    def load_corpus(d, cap=None):
        reader = SoundScpReader(os.path.join(d, "wav.scp"))
        utt2spk = read_2column_text(os.path.join(d, "utt2spk"))
        uids = [u for u in utt2spk if u in reader]
        if cap is not None and len(uids) > cap:
            # deterministic per-speaker-balanced subsample: a speaker
            # classifier saturates long before corpus scale
            uids = list(np.random.default_rng(0).permutation(uids)[:cap])
        _, mels = extract_corpus_mels(fe, [reader[u][1] for u in uids])
        return [(utt2spk[u], m) for u, m in zip(uids, mels)]

    train_items = load_corpus(data_dir, cap=max_utts)
    # corpus MVN on the input log-mels: without it the ~-6-mean features
    # drive the xavier-init conv stack into dead relus and nothing trains
    mel_mean, mel_std = corpus_mvn([m for _, m in train_items])
    train_items = [(s, (m - mel_mean) / mel_std) for s, m in train_items]
    speakers = sorted({s for s, _ in train_items})
    spk_id = {s: i for i, s in enumerate(speakers)}
    cfg = dataclasses.replace(
        config or XVectorConfig(n_mels=fe.config.n_mels),
        n_speakers=len(speakers))
    model = XVectorNet(cfg)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    # variable-length training (three compiled shapes) so the statistics
    # pooling generalizes to full-utterance extraction at inference
    crop_lengths = (crop_frames, 2 * crop_frames, 4 * crop_frames)

    def sample_batch(n_frames):
        mel = np.zeros((batch_size, n_frames, cfg.n_mels), np.float32)
        sid = np.zeros((batch_size,), np.int32)
        for b in range(batch_size):
            spk, m = train_items[rng.integers(len(train_items))]
            if m.shape[0] <= n_frames:
                reps = int(np.ceil(n_frames / max(m.shape[0], 1)))
                m = np.tile(m, (reps, 1))
            f0 = int(rng.integers(m.shape[0] - n_frames + 1))
            mel[b] = m[f0 : f0 + n_frames]
            sid[b] = spk_id[spk]
        return mel, sid

    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        key, jnp.zeros((batch_size, crop_frames, cfg.n_mels)))
    params = variables["params"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, mel, sid):
        def loss_fn(p):
            emb, logits = model.apply({"params": p}, mel, train=True)
            loss, acc = speaker_classification_loss(logits, sid)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, acc

    history = []
    for i in range(1, total_steps + 1):
        mel, sid = sample_batch(crop_lengths[int(rng.integers(3))])
        params, opt, loss, acc = step(
            params, opt, jnp.asarray(mel), jnp.asarray(sid))
        if i % 200 == 0 or i == total_steps:
            history.append({"step": i, "loss": round(float(loss), 4),
                            "acc": round(float(acc), 4)})
            log_fn(f"xvector step {i}/{total_steps} "
                   f"loss {float(loss):.3f} acc {float(acc):.3f}")

    variables = {"params": params}

    report = {"n_speakers": len(speakers), "speakers": speakers,
              "train_history": history}
    if eval_data_dir:
        # held-out utterances, same speaker pool: full-utterance eval
        eval_items = load_corpus(eval_data_dir)
        eval_items = [(s, (m - mel_mean) / mel_std)
                      for s, m in eval_items if s in spk_id]
        apply_fn = jax.jit(lambda mel, mask: model.apply(
            variables, mel, mask, train=False))
        correct = 0
        max_f = max(m.shape[0] for _, m in eval_items)
        max_f = int(np.ceil(max_f / 64)) * 64
        for spk, m in eval_items:
            mel = np.zeros((1, max_f, cfg.n_mels), np.float32)
            mel[0, : m.shape[0]] = m
            mask = jnp.arange(max_f)[None, :] < m.shape[0]
            _, logits = apply_fn(jnp.asarray(mel), mask)
            correct += int(np.argmax(np.asarray(logits)[0]) == spk_id[spk])
        report["eval_n"] = len(eval_items)
        report["eval_acc"] = round(correct / max(len(eval_items), 1), 4)
        log_fn(f"xvector held-out accuracy: {report['eval_acc']} "
               f"({correct}/{len(eval_items)})")

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    np.savez(os.path.join(out_dir, "xvector.npz"),
             **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    with open(os.path.join(out_dir, "xvector.json"), "w") as f:
        json.dump({**report,
                   "config": dataclasses.asdict(cfg),
                   "mel_mean": mel_mean.tolist(),
                   "mel_std": mel_std.tolist(),
                   "n_mels": fe.config.n_mels}, f, indent=1)
    return model, variables, report


def load_xvector(out_dir: str):
    """Load a train_xvector() artifact -> (model, variables, mel_mvn).

    ``mel_mvn`` is the (mean, std) pair the input log-mels must be
    normalized with before ``model.embed``.
    """
    import json
    import os

    with open(os.path.join(out_dir, "xvector.json")) as f:
        meta = json.load(f)
    cfg = XVectorConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in meta["config"].items()})
    model = XVectorNet(cfg)
    data = np.load(os.path.join(out_dir, "xvector.npz"))
    sample = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, cfg.n_mels)), train=False))
    flat, tree = jax.tree_util.tree_flatten_with_path(sample)
    leaves = [np.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    mvn = (np.asarray(meta["mel_mean"], np.float32),
           np.asarray(meta["mel_std"], np.float32))
    return model, jax.tree_util.tree_unflatten(tree, leaves), mvn


def build_spk2xvector(
    model: XVectorNet,
    variables: dict,
    frontend,
    dataset,
    out_path: Optional[str] = None,
    max_frames: int = 1024,
    mel_mvn: Optional[tuple] = None,
    max_utts_per_speaker: Optional[int] = None,
) -> dict[str, np.ndarray]:
    """Per-speaker averaged x-vectors over a corpus
    (aggregate_output/generate_spk2xv.py analogue; saved as .npz).

    ``mel_mvn``: the (mean, std) the extractor was trained with
    (load_xvector's third return) — required for extractors trained by
    :func:`train_xvector`.

    ``max_utts_per_speaker`` caps the per-speaker average (the embedding
    mean converges after a few dozen utterances; on a remote-tunnel chip
    each utterance costs a dispatch round trip, so averaging a 12k-utt
    corpus exhaustively is ~30 min for no gain).
    """
    import jax.numpy as jnp

    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}
    embed_fn = jax.jit(
        lambda feats, mask: model.apply(variables, feats, mask, train=False)[0])
    hop = frontend.config.hop_length
    uids = dataset.uids
    if max_utts_per_speaker is not None:
        per_spk: dict[str, int] = {}
        capped = []
        for uid in uids:
            spk = dataset.get_meta(uid).get("speaker", uid) \
                if hasattr(dataset, "get_meta") else uid
            if per_spk.get(spk, 0) < max_utts_per_speaker:
                per_spk[spk] = per_spk.get(spk, 0) + 1
                capped.append(uid)
        uids = capped
    for uid in uids:
        item = dataset[uid]
        spk = item.get("speaker", uid)
        wav = item["audio"]
        n_f = min(1 + len(wav) // hop, max_frames)
        pad_wav = np.zeros(((max_frames - 1) * hop,), np.float32)
        n = min(len(wav), len(pad_wav))
        pad_wav[:n] = wav[:n]
        feats, _ = frontend(jnp.asarray(pad_wav[None]))
        if mel_mvn is not None:
            feats = (feats - mel_mvn[0]) / mel_mvn[1]
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


def make_spemb_extractor(xv_dir: str, frontend):
    """Context-masked utterance-level x-vector extractor for inference.

    Returns ``fn(audio (S,) float32, frame_mask (F,) bool) -> (E,)``.
    Frames where ``frame_mask`` is False — padding AND the masked edit
    span — are excluded from the statistics pooling, so the embedding is
    computed from the unmasked context alone and carries no information
    about the content being reconstructed (leak-free under the
    replaced-span MCD protocol, sedit_mcd.py:43-135).  Wired into
    :class:`a3t_tpu.inference.SpeechEditor` via its ``spemb_fn`` arg.
    """
    model, variables, mvn = load_xvector(xv_dir)
    mean = jnp.asarray(mvn[0])
    std = jnp.asarray(mvn[1])

    @jax.jit
    def _embed(audio, mask):
        feats, _ = frontend(audio)
        feats = (feats - mean) / std
        n_f = min(feats.shape[1], mask.shape[1])
        emb, _ = model.apply(variables, feats[:, :n_f], mask[:, :n_f],
                             train=False)
        return emb

    def fn(audio: np.ndarray, frame_mask: np.ndarray) -> np.ndarray:
        audio = np.ascontiguousarray(audio, np.float32)
        mask = np.ascontiguousarray(frame_mask, bool)
        return np.asarray(
            _embed(jnp.asarray(audio[None]), jnp.asarray(mask[None])))[0]

    return fn


def build_utt2xvector(
    model: XVectorNet,
    variables: dict,
    frontend,
    dataset,
    out_path: Optional[str] = None,
    mel_mvn: Optional[tuple] = None,
    chunk: int = 32,
    max_frames: int = 1024,
) -> dict[str, np.ndarray]:
    """Per-UTTERANCE x-vectors over a corpus, batched ``chunk`` utts per
    device call (a remote tunnel charges a round trip per dispatch).

    Unlike :func:`build_spk2xvector`'s per-speaker averages, per-utt
    embeddings also carry utterance-level acoustics (e.g. the utterance's
    pitch level), which the context-masked inference extractor
    (:func:`make_spemb_extractor`) likewise observes — training and
    inference then condition on the same kind of signal.  Saved npz is
    keyed by uid; by convention it lives in the data dir as
    ``utt2xvector.npz`` (MLMTask resolves it per data dir, avoiding uid
    collisions between splits that share uid namespaces).
    """
    hop = frontend.config.hop_length
    uids = list(dataset.uids)
    bucket_f = min(
        max_frames,
        int(np.ceil((1 + max(dataset.num_samples(u) for u in uids) // hop)
                    / 64.0)) * 64)
    bucket_s = (bucket_f - 1) * hop

    mean = None if mel_mvn is None else jnp.asarray(mel_mvn[0])
    std = None if mel_mvn is None else jnp.asarray(mel_mvn[1])

    # ONE jitted program per chunk: front-end + mvn + TDNN embed.  An
    # un-jitted frontend dispatches eagerly — per-op tunnel round trips
    # turn a 2-minute corpus pass into ~40 minutes (measured).
    @jax.jit
    def chunk_embed(audio, n_f):
        feats, _ = frontend(audio)
        if mean is not None:
            feats = (feats - mean) / std
        mask = (jnp.arange(feats.shape[1])[None, :] < n_f[:, None])
        emb, _ = model.apply(variables, feats[:, :bucket_f],
                             mask[:, :bucket_f], train=False)
        return emb

    out: dict[str, np.ndarray] = {}
    for c0 in range(0, len(uids), chunk):
        group = uids[c0 : c0 + chunk]
        audio = np.zeros((chunk, bucket_s), np.float32)
        n_f = np.zeros(chunk, np.int32)
        for i, u in enumerate(group):
            wav = dataset[u]["audio"][:bucket_s]
            audio[i, : len(wav)] = wav
            n_f[i] = min(1 + len(wav) // hop, bucket_f)
        emb = np.asarray(chunk_embed(jnp.asarray(audio), jnp.asarray(n_f)))
        for i, u in enumerate(group):
            out[u] = emb[i]
    if out_path:
        np.savez(out_path, **out)
    return out
