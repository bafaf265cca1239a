"""Neural vocoder training: PWG generator, multi-res STFT loss, LSGAN.

The reference never trains a vocoder in-repo — it downloads pretrained
``parallel_wavegan`` package checkpoints by tag (sedit_inference.py:339-348)
— but it ships the full model machinery under ``espnet2/gan_tts/``:
generator + discriminator (parallel_wavegan/parallel_wavegan.py:26-327) and
the multi-resolution STFT + LSGAN objectives those published checkpoints
were trained with.  This module provides the TPU-native training loop for
that machinery so a corpus without a published vocoder tag (e.g. the soak
corpus) gets a real neural vocoder instead of the Griffin-Lim fallback.

Design notes (TPU-first):

* The whole step — noise sampling, generator convs, three STFT losses,
  discriminator, both optimizers — is one jitted function; the host only
  assembles fixed-shape crop batches (numpy slicing of an in-memory corpus).
* Mel conditioning is GlobalMVN-normalized with corpus statistics that are
  stored inside the checkpoint, so inference consumes the acoustic model's
  raw log10-mel directly.
* Crops are frame-aligned: mel frames [f0, f0+F) pair with samples
  [f0*hop, (f0+F)*hop) of the same utterance — the centered-STFT pairing the
  upstream trainer uses.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp

from a3t_tpu.dsp.frontend import LogMelConfig, LogMelFrontend
from a3t_tpu.dsp.stft import stft as _stft
from a3t_tpu.models.pwg import (
    ParallelWaveGANGeneratorScan,
    PWGConfig,
    PWGDiscriminator,
)

# (n_fft, hop, win) triples of the upstream MultiResolutionSTFTLoss defaults
# (parallel_wavegan package stft_loss.py; the published vocoder tags'
# training objective).
STFT_RESOLUTIONS: tuple = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def upsample_scales_for_hop(hop: int) -> tuple:
    """Factor ``hop`` into 3-5 upsample scales (largest first)."""
    scales, h = [], hop
    for p in (5, 5, 4, 4, 3, 3, 2, 2):
        if h % p == 0 and h != p:
            scales.append(p)
            h //= p
    if h != 1:
        scales.append(h)
    if int(np.prod(scales)) != hop:
        raise ValueError(f"cannot factor hop {hop} into upsample scales")
    return tuple(scales)


def spectral_losses(wav_hat: jnp.ndarray, wav: jnp.ndarray,
                    resolutions: Sequence[tuple] = STFT_RESOLUTIONS):
    """Multi-resolution STFT loss (upstream stft_loss.py semantics).

    Returns (spectral_convergence, log_magnitude_l1), each averaged over
    the resolution set.
    """
    sc_total, mag_total = 0.0, 0.0
    for n_fft, hop, win in resolutions:
        m_hat = jnp.abs(_stft(wav_hat, n_fft, hop, win))
        m_ref = jnp.abs(_stft(wav, n_fft, hop, win))
        m_hat = jnp.sqrt(jnp.maximum(m_hat * m_hat, 1e-7))
        m_ref = jnp.sqrt(jnp.maximum(m_ref * m_ref, 1e-7))
        sc_total += jnp.linalg.norm(m_ref - m_hat) / jnp.linalg.norm(m_ref)
        mag_total += jnp.mean(jnp.abs(jnp.log(m_ref) - jnp.log(m_hat)))
    n = float(len(resolutions))
    return sc_total / n, mag_total / n


@dataclasses.dataclass(frozen=True)
class VocoderTrainConfig:
    batch_size: int = 8
    crop_frames: int = 96           # 96 frames * hop 200 = 19200 samples
    total_steps: int = 50000
    # adversarial phase: discriminator joins after the spectral losses have
    # shaped the generator (upstream: discriminator_train_start_steps)
    disc_start_step: int = 20000
    lambda_adv: float = 4.0
    gen_lr: float = 1e-4
    disc_lr: float = 5e-5
    grad_clip: float = 10.0
    log_interval: int = 500
    save_interval: int = 5000
    seed: int = 0
    residual_channels: int = 64
    layers: int = 30
    stacks: int = 3
    # phase-decomposed dilated convs (models/pwg.py): equivalent math,
    # far cheaper XLA compile; needs crop_frames*hop % max_dilation == 0
    phase_conv: bool = False


class VocoderData:
    """In-memory (wav, mel) corpus with frame-aligned random crops."""

    def __init__(self, wav_scp: str, fe_cfg: LogMelConfig,
                 max_utts: Optional[int] = None,
                 cache_path: Optional[str] = None):
        from a3t_tpu.data.fileio import SoundScpReader

        from a3t_tpu.dsp.frontend import corpus_mvn, extract_corpus_mels

        self.hop = fe_cfg.hop_length
        import hashlib

        with open(wav_scp, "rb") as f:
            scp_md5 = hashlib.md5(f.read()).hexdigest()
        cache_key = json.dumps({
            "fe": dataclasses.asdict(fe_cfg), "max_utts": max_utts,
            "scp_md5": scp_md5}, sort_keys=True)
        if cache_path and os.path.exists(cache_path):
            # one flat-file read replaces 12k wav decodes + the on-device
            # mel sweep — training restarts in bounded chunks pay corpus
            # load on every chunk, so this is minutes per restart
            z = np.load(cache_path)
            stored_key = str(z["cache_key"]) if "cache_key" in z else None
            if stored_key == cache_key:
                # hoist the concatenated members: NpzFile re-reads the full
                # member on every [] access, and per-utt slices of one parent
                # share its buffer instead of pinning n copies
                wav_cat, mel_cat = z["wav_cat"], z["mel_cat"]
                wav_off, mel_off = z["wav_offsets"], z["mel_offsets"]
                self.utts = [
                    (wav_cat[wav_off[i]:wav_off[i + 1]],
                     mel_cat[mel_off[i]:mel_off[i + 1]])
                    for i in range(len(wav_off) - 1)
                ]
                self.mel_mean, self.mel_std = z["mel_mean"], z["mel_std"]
                return
            print(f"vocoder: cache {cache_path} stale (key mismatch), "
                  "re-extracting", flush=True)
        reader = SoundScpReader(wav_scp)
        frontend = LogMelFrontend(fe_cfg)
        uids = list(reader.keys())
        if max_utts:
            uids = uids[:max_utts]
        wavs = []
        for uid in uids:
            fs, wav = reader[uid]
            if fs != fe_cfg.fs:
                raise ValueError(f"{uid}: fs {fs} != frontend fs {fe_cfg.fs}")
            wavs.append(wav)
        trunc, mels = extract_corpus_mels(frontend, wavs)
        self.utts = list(zip(trunc, mels))
        self.mel_mean, self.mel_std = corpus_mvn(mels)
        if cache_path:
            tmp = cache_path + ".tmp.npz"
            np.savez(
                tmp,
                wav_cat=np.concatenate([w for w, _ in self.utts]),
                mel_cat=np.concatenate([m for _, m in self.utts], axis=0),
                wav_offsets=np.cumsum([0] + [len(w) for w, _ in self.utts]),
                mel_offsets=np.cumsum([0] + [len(m) for _, m in self.utts]),
                mel_mean=self.mel_mean, mel_std=self.mel_std,
                cache_key=np.str_(cache_key))
            os.replace(tmp, cache_path)

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     crop_frames: int):
        crop_s = crop_frames * self.hop
        mel = np.empty((batch_size, crop_frames, self.utts[0][1].shape[-1]),
                       np.float32)
        wav = np.empty((batch_size, crop_s), np.float32)
        for b in range(batch_size):
            wi, mi = self.utts[rng.integers(len(self.utts))]
            max_f0 = mi.shape[0] - crop_frames
            if max_f0 <= 0:  # short utt: tile-pad
                reps = int(np.ceil(crop_frames / max(mi.shape[0], 1)))
                mi = np.tile(mi, (reps, 1))[:crop_frames]
                wi = np.tile(wi, reps)[:crop_s]
                f0 = 0
            else:
                f0 = int(rng.integers(max_f0 + 1))
            mel[b] = mi[f0 : f0 + crop_frames]
            wav[b] = wi[f0 * self.hop : f0 * self.hop + crop_s]
        mel = (mel - self.mel_mean) / self.mel_std
        return mel, wav


def _ckpt_tree(step, pg, pd, og, od):
    return {"step": step, "params_g": pg, "params_d": pd,
            "opt_g": og, "opt_d": od}


def train_vocoder(wav_scp: str, out_dir: str, fe_cfg: LogMelConfig,
                  cfg: VocoderTrainConfig = VocoderTrainConfig(),
                  max_utts: Optional[int] = None,
                  corpus_cache: Optional[str] = None,
                  log_fn: Callable[[str], None] = print) -> str:
    """Train a PWG vocoder on a wav.scp corpus; returns the checkpoint dir.

    Resumable: restarts from ``out_dir`` if a checkpoint exists there.
    """
    os.makedirs(out_dir, exist_ok=True)
    scales = upsample_scales_for_hop(fe_cfg.hop_length)
    gcfg = PWGConfig(upsample_scales=scales,
                     aux_channels=fe_cfg.n_mels,
                     residual_channels=cfg.residual_channels,
                     skip_channels=cfg.residual_channels,
                     gate_channels=2 * cfg.residual_channels,
                     layers=cfg.layers, stacks=cfg.stacks,
                     phase_conv=cfg.phase_conv)
    gen = ParallelWaveGANGeneratorScan(gcfg)
    disc = PWGDiscriminator()

    log_fn(f"vocoder: loading corpus {wav_scp} ...")
    data = VocoderData(wav_scp, fe_cfg, max_utts=max_utts,
                       cache_path=corpus_cache)
    log_fn(f"vocoder: {len(data.utts)} utts in memory")

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    crop_s = cfg.crop_frames * fe_cfg.hop_length

    key, kg, kd = jax.random.split(key, 3)
    mel0 = jnp.zeros((cfg.batch_size, cfg.crop_frames, fe_cfg.n_mels))
    z0 = jnp.zeros((cfg.batch_size, crop_s, 1))
    # jit the inits: eager flax init would execute every conv as a separate
    # dispatch, which is pathologically slow through a remote-compile tunnel
    params_g = jax.jit(gen.init)(kg, mel0, z0)["params"]
    params_d = jax.jit(disc.init)(
        kd, jnp.zeros((cfg.batch_size, crop_s)))["params"]

    tx_g = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                       optax.adam(cfg.gen_lr))
    tx_d = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                       optax.adam(cfg.disc_lr))
    opt_g = tx_g.init(params_g)
    opt_d = tx_d.init(params_d)
    step = 0

    ckpt = ocp.StandardCheckpointer()
    state_path = os.path.join(out_dir, "state")
    meta_path = os.path.join(out_dir, "vocoder.json")
    resumed = False
    if os.path.exists(state_path):
        tree = ckpt.restore(
            state_path, _ckpt_tree(step, params_g, params_d, opt_g, opt_d))
        step, params_g, params_d = (tree["step"], tree["params_g"],
                                    tree["params_d"])
        opt_g, opt_d = tree["opt_g"], tree["opt_d"]
        step = int(step)
        resumed = True
        log_fn(f"vocoder: resumed at step {step}")

    if resumed and os.path.exists(meta_path):
        # keep the MVN the restored params were trained under — recomputing
        # from the (possibly different) current corpus slice would silently
        # change the generator's input normalization mid-run
        with open(meta_path) as f:
            old_meta = json.load(f)
        data.mel_mean = np.asarray(old_meta["mel_mean"], np.float32)
        data.mel_std = np.asarray(old_meta["mel_std"], np.float32)
        log_fn("vocoder: reusing stored mel MVN from vocoder.json")
    meta = {
        "frontend": dataclasses.asdict(fe_cfg),
        "pwg": dataclasses.asdict(gcfg),
        "mel_mean": data.mel_mean.tolist(),
        "mel_std": data.mel_std.tolist(),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    @jax.jit
    def step_spectral(pg, og, mel, wav, key):
        z = jax.random.normal(key, (cfg.batch_size, crop_s, 1))

        def loss_fn(p):
            wav_hat = gen.apply({"params": p}, mel, z)
            sc, mag = spectral_losses(wav_hat, wav)
            return sc + mag, (sc, mag)

        (loss, (sc, mag)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(pg)
        updates, og = tx_g.update(grads, og, pg)
        return optax.apply_updates(pg, updates), og, loss, sc, mag

    @jax.jit
    def step_adversarial(pg, pd, og, od, mel, wav, key):
        z = jax.random.normal(key, (cfg.batch_size, crop_s, 1))

        # generator: spectral + LSGAN adversarial against the current D
        def g_loss_fn(p):
            wav_hat = gen.apply({"params": p}, mel, z)
            sc, mag = spectral_losses(wav_hat, wav)
            adv = jnp.mean(
                (disc.apply({"params": pd}, wav_hat) - 1.0) ** 2)
            return sc + mag + cfg.lambda_adv * adv, (sc, mag, adv, wav_hat)

        (g_loss, (sc, mag, adv, wav_hat)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(pg)
        g_updates, og = tx_g.update(g_grads, og, pg)
        pg = optax.apply_updates(pg, g_updates)

        # discriminator: real -> 1, generated (detached) -> 0
        def d_loss_fn(p):
            real = jnp.mean((disc.apply({"params": p}, wav) - 1.0) ** 2)
            fake = jnp.mean(
                disc.apply({"params": p},
                           jax.lax.stop_gradient(wav_hat)) ** 2)
            return real + fake

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(pd)
        d_updates, od = tx_d.update(d_grads, od, pd)
        pd = optax.apply_updates(pd, d_updates)
        return pg, pd, og, od, g_loss, sc, mag, adv, d_loss

    import time

    t0 = time.time()
    history = []
    hist_path = os.path.join(out_dir, "history.json")
    if resumed and os.path.exists(hist_path):
        with open(hist_path) as f:
            history = json.load(f)
        history = [h for h in history if h.get("step", 0) <= step]
    while step < cfg.total_steps:
        mel, wav = data.sample_batch(rng, cfg.batch_size, cfg.crop_frames)
        kz = jax.random.fold_in(key, step)
        if step < cfg.disc_start_step:
            params_g, opt_g, loss, sc, mag = step_spectral(
                params_g, opt_g, mel, wav, kz)
            stats = {"loss": loss, "sc": sc, "mag": mag}
        else:
            (params_g, params_d, opt_g, opt_d, loss, sc, mag, adv,
             d_loss) = step_adversarial(
                params_g, params_d, opt_g, opt_d, mel, wav, kz)
            stats = {"loss": loss, "sc": sc, "mag": mag, "adv": adv,
                     "d": d_loss}
        step += 1
        if step % cfg.log_interval == 0 or step == cfg.total_steps:
            s = {k: round(float(v), 4) for k, v in stats.items()}
            rate = cfg.log_interval / (time.time() - t0)
            t0 = time.time()
            history.append({"step": step, **s})
            log_fn(f"vocoder step {step}/{cfg.total_steps} {s} "
                   f"({rate:.1f} it/s)")
        if step % cfg.save_interval == 0 or step == cfg.total_steps:
            tmp = state_path + ".tmp"
            ckpt.save(tmp, _ckpt_tree(step, params_g, params_d, opt_g,
                                      opt_d), force=True)
            ckpt.wait_until_finished()
            if os.path.exists(state_path):
                import shutil

                shutil.rmtree(state_path)
            os.replace(tmp, state_path)
            with open(os.path.join(out_dir, "history.json"), "w") as f:
                json.dump(history, f)
    return out_dir


def load_vocoder(out_dir: str) -> Callable[[np.ndarray], np.ndarray]:
    """Load a trained vocoder dir -> callable (B, F, n_mels) -> (B, F*hop).

    Accepts the acoustic model's raw log10-mel (normalization statistics are
    baked into the checkpoint).  Pads the frame axis to a multiple of 64 so
    repeated calls share a handful of compiled shapes.
    """
    out_dir = os.path.abspath(out_dir)  # orbax requires absolute paths
    with open(os.path.join(out_dir, "vocoder.json")) as f:
        meta = json.load(f)
    gcfg = PWGConfig(**{k: tuple(v) if isinstance(v, list) else v
                        for k, v in meta["pwg"].items()})
    hop = int(np.prod(gcfg.upsample_scales))
    gen = ParallelWaveGANGeneratorScan(gcfg)
    mean = np.asarray(meta["mel_mean"], np.float32)
    std = np.asarray(meta["mel_std"], np.float32)

    # restore against an abstract template: the raw checkpoint carries the
    # training devices' sharding metadata, which would fail to resolve on
    # a different backend (e.g. CPU evaluation of a TPU-trained vocoder)
    tmpl_cfg = dataclasses.replace(gcfg, phase_conv=False)  # same params
    tmpl_gen = ParallelWaveGANGeneratorScan(tmpl_cfg)
    disc = PWGDiscriminator()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))

    def build_state():
        pg = tmpl_gen.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, gcfg.aux_channels)),
            jnp.zeros((1, 8 * hop, gcfg.in_channels)))["params"]
        pd = disc.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 8 * hop)))["params"]
        return _ckpt_tree(jnp.zeros((), jnp.int32), pg, pd,
                          tx.init(pg), tx.init(pd))

    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
        jax.eval_shape(build_state))
    ckpt = ocp.StandardCheckpointer()
    raw = ckpt.restore(os.path.join(out_dir, "state"), abstract)
    params = raw["params_g"]

    @jax.jit
    def run(mel):
        z = jax.random.normal(
            jax.random.PRNGKey(0), (mel.shape[0], mel.shape[1] * hop, 1))
        return gen.apply({"params": params}, mel, z)

    def vocode(mel: np.ndarray) -> np.ndarray:
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        n_frames = mel.shape[1]
        pad_f = int(np.ceil(n_frames / 64)) * 64
        mel_p = np.pad(mel, ((0, 0), (0, pad_f - n_frames), (0, 0)),
                       mode="edge")
        mel_p = (mel_p - mean) / std
        wav = np.asarray(run(jnp.asarray(mel_p)))
        return wav[:, : n_frames * hop]

    return vocode
