"""FastSpeech2 training task (the reference's TTSTask for the
fastspeech2 choice, espnet2/tasks/tts.py — the model whose duration
predictor drives speech editing).

Data flow per utterance (all static shapes, bucketed by text length):
    phones + alignments -> durations (frames per phone)
    waveform -> mel target (on-device front-end), F0/energy targets
    (host, dsp/pitch.py) token-averaged by the alignment durations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from a3t_tpu.data.dataset import A3TDataset
from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
from a3t_tpu.dsp.pitch import average_by_duration, extract_energy, extract_f0
from a3t_tpu.models.fastspeech2 import (
    FastSpeech2,
    FastSpeech2Config,
    fastspeech2_loss,
)
from a3t_tpu.train.optim import OptimConfig
from a3t_tpu.train.train_step import TrainState
from a3t_tpu.train.trainer import TrainerConfig


@dataclasses.dataclass
class FS2BatcherConfig:
    batch_size: int = 16
    text_buckets: Sequence[int] = (32, 64, 128)
    max_feat_len: int = 1024
    seed: int = 0


class FS2Batcher:
    """Static-shape batches for FastSpeech2 training."""

    def __init__(self, dataset: A3TDataset, frontend: LogMelConfig,
                 config: FS2BatcherConfig = FS2BatcherConfig(),
                 spk2xvector: "dict | None" = None):
        self.dataset = dataset
        self.fe = frontend
        self.config = config
        # per-speaker embedding conditioning (the reference's pretrained
        # Kaldi x-vectors, tts.sh:332-370); keys are utt2spk speakers
        self.spk2xvector = spk2xvector
        self._buckets: list[list[str]] = [[] for _ in config.text_buckets]
        bounds = sorted(config.text_buckets)
        for uid in dataset.uids:
            n = dataset.num_phones(uid)
            for bi, b in enumerate(bounds):
                if n <= b - 1:  # room for eos
                    self._buckets[bi].append(uid)
                    break

    def epoch_iterator(self, epoch: int, eos_id: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.config.seed, epoch]))
        cfg = self.config
        plan = []
        for bi, members in enumerate(self._buckets):
            order = list(members)
            rng.shuffle(order)
            for i in range(0, len(order), cfg.batch_size):
                plan.append((bi, order[i: i + cfg.batch_size]))
        rng.shuffle(plan)
        for bi, uids in plan:
            yield self.make_batch(bi, uids, eos_id)

    def make_batch(self, bucket_idx: int, uids: Sequence[str], eos_id: int):
        cfg = self.config
        t_pad = sorted(cfg.text_buckets)[bucket_idx]
        b = cfg.batch_size
        c = self.fe
        hop = c.hop_length

        text = np.zeros((b, t_pad), np.int32)
        text_mask = np.zeros((b, t_pad), bool)
        durations = np.zeros((b, t_pad), np.int32)
        pitch = np.zeros((b, t_pad, 1), np.float32)
        energy = np.zeros((b, t_pad, 1), np.float32)
        audio = np.zeros((b, (cfg.max_feat_len - 1) * hop), np.float32)
        audio_lengths = np.zeros(b, np.int32)
        spembs = None
        mean_xv = None
        if self.spk2xvector is not None:
            edim = len(next(iter(self.spk2xvector.values())))
            spembs = np.zeros((b, edim), np.float32)
            # held-out speakers (e.g. a valid set scored with the train-set
            # dict) fall back to the corpus-mean embedding instead of a
            # KeyError mid-epoch
            mean_xv = np.mean(
                np.stack(list(self.spk2xvector.values())), axis=0)

        for i, uid in enumerate(uids):
            item = self.dataset[uid]
            if spembs is not None:
                key = item.get("speaker", uid)
                xv = self.spk2xvector.get(key)
                spembs[i] = xv if xv is not None else mean_xv
            wav = item["audio"][: audio.shape[1]]
            ids = item["text_ids"]
            starts = np.floor(c.fs * item["align_start_sec"] / hop).astype(int)
            ends = np.floor(c.fs * item["align_end_sec"] / hop).astype(int)
            n_f = min(1 + len(wav) // hop, cfg.max_feat_len)
            ends = np.minimum(ends, n_f)
            starts = np.minimum(starts, ends)
            d = ends - starts
            t_len = min(len(ids), t_pad - 1)

            text[i, :t_len] = ids[:t_len]
            text[i, t_len] = eos_id
            text_mask[i, : t_len + 1] = True
            durations[i, :t_len] = d[:t_len]
            # eos duration: remaining frames
            durations[i, t_len] = max(0, n_f - int(d[:t_len].sum()))

            f0 = extract_f0(wav, c.fs, hop)
            en = extract_energy(wav, c.n_fft, hop, c.win_length)
            pitch[i, :t_len, 0] = average_by_duration(f0, d[:t_len], True)
            energy[i, :t_len, 0] = average_by_duration(en, d[:t_len], False)

            audio[i, : len(wav)] = wav
            audio_lengths[i] = len(wav)

        out = dict(
            text=text, text_mask=text_mask, durations=durations,
            pitch=pitch, energy=energy, audio=audio,
            audio_lengths=audio_lengths,
        )
        if spembs is not None:
            out["spembs"] = spembs
        return out


def make_fs2_train_step(model: FastSpeech2, frontend: LogMelFrontend,
                        donate: bool = False):
    """(state, batch, rng) -> (state, stats) for FastSpeech2."""

    def loss_fn(params, batch_stats, batch, rng):
        mel, flens = frontend.fused(batch["audio"], batch["audio_lengths"])
        mel = mel[:, : model.config.max_feat_len]
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["text"], batch["text_mask"],
            speech=mel if model.config.use_gst else None,
            spembs=batch.get("spembs"),
            durations=batch["durations"], pitch=batch["pitch"],
            energy=batch["energy"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        targets = dict(mel=mel, durations=batch["durations"],
                       pitch=batch["pitch"], energy=batch["energy"])
        losses = fastspeech2_loss(out, targets, batch["text_mask"])
        return losses["loss"], (updates["batch_stats"], losses)

    def step_fn(state: TrainState, batch, rng):
        (_, (new_stats, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        losses["grad_norm"] = optax.global_norm(grads)
        return state.apply_gradients(grads, new_stats), losses

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def create_fs2_state(model: FastSpeech2, tx, sample_batch) -> TrainState:
    variables = model.init(
        jax.random.PRNGKey(0), sample_batch["text"], sample_batch["text_mask"],
        speech=jnp.zeros(
            (sample_batch["text"].shape[0], 64, model.config.odim))
        if model.config.use_gst else None,
        spembs=sample_batch.get("spembs"),
        durations=sample_batch["durations"], pitch=sample_batch["pitch"],
        energy=sample_batch["energy"], train=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


# ---------------------------------------------------------------------------
# the task: config-driven training + exp-dir reload (TTSTask analogue for
# the fastspeech2 choice, espnet2/tasks/tts.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FS2TaskConfig:
    train_data_dir: str = ""
    valid_data_dir: str = ""
    token_list: str = ""
    # .npz of per-speaker embeddings (models/xvector.py build_spk2xvector);
    # when set, batches carry spembs and the model conditions on them
    spk_xvector: str = ""
    exp_dir: str = "exp/fs2"
    frontend: LogMelConfig = dataclasses.field(default_factory=LogMelConfig)
    model: FastSpeech2Config = dataclasses.field(
        default_factory=FastSpeech2Config)
    batcher: FS2BatcherConfig = dataclasses.field(
        default_factory=FS2BatcherConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(
            max_epoch=100, num_iters_per_epoch=None,
            best_model_criterion=("train", "loss", "min")))


class FS2Task:
    """FastSpeech2 training with the same exp-dir layout as MLMTask
    (config.yaml + tokens.txt + checkpoints/), so trained duration
    predictors plug straight into speech editing
    (a3t_tpu.inference.durations.load_duration_fn)."""

    @classmethod
    def build_token_converter(cls, cfg: FS2TaskConfig):
        import os

        from a3t_tpu.text import TokenIDConverter, build_token_list
        from a3t_tpu.data.fileio import read_2column_text

        if cfg.token_list and os.path.exists(cfg.token_list):
            return TokenIDConverter(cfg.token_list)
        texts = read_2column_text(
            os.path.join(cfg.train_data_dir, "text")).values()
        return TokenIDConverter(build_token_list(texts))

    @classmethod
    def build_model(cls, cfg: FS2TaskConfig, vocab_size: int) -> FastSpeech2:
        # eos is an extra trailing id (fastspeech2.py:539-541: eos = idim-1)
        model_cfg = dataclasses.replace(
            cfg.model, idim=vocab_size + 1, odim=cfg.frontend.n_mels)
        return FastSpeech2(model_cfg)

    @classmethod
    def run(cls, cfg: FS2TaskConfig):
        import os

        from a3t_tpu.tasks.config import save_config
        from a3t_tpu.train import Trainer, make_optimizer
        from a3t_tpu.train.checkpoint import CheckpointManager

        os.makedirs(cfg.exp_dir, exist_ok=True)
        save_config(cfg, os.path.join(cfg.exp_dir, "config.yaml"))
        conv = cls.build_token_converter(cfg)
        conv.save(os.path.join(cfg.exp_dir, "tokens.txt"))

        model = cls.build_model(cfg, len(conv))
        eos_id = model.config.idim - 1
        fe = LogMelFrontend(cfg.frontend)
        tx = make_optimizer(cfg.optim)

        spk2xv = None
        if cfg.spk_xvector:
            from a3t_tpu.models.xvector import load_spk2xvector

            spk2xv = load_spk2xvector(cfg.spk_xvector)
        batcher = FS2Batcher(
            A3TDataset(cfg.train_data_dir, conv), cfg.frontend, cfg.batcher,
            spk2xvector=spk2xv)
        valid_batcher = (
            FS2Batcher(A3TDataset(cfg.valid_data_dir, conv), cfg.frontend,
                       cfg.batcher, spk2xvector=spk2xv)
            if cfg.valid_data_dir else None)

        def to_device(it):
            for b in it:
                yield {k: jnp.asarray(v) for k, v in b.items()}

        sample = next(iter(batcher.epoch_iterator(0, eos_id)))
        sample = {k: jnp.asarray(v) for k, v in sample.items()}
        state = create_fs2_state(model, tx, sample)

        train_step = make_fs2_train_step(model, fe)

        @jax.jit
        def _eval_loss(params, batch_stats, batch):
            mel, _ = fe.fused(batch["audio"], batch["audio_lengths"])
            mel = mel[:, : model.config.max_feat_len]
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["text"], batch["text_mask"],
                speech=mel if model.config.use_gst else None,
                spembs=batch.get("spembs"),
                durations=batch["durations"], pitch=batch["pitch"],
                energy=batch["energy"], train=False)
            targets = dict(mel=mel, durations=batch["durations"],
                           pitch=batch["pitch"], energy=batch["energy"])
            return fastspeech2_loss(out, targets, batch["text_mask"])

        def eval_step(state, batch):
            return _eval_loss(state.params, state.batch_stats, batch)

        trainer = Trainer(
            cfg.trainer,
            train_step,
            eval_step if valid_batcher else None,
            lambda e: to_device(batcher.epoch_iterator(e, eos_id)),
            (lambda e: to_device(valid_batcher.epoch_iterator(e, eos_id)))
            if valid_batcher else None,
            CheckpointManager(
                os.path.join(cfg.exp_dir, "checkpoints"),
                keep_nbest=cfg.trainer.keep_nbest_models,
                criterion=cfg.trainer.best_model_criterion,
            ),
        )
        return trainer.run(state)

    @classmethod
    def build_model_from_dir(cls, exp_dir: str, which: str = "ave"):
        """(model, variables, config, tokens) from a training run — the
        mirror of MLMTask.build_model_from_dir."""
        import os

        from a3t_tpu.tasks.config import _build, load_yaml_dict
        from a3t_tpu.text import TokenIDConverter
        from a3t_tpu.train.checkpoint import (
            CheckpointManager,
            restore_portable,
        )

        cfg = _build(FS2TaskConfig,
                     load_yaml_dict(os.path.join(exp_dir, "config.yaml")))
        conv = TokenIDConverter(os.path.join(exp_dir, "tokens.txt"))
        model = cls.build_model(cfg, len(conv))

        ckpt_dir = os.path.join(exp_dir, "checkpoints")
        ave = [d for d in os.listdir(ckpt_dir) if d.startswith("ave_")]
        if which == "ave" and ave:
            params = restore_portable(
                os.path.join(ckpt_dir, sorted(ave)[-1]))["params"]
            latest = CheckpointManager(ckpt_dir).latest_epoch()
            stats = restore_portable(
                os.path.join(ckpt_dir, f"epoch_{latest}"))["batch_stats"]
        else:
            if which in ("ave", "best", "latest"):
                epoch = CheckpointManager(ckpt_dir).latest_epoch()
            else:
                epoch = int(which.split("_")[-1])
            tree = restore_portable(
                os.path.join(ckpt_dir, f"epoch_{epoch}"))
            params, stats = tree["params"], tree["batch_stats"]
        variables = {"params": params, "batch_stats": stats or {}}
        return model, variables, cfg, conv
