"""MLM (A3T pretraining) task assembly — the MLMTask analogue
(espnet2/tasks/mlm.py:107-680), config-driven instead of argparse-driven.

Wires: token list -> model -> optimizer -> batcher/iterators -> sharded
train step -> trainer, and provides ``build_model_from_dir`` for inference
(the reference's build_model_from_file, tasks/mlm.py:446-496).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from a3t_tpu.data.batcher import BucketBatcher
from a3t_tpu.data.dataset import A3TDataset
from a3t_tpu.data.iterator import EpochIterFactory
from a3t_tpu.dsp import LogMelFrontend
from a3t_tpu.models.mlm import A3TMLMModel
from a3t_tpu.parallel import make_mesh, shard_opt_state, shard_variables
from a3t_tpu.parallel.mesh import batch_sharding
from a3t_tpu.tasks.config import A3TTaskConfig, load_config, save_config
from a3t_tpu.text import TokenIDConverter, build_token_list
from a3t_tpu.train import (
    Trainer,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from a3t_tpu.train.checkpoint import CheckpointManager
from a3t_tpu.train.plots import make_mel_plot_fn
from a3t_tpu.train.train_step import featurize

logger = logging.getLogger("a3t_tpu")


def _peek_batch(factory, epoch: int = 0):
    """First batch of an epoch, releasing the iterator's prefetch queue —
    an abandoned PrefetchIterator would pin device-resident batches."""
    it = factory(epoch)
    batch = next(iter(it))
    if hasattr(it, "close"):
        it.close()
    return batch


class MLMTask:
    @classmethod
    def build_token_converter(cls, cfg: A3TTaskConfig) -> TokenIDConverter:
        if cfg.token_list and os.path.exists(cfg.token_list):
            return TokenIDConverter(cfg.token_list)
        # build from training text (recipe stage 5, mlm.sh:257-260)
        from a3t_tpu.data.fileio import read_2column_text

        texts = read_2column_text(
            os.path.join(cfg.train_data_dir, "text")).values()
        conv = TokenIDConverter(build_token_list(texts))
        if cfg.token_list:
            conv.save(cfg.token_list)
        return conv

    @classmethod
    def build_frontend(cls, cfg: A3TTaskConfig) -> LogMelFrontend:
        return LogMelFrontend(cfg.frontend)

    @classmethod
    def build_normalizer(cls, cfg: A3TTaskConfig):
        if cfg.normalize == "global_mvn":
            from a3t_tpu.dsp.normalize import GlobalMVN

            return GlobalMVN.from_stats(cfg.stats_file)
        if cfg.normalize == "utterance_mvn":
            from a3t_tpu.dsp.normalize import UtteranceMVN

            return UtteranceMVN()
        return None

    @classmethod
    def build_model(cls, cfg: A3TTaskConfig, vocab_size: int) -> A3TMLMModel:
        model_cfg = dataclasses.replace(cfg.model, vocab_size=vocab_size,
                                        odim=cfg.frontend.n_mels)
        return A3TMLMModel(model_cfg)

    @classmethod
    def build_batcher(cls, cfg: A3TTaskConfig, data_dir: str,
                      conv: TokenIDConverter, train: bool,
                      batch_multiple: int = 1) -> BucketBatcher:
        if os.path.exists(os.path.join(data_dir, "index.npz")):
            # packed record shards (a3t_tpu/data/records.py) — corpus-scale
            # storage with memmap reads instead of per-file opens
            from a3t_tpu.data.records import RecordDataset

            ds = RecordDataset(data_dir, speech_only=cfg.speech_only)
        else:
            ds = A3TDataset(data_dir, conv, speech_only=cfg.speech_only)
        bcfg = cfg.batcher
        if not train:
            bcfg = dataclasses.replace(bcfg, mlm_prob_factor=1.0)
        if batch_multiple > 1:
            bcfg = dataclasses.replace(bcfg, batch_multiple=batch_multiple)
        if cfg.model.duration_predictor_layers > 0 and train:
            # duration-aware variant auto-enables duration_collect
            # (tasks/mlm.py:286-289)
            bcfg = dataclasses.replace(bcfg, duration_collect=True)
        spemb_map = None
        if cfg.model.spemb_dim > 0:
            spemb_map = cls._build_spemb_map(cfg, ds, data_dir)
        return BucketBatcher(ds, cfg.frontend, bcfg, spemb_map=spemb_map)

    @classmethod
    def _build_spemb_map(cls, cfg: A3TTaskConfig, ds, data_dir: str) -> dict:
        """uid -> x-vector for a spemb-conditioned model.

        Resolution order per uid: (1) ``<data_dir>/utt2xvector.npz``
        (per-utterance embeddings, models/xvector.py::build_utt2xvector —
        dir-local because splits share uid namespaces), (2)
        ``cfg.spemb_file`` by uid, (3) ``cfg.spemb_file`` by speaker
        (spk2xvector, via utt2spk / the dataset's speaker field).  Every
        uid must resolve — a silent zero-vector would train the
        conditioning to be ignorable.
        """
        from a3t_tpu.data.fileio import read_2column_text

        local_path = os.path.join(data_dir, "utt2xvector.npz")
        local = ({k: np.asarray(v, np.float32)
                  for k, v in np.load(local_path).items()}
                 if os.path.exists(local_path) else {})
        table = ({k: np.asarray(v, np.float32)
                  for k, v in np.load(cfg.spemb_file).items()}
                 if cfg.spemb_file else {})
        if not local and not table:
            raise ValueError(
                f"model.spemb_dim > 0 but neither {local_path} nor "
                "spemb_file provides embeddings")
        utt2spk_path = os.path.join(data_dir, "utt2spk")
        utt2spk = (read_2column_text(utt2spk_path)
                   if os.path.exists(utt2spk_path) else {})
        spemb_map = {}
        missing = []
        for uid in ds.uids:
            if uid in local:
                spemb_map[uid] = local[uid]
                continue
            if uid in table:
                spemb_map[uid] = table[uid]
                continue
            spk = utt2spk.get(uid)
            if spk is None and hasattr(ds, "get_meta"):
                spk = ds.get_meta(uid).get("speaker")
            if spk in table:
                spemb_map[uid] = table[spk]
            else:
                missing.append(uid)
        if missing:
            raise ValueError(
                f"no speaker embedding for {len(missing)} utts of "
                f"{data_dir} (first: {missing[:3]})")
        return spemb_map

    # ------------------------------------------------------------------
    @classmethod
    def run(cls, cfg: A3TTaskConfig, shard: tuple[int, int] = (0, 1)):
        """Full training: the main_worker analogue (abs_task.py:1048-1299)."""
        os.makedirs(cfg.exp_dir, exist_ok=True)
        save_config(cfg, os.path.join(cfg.exp_dir, "config.yaml"))

        conv = cls.build_token_converter(cfg)
        conv.save(os.path.join(cfg.exp_dir, "tokens.txt"))
        fe = cls.build_frontend(cfg)
        model = cls.build_model(cfg, len(conv))
        tx = make_optimizer(cfg.optim)

        mesh = None
        dp = 1
        if jax.device_count() > 1:
            mesh = make_mesh(cfg.mesh)
            dp = mesh.shape["data"]
            logger.info("mesh: %s", mesh)

        multi = None
        train_batcher = None
        if cfg.corpora:
            multi = cls._build_multi_corpus(cfg, conv, dp)
        else:
            train_batcher = cls.build_batcher(
                cfg, cfg.train_data_dir, conv, True, batch_multiple=dp)
            logger.info(
                "train buckets: %s (%d utts dropped as overlong)",
                [(b.n_frames, b.batch_size) for b in train_batcher.buckets],
                train_batcher.n_dropped,
            )
        valid_batcher = None
        if cfg.valid_data_dir:
            valid_batcher = cls.build_batcher(
                cfg, cfg.valid_data_dir, conv, False, batch_multiple=dp)

        import jax.numpy as jnp

        def to_device_batch(b):
            # runs in the prefetch producer thread: host->device transfer
            # overlaps the trainer's device steps (tunnel latency would
            # otherwise serialize into every dispatch)
            name = None
            if isinstance(b, tuple):
                if len(b) == 4 and b[0] == "chained":
                    tag, stacked, valid, weights = b
                    stacked = {k: jnp.asarray(v) for k, v in stacked.items()}
                    return (tag, stacked, jnp.asarray(valid), weights)
                name, b = b
            b = {k: jnp.asarray(v) for k, v in b.items()}
            if mesh is not None:
                b = jax.device_put(b, batch_sharding(mesh))
            return (name, b) if name is not None else b

        # A3T_PREFETCH_PUT=0 keeps batches host-side until dispatch
        # (transfer rides the jit call instead of the producer thread)
        _prefetch_put = os.environ.get("A3T_PREFETCH_PUT", "1") != "0"
        if not _prefetch_put:
            to_device_batch = None  # noqa: F811

        chain = int(cfg.trainer.steps_per_dispatch)
        if chain > 1 and (mesh is not None or multi is not None
                          or cfg.model.duration_predictor_layers > 0):
            logger.warning(
                "steps_per_dispatch=%d unsupported with mesh/multi-corpus/"
                "TTS training; falling back to 1", chain)
            chain = 1

        if multi is not None:
            train_factory = multi["factory"]
            train_factory.transform = to_device_batch
        else:
            train_factory = EpochIterFactory(
                train_batcher, cfg.trainer.num_iters_per_epoch, shard,
                cfg.num_workers_prefetch, transform=to_device_batch,
                chain=chain)
        valid_factory = (
            EpochIterFactory(valid_batcher, None, shard,
                             cfg.num_workers_prefetch,
                             transform=to_device_batch)
            if valid_batcher else None
        )

        # device-resident corpus (BatcherConfig.device_audio): upload the
        # flat int16 PCM once; batches then carry offsets only and the
        # train step gathers audio on device (train_step.gather_audio)
        corpus = None
        if (train_batcher is not None and cfg.batcher.device_audio
                and hasattr(train_batcher.dataset, "flat_pcm")):
            pad = max(b.n_samples for b in train_batcher.buckets)
            corpus_np = train_batcher.dataset.flat_pcm(pad_samples=pad)
            corpus = jnp.asarray(corpus_np)
            if mesh is not None:
                corpus = jax.device_put(
                    corpus, NamedSharding(mesh, P()))
            logger.info("device-resident corpus: %.0f MB int16 PCM",
                        corpus_np.nbytes / 1e6)
            del corpus_np

        sample_host = _peek_batch(train_factory)
        sample_fe = fe
        if isinstance(sample_host, tuple):
            if len(sample_host) == 4 and sample_host[0] == "chained":
                # first sub-batch of the stacked group
                sample_host = {k: v[0] for k, v in sample_host[1].items()}
            else:
                name, sample_host = sample_host
                sample_fe = multi["frontends"][name]
        sample = {k: jnp.asarray(v)[:2] for k, v in sample_host.items()}
        state = create_train_state(
            model, tx, featurize(sample_fe, {
                k: v for k, v in sample.items()
                if k in ("audio", "audio_offset", "audio_lengths", "text",
                         "text_mask", "masked_position",
                         "speech_segment_pos", "text_segment_pos", "spemb")
            }, use_fused=False, corpus=corpus),
            rng=jax.random.PRNGKey(cfg.trainer.seed))
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
        logger.info("model params: %.2fM", n_params / 1e6)
        if mesh is not None:
            state = state.replace(
                params=shard_variables(mesh, state.params),
                # Adam moments sharded over the data axis (the fairscale-OSS
                # analogue, reference trainer.py:215-220)
                opt_state=shard_opt_state(mesh, state.opt_state),
            )

        tb_writer = None
        if cfg.use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                tb_writer = SummaryWriter(
                    os.path.join(cfg.exp_dir, "tensorboard"))
            except Exception:  # tensorboard is optional
                logger.warning("tensorboard unavailable; skipping")

        wandb_run = None
        if cfg.use_wandb:
            try:
                import wandb

                wandb_run = wandb.init(
                    project=cfg.wandb_project,
                    name=os.path.basename(os.path.abspath(cfg.exp_dir)),
                    dir=cfg.exp_dir)
            except Exception:  # wandb is optional
                logger.warning("wandb unavailable; skipping")

        normalizer = cls.build_normalizer(cfg)

        if multi is not None:
            train_step = multi["step"]
        elif cfg.model.duration_predictor_layers > 0:
            from a3t_tpu.train.train_step import make_tts_train_step

            train_step = make_tts_train_step(model, fe, mesh=mesh,
                                             corpus=corpus)
        elif chain > 1:
            from a3t_tpu.train.train_step import make_chained_train_step

            train_step = make_chained_train_step(
                model, fe, chain, normalizer=normalizer,
                use_fused=cfg.use_fused_frontend,
                speech_only=cfg.speech_only, corpus=corpus)
        else:
            train_step = make_train_step(
                model, fe, mesh=mesh, normalizer=normalizer,
                use_fused=cfg.use_fused_frontend,
                speech_only=cfg.speech_only, corpus=corpus)

        # longformer buckets must be multiples of the half-window
        # (the pad_to_longformer_att_window invariant, collate_fn.py:241-247)
        enc = cfg.model.encoder
        if enc.selfattention_layer_type == "longformer":
            c = (enc.attention_window // 2) * max(enc.attention_dilation, 1)
            bad = [b for b in cfg.batcher.bucket_frames if b % c != 0]
            if bad:
                raise ValueError(
                    f"bucket_frames {bad} not multiples of half-window x "
                    f"dilation {c} (required by longformer attention)")

        plot_fn = None
        if cfg.num_plot_examples > 0 and valid_batcher is not None:
            plot_batch = _peek_batch(valid_factory)
            plot_dir = os.path.join(cfg.exp_dir, "plots")
            mel_fn = make_mel_plot_fn(
                model, fe, normalizer, plot_batch, plot_dir,
                n_examples=cfg.num_plot_examples)
            # attention maps need the XLA path (the fused kernels never
            # materialize probabilities): same params, kernels disabled
            from a3t_tpu.train.plots import make_attention_plot_fn

            plot_model = A3TMLMModel(dataclasses.replace(
                model.config,
                encoder=dataclasses.replace(
                    model.config.encoder, use_flash_attention=False,
                    use_pallas_attention=False),
                decoder=dataclasses.replace(
                    model.config.decoder, use_flash_attention=False,
                    use_pallas_attention=False)
                if model.config.decoder is not None else None,
            ))
            att_fn = make_attention_plot_fn(
                plot_model, fe, normalizer, plot_batch, plot_dir,
                n_examples=cfg.num_plot_examples)

            def plot_fn(state, epoch, _fns=(mel_fn, att_fn)):
                for f in _fns:
                    f(state, epoch)

        trainer = Trainer(
            cfg.trainer,
            train_step,
            make_eval_step(model, fe, mesh=mesh, normalizer=normalizer,
                           speech_only=cfg.speech_only),
            # both factories transfer in their producer thread
            train_factory,
            valid_factory,
            CheckpointManager(
                os.path.join(cfg.exp_dir, "checkpoints"),
                keep_nbest=cfg.trainer.keep_nbest_models,
                criterion=cfg.trainer.best_model_criterion,
            ),
            tensorboard_writer=tb_writer,
            wandb_run=wandb_run,
            plot_fn=plot_fn,
        )
        return trainer.run(state)

    # ------------------------------------------------------------------
    @classmethod
    def _build_multi_corpus(cls, cfg: A3TTaskConfig, conv, dp: int):
        """Config-driven multi-corpus mixture (tasks/mlm.py:499-591)."""
        from a3t_tpu.data.multi_corpus import (
            CorpusSpec,
            MultiCorpusIterFactory,
            make_multi_corpus_train_step,
        )
        from a3t_tpu.tasks.config import _build
        from a3t_tpu.dsp import LogMelConfig

        model = cls.build_model(cfg, len(conv))
        specs = []
        frontends = {}
        speech_only = {}
        for entry in cfg.corpora:
            entry = dict(entry)
            name = entry["name"]
            fe_cfg = _build(LogMelConfig, entry.get("frontend")) \
                if entry.get("frontend") else cfg.frontend
            so = bool(entry.get("speech_only", False))
            ds = A3TDataset(entry["data_dir"], conv, speech_only=so)
            bcfg = dataclasses.replace(
                cfg.batcher,
                batch_multiple=max(dp, cfg.batcher.batch_multiple))
            specs.append(CorpusSpec(
                name, BucketBatcher(ds, fe_cfg, bcfg),
                float(entry.get("portion", 1.0)), speech_only=so))
            frontends[name] = LogMelFrontend(fe_cfg)
            speech_only[name] = so
        mesh = make_mesh(cfg.mesh) if jax.device_count() > 1 else None
        factory = MultiCorpusIterFactory(
            specs, cfg.trainer.num_iters_per_epoch or 100,
            prefetch=cfg.num_workers_prefetch)
        step = make_multi_corpus_train_step(
            model, frontends, speech_only, mesh=mesh)
        return {"factory": factory, "step": step, "frontends": frontends}

    @classmethod
    def build_model_from_dir(
        cls, exp_dir: str, which: str = "ave",
    ) -> tuple[A3TMLMModel, dict, "A3TTaskConfig", TokenIDConverter]:
        """Rebuild (model, variables, config, tokens) from a training run.

        ``which``: "ave" (n-best averaged params, the file inference uses,
        sedit_inference.py:352), "best", or "epoch_N".
        """
        from a3t_tpu.train.checkpoint import restore_portable

        cfg = load_config(os.path.join(exp_dir, "config.yaml"))
        conv = TokenIDConverter(os.path.join(exp_dir, "tokens.txt"))
        model = cls.build_model(cfg, len(conv))

        ckpt_dir = os.path.join(exp_dir, "checkpoints")
        ave = [d for d in os.listdir(ckpt_dir) if d.startswith("ave_")]
        if which == "ave" and ave:
            tree = restore_portable(os.path.join(ckpt_dir, sorted(ave)[-1]))
            params = tree["params"]
            # batch stats come from the latest epoch checkpoint
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
