"""Static-shape bucketed batching (the TPU replacement for numel packing).

The reference packs variable-shape batches by total padded numel
(espnet2/samplers/num_elements_batch_sampler.py:13-110), which would force a
recompile per shape under XLA.  Here utterances are assigned to a small set
of frame-length *buckets*; each bucket has fixed (n_samples, n_frames,
n_text) shapes, and its batch size is derived from the same
``batch_bins`` budget (numel = frames x n_mels), so the memory footprint
matches the reference's packing while every batch compiles exactly once per
bucket.

The batcher also performs the host-side half of the reference collate fn
(espnet2/train/collate_fn.py:158-287): tokenized text, seconds->frames
alignment conversion, T5 phone-span masking and segment positions.  The
(heavy) STFT+mel half runs on-device inside the train step instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from a3t_tpu.data.dataset import A3TDataset
from a3t_tpu.dsp import LogMelConfig
from a3t_tpu.masking import phones_masking, segment_positions


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    n_frames: int  # static mel-frame count (includes +1 centered frame)
    n_samples: int  # static waveform length
    n_text: int  # static phone-token count
    batch_size: int


@dataclasses.dataclass
class BatcherConfig:
    batch_bins: int = 3_000_000  # numel budget (frames x n_mels), yaml:2
    bucket_frames: Sequence[int] = (256, 512, 768, 1024, 1536)
    text_pad_multiple: int = 8
    mlm_prob: float = 0.8
    mean_phn_span: float = 8.0
    # epoch-dependent factor: the reference multiplies mlm_prob by 0.8 during
    # training and 1.0 at inference (espnet2/tasks/mlm.py:281-285)
    mlm_prob_factor: float = 0.8
    min_frames: int = 16
    drop_overlong: bool = True
    seed: int = 0
    # round batch sizes up to a multiple of this (the data-parallel degree,
    # so every device gets an equal slice)
    batch_multiple: int = 1
    # duration-aware TTS variant: also emit durations + reordered_index
    # (espnet2/train/collate_fn.py:267-271, duration_collect)
    duration_collect: bool = False
    # decode wav batches with the native C++ thread-pool loader
    # (native/loader); falls back to python decoding if the build fails
    use_native_loader: bool = True
    loader_threads: int = 4
    # ship audio to the device as int16 PCM (half the host->device bytes;
    # lossless for PCM16-sourced corpora — wavs and record shards both
    # are).  featurize() converts to float on device.
    audio_int16: bool = True
    # device-resident corpus: ship only per-utt sample offsets into an
    # HBM-resident flat PCM buffer (RecordDataset.flat_pcm) and gather the
    # batch on device (train_step.gather_audio) — the batch payload drops
    # from ~15 MB to ~1 MB, which is the difference between
    # bandwidth-bound and compute-bound steps on a thin host<->device
    # link.  Bit-identical to the host path (gather + zero-mask beyond
    # each utterance's length).  Requires a dataset with global_offset().
    device_audio: bool = False


class BucketBatcher:
    """Assigns utterances to buckets and assembles static-shape batches."""

    def __init__(
        self,
        dataset: A3TDataset,
        frontend: LogMelConfig,
        config: BatcherConfig = BatcherConfig(),
        n_mels: Optional[int] = None,
        spemb_map: Optional[dict] = None,
    ):
        self.dataset = dataset
        self.fe = frontend
        self.config = config
        # uid -> x-vector; batches gain a float32 "spemb" (B, E) field
        # (speaker conditioning, A3TModelConfig.spemb_dim)
        self.spemb_map = spemb_map
        self._spemb_dim = (len(next(iter(spemb_map.values())))
                           if spemb_map else 0)
        n_mels = n_mels if n_mels is not None else frontend.n_mels

        hop = frontend.hop_length
        # Native thread-pool loader (probe headers + decode batches); falls
        # back to python decoding when the shared lib can't build.
        self._loader = None
        if config.use_native_loader:
            try:
                from a3t_tpu.data.native_loader import NativeWavLoader

                paths = [dataset.wav.data[u] for u in dataset.uids]
                self._loader = NativeWavLoader(paths, config.loader_threads)
            except Exception:
                self._loader = None

        # Per-utt lengths from wav headers (cheap; the reference reads
        # collect-stats shape files for the same purpose).
        self._frames: dict[str, int] = {}
        self._texts: dict[str, int] = {}
        self._uid_index = {u: i for i, u in enumerate(dataset.uids)}
        if self._loader is not None:
            ns, _ = self._loader.probe()
            for uid, n in zip(dataset.uids, ns):
                self._frames[uid] = 1 + int(n) // hop
                self._texts[uid] = dataset.num_phones(uid)
        else:
            for uid in dataset.uids:
                n = dataset.num_samples(uid)
                self._frames[uid] = 1 + n // hop
                self._texts[uid] = dataset.num_phones(uid)

        # Build bucket specs.
        self.buckets: list[BucketSpec] = []
        self.bucket_members: list[list[str]] = []
        bounds = sorted(config.bucket_frames)
        for bi, bf in enumerate(bounds):
            lo = bounds[bi - 1] if bi > 0 else config.min_frames
            members = [
                u for u in dataset.uids if lo < self._frames[u] <= bf
            ]
            if not members:
                continue
            max_text = max((self._texts[u] for u in members), default=1)
            m = config.text_pad_multiple
            n_text = max(m, ((max_text + m - 1) // m) * m)
            bs = max(1, config.batch_bins // (bf * n_mels))
            m = config.batch_multiple
            bs = max(m, (bs // m) * m)
            self.buckets.append(
                BucketSpec(bf, (bf - 1) * hop, n_text, bs))
            self.bucket_members.append(members)

        n_used = sum(len(m) for m in self.bucket_members)
        self.n_dropped = len(dataset.uids) - n_used

    # ------------------------------------------------------------------
    def batch_plan(self, epoch: int, shard: tuple[int, int] = (0, 1)):
        """List of (bucket_idx, [uids]) for one epoch, seeded + sharded.

        ``shard=(rank, world)`` slices batches round-robin per host, the
        reference's batches[rank::world] pattern (abs_task.py:1302-1525).
        """
        rng = np.random.default_rng(self.config.seed + epoch)
        plan: list[tuple[int, list[str]]] = []
        for bi, members in enumerate(self.bucket_members):
            order = list(members)
            rng.shuffle(order)
            bs = self.buckets[bi].batch_size
            for i in range(0, len(order), bs):
                chunk = order[i : i + bs]
                plan.append((bi, chunk))
        perm = rng.permutation(len(plan))
        plan = [plan[i] for i in perm]
        rank, world = shard
        return plan[rank::world]

    # ------------------------------------------------------------------
    def make_batch(
        self,
        bucket_idx: int,
        uids: Sequence[str],
        rng: np.random.Generator,
        span_boundary: Optional[np.ndarray] = None,
        pad_to_batch: Optional[int] = None,
    ) -> dict:
        """Assemble one host batch with static bucket shapes."""
        spec = self.buckets[bucket_idx]
        cfg = self.config
        b = pad_to_batch if pad_to_batch is not None else spec.batch_size
        hop = self.fe.hop_length

        speech_only = getattr(self.dataset, "speech_only", False)

        # int16-direct assembly: record shards and the native loader can
        # both emit raw PCM16, so when the batch ships as int16 anyway,
        # copy codes straight through instead of decode-to-float +
        # re-quantize over the whole ~28 MB batch array
        pcm16_direct = cfg.audio_int16 and (
            self._loader is not None
            or hasattr(self.dataset, "get_pcm16")
        )
        device_audio = cfg.device_audio and hasattr(
            self.dataset, "global_offset")
        if device_audio:
            audio_offset = np.zeros(b, np.int32)
            audio = None
        else:
            audio = np.zeros(
                (b, spec.n_samples),
                np.int16 if pcm16_direct else np.float32)
        audio_lengths = np.zeros(b, np.int32)
        text = np.zeros((b, spec.n_text), np.int32)
        text_mask = np.zeros((b, spec.n_text), bool)
        masked = np.zeros((b, spec.n_frames), bool)
        ssp = np.zeros((b, spec.n_frames), np.int32)
        tsp = np.zeros((b, spec.n_text), np.int32)
        if cfg.duration_collect:
            durations = np.ones((b, spec.n_frames), np.int32)
            reordered = np.tile(np.arange(spec.n_frames, dtype=np.int32),
                                (b, 1))
            reduced_lengths = np.zeros(b, np.int32)

        if self._loader is not None and uids and not device_audio:
            # native path: decode the whole batch with the C++ thread pool
            idx = [self._uid_index[u] for u in uids]
            if pcm16_direct:
                self._loader.load_batch_i16(
                    idx, spec.n_samples, out=audio[: len(idx)])
            else:
                self._loader.load_batch(
                    idx, spec.n_samples, out=audio[: len(idx)])

        for i, uid in enumerate(uids):
            if device_audio:
                item = self.dataset.get_meta(uid)
                audio_offset[i] = self.dataset.global_offset(uid)
                wav_len = min(self.dataset.num_samples(uid), spec.n_samples)
            elif self._loader is not None:
                item = self.dataset.get_meta(uid)
                n_true = (self._frames[uid] - 1) * hop
                wav_len = min(n_true, spec.n_samples)
            elif pcm16_direct:
                item = self.dataset.get_meta(uid)
                pcm = self.dataset.get_pcm16(uid)[: spec.n_samples]
                audio[i, : len(pcm)] = pcm
                wav_len = len(pcm)
            else:
                item = self.dataset[uid]
                wav = item["audio"][: spec.n_samples]
                audio[i, : len(wav)] = wav
                wav_len = len(wav)
            audio_lengths[i] = wav_len
            n_f = 1 + wav_len // hop

            if speech_only:
                # sentinel text token; frame-span T5 masking with the
                # reference's speech-only settings (collate_fn.py:222-231)
                t_len = 0
                starts = ends = np.zeros(0, np.int32)
                text[i, 0] = 1
                text_mask[i, 0] = True
                masked[i] = phones_masking(
                    spec.n_frames, starts, ends, 0, 0.15, 0, rng,
                    span_boundary=span_boundary)
            else:
                ids = item["text_ids"][: spec.n_text]
                t_len = len(ids)
                text[i, :t_len] = ids
                text_mask[i, :t_len] = True
                starts = self.fe.seconds_to_frames(item["align_start_sec"])[:t_len]
                ends = self.fe.seconds_to_frames(item["align_end_sec"])[:t_len]
                starts = np.minimum(starts, n_f)
                ends = np.minimum(ends, n_f)
                masked[i] = phones_masking(
                    spec.n_frames, starts, ends, t_len,
                    cfg.mlm_prob * cfg.mlm_prob_factor, cfg.mean_phn_span,
                    rng, span_boundary=span_boundary,
                )
            masked[i, n_f:] = False
            s, t = segment_positions(spec.n_frames, spec.n_text, starts, ends, t_len)
            ssp[i], tsp[i] = s, t

            if cfg.duration_collect and t_len > 0:
                from a3t_tpu.masking.alignment import duration_reduction

                ri, du, rl = duration_reduction(
                    spec.n_frames, starts, ends, t_len, masked[i], n_f)
                reordered[i] = ri
                durations[i] = du
                reduced_lengths[i] = rl

        # empty slots (batch padding): leave zeros; text_mask all False keeps
        # them out of attention, masked=False keeps them out of the loss.
        if audio is not None and cfg.audio_int16 and audio.dtype != np.int16:
            # round-to-nearest x32768: exact inverse of the /32768 decode
            # convention (fileio.read_wav, native loader, records) — the
            # int16 codes of PCM16-sourced audio round-trip bit-exactly
            audio = np.clip(np.rint(audio * 32768.0), -32768,
                            32767).astype(np.int16)
        out = dict(
            text=text,
            text_mask=text_mask,
            masked_position=masked,
            speech_segment_pos=ssp,
            text_segment_pos=tsp,
        )
        out["audio_lengths"] = audio_lengths
        if device_audio:
            out["audio_offset"] = audio_offset
        else:
            out["audio"] = audio
        if self.spemb_map is not None:
            spemb = np.zeros((b, self._spemb_dim), np.float32)
            for i, uid in enumerate(uids):
                spemb[i] = self.spemb_map[uid]
            out["spemb"] = spemb
        if cfg.duration_collect:
            out["durations"] = durations
            out["reordered_index"] = reordered
            out["reduced_lengths"] = reduced_lengths
        return out

    # ------------------------------------------------------------------
    def epoch_iterator(self, epoch: int, shard: tuple[int, int] = (0, 1)):
        """Yield host batches for one epoch (reproducibly seeded)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.config.seed, epoch, 777]))
        for bi, uids in self.batch_plan(epoch, shard):
            yield self.make_batch(bi, uids, rng)

    # ------------------------------------------------------------------
    def chained_plan(self, epoch: int, k: int,
                     shard: tuple[int, int] = (0, 1)):
        """Epoch plan grouped into same-bucket runs of up to ``k`` batches.

        Group members share the bucket's static shapes, so a run can be
        stacked into one (k, B, ...) superbatch and scanned inside a
        single dispatch (train_step.make_chained_train_step).  Groups —
        not batches — are permuted and round-robin sharded."""
        rng = np.random.default_rng(self.config.seed + epoch)
        runs: list[tuple[int, list[list[str]]]] = []
        for bi, members in enumerate(self.bucket_members):
            order = list(members)
            rng.shuffle(order)
            bs = self.buckets[bi].batch_size
            chunks = [order[i: i + bs] for i in range(0, len(order), bs)]
            for j in range(0, len(chunks), k):
                runs.append((bi, chunks[j: j + k]))
        perm = rng.permutation(len(runs))
        runs = [runs[i] for i in perm]
        rank, world = shard
        return runs[rank::world]

    def chained_epoch_iterator(self, epoch: int, k: int,
                               shard: tuple[int, int] = (0, 1)):
        """Yield ("chained", stacked, valid, weights) groups of ``k``.

        ``stacked`` leaves carry a leading k axis; a bucket's last run is
        padded by repeating its final batch with ``valid=False`` (the
        padded sub-steps are skipped in-graph) so every group of a bucket
        compiles exactly once."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.config.seed, epoch, 777]))
        for bi, chunks in self.chained_plan(epoch, k, shard):
            batches = [self.make_batch(bi, c, rng) for c in chunks]
            yield stack_group(batches, k)


def stack_group(batches: list, k: int):
    """Stack <=k same-shape host batches into one chained group tuple."""
    m = len(batches)
    weights = np.array(
        [float(len(b["audio_lengths"])) for b in batches]
        + [0.0] * (k - m), np.float32)
    valid = np.array([True] * m + [False] * (k - m))
    padded = batches + [batches[-1]] * (k - m)
    stacked = {key: np.stack([b[key] for b in padded])
               for key in padded[0]}
    return ("chained", stacked, valid, weights)
