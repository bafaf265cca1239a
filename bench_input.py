"""Host input-pipeline benchmark: can the data path feed the chip?

The chip consumes ~157k padded mel frames/s at the production shape
(BENCH_r01.json).  This benchmark measures the host side — native C++
threaded wav decode + bucket batch assembly (masking, segment positions,
padding) + prefetch — on a real multi-thousand-utterance on-disk corpus at
the production audio settings (24 kHz, hop 300), and reports assembled
mel-frames/s vs the chip rate.

    python bench_input.py [--utts 2000] [--threads 4 8] [--iters 150]

Writes docs/INPUT_BENCH.json.  The corpus (~1 GB of wavs) is generated
once and cached under ~/.cache/a3t_input_bench.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

CHIP_FRAMES_PER_SEC = 157240.0  # BENCH_r01.json


def ensure_corpus(n_utts: int) -> str:
    from a3t_tpu.data.miniature import generate_mini_corpus

    cache = os.path.expanduser(f"~/.cache/a3t_input_bench_{n_utts}")
    marker = os.path.join(cache, "text")
    if os.path.exists(marker):
        with open(marker) as f:
            if sum(1 for _ in f) == n_utts:
                return cache
    print(f"generating {n_utts}-utterance 24 kHz corpus (once)...",
          flush=True)
    generate_mini_corpus(
        cache, n_utts=n_utts, fs=24000,
        n_phones_range=(20, 50), phone_dur_range=(0.1, 0.3), seed=0)
    return cache


def bench(corpus: str, threads: int, iters: int, prefetch: int = 2,
          records: bool = False) -> dict:
    from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.data.iterator import EpochIterFactory
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.text import TokenIDConverter, build_token_list

    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    fe_cfg = LogMelConfig()  # 24 kHz production settings
    bcfg = BatcherConfig(loader_threads=threads)
    if records:
        from a3t_tpu.data.records import RecordDataset, pack_records

        rec_dir = corpus.rstrip("/") + "_records"
        if not os.path.exists(os.path.join(rec_dir, "index.npz")):
            print("packing record shards (once)...", flush=True)
            pack_records(A3TDataset(corpus, conv), rec_dir)
        ds = RecordDataset(rec_dir)
    else:
        ds = A3TDataset(corpus, conv)
    t0 = time.perf_counter()
    batcher = BucketBatcher(ds, fe_cfg, bcfg)
    startup_s = time.perf_counter() - t0

    factory = EpochIterFactory(batcher, num_iters_per_epoch=iters,
                               prefetch=prefetch)
    # warmup (thread pool spin-up, page cache)
    for i, b in enumerate(factory(0)):
        if i >= 5:
            break

    frames = 0
    utts = 0
    t0 = time.perf_counter()
    n = 0
    for batch in factory(1):
        bsz, n_f = batch["masked_position"].shape
        frames += bsz * n_f  # padded frames, what the chip consumes
        utts += bsz
        n += 1
    wall = time.perf_counter() - t0
    fps = frames / wall
    return {
        "threads": threads,
        "prefetch": prefetch,
        "batches": n,
        "startup_s": round(startup_s, 2),
        "assembled_mel_frames_per_s": round(fps),
        "utterances_per_s": round(utts / wall, 1),
        "vs_chip_rate": round(fps / CHIP_FRAMES_PER_SEC, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=2000)
    ap.add_argument("--threads", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--iters", type=int, default=150)
    args = ap.parse_args()

    corpus = ensure_corpus(args.utts)
    size = sum(
        os.path.getsize(os.path.join(corpus, "wav", f))
        for f in os.listdir(os.path.join(corpus, "wav")))
    report = {"corpus_utts": args.utts,
              "corpus_wav_gb": round(size / 1e9, 2),
              "chip_frames_per_s": CHIP_FRAMES_PER_SEC,
              "runs": []}
    for th in args.threads:
        r = bench(corpus, th, args.iters)
        report["runs"].append(r)
        print(json.dumps(r), flush=True)
    r = bench(corpus, args.threads[0], args.iters, records=True)
    r["storage"] = "records"
    report["runs"].append(r)
    print(json.dumps(r), flush=True)
    os.makedirs("docs", exist_ok=True)
    with open("docs/INPUT_BENCH.json", "w") as f:
        json.dump(report, f, indent=1)
    best = max(r["assembled_mel_frames_per_s"] for r in report["runs"])
    print(f"best host rate: {best} frames/s "
          f"({best / CHIP_FRAMES_PER_SEC:.1f}x chip rate)")


if __name__ == "__main__":
    main()
