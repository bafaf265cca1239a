"""Feature-statistics collection CLI (collect-stats stage, mlm.sh:457-546).

    python -m a3t_tpu.bin.collect_stats --config conf.yaml \
        --data-dir dump/raw/tr_no_dev --out exp/stats/train
    python -m a3t_tpu.bin.collect_stats --aggregate d1 d2 --out exp/stats/all
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="A3T stats collection")
    parser.add_argument("--config", default=None)
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--aggregate", nargs="*", default=None,
                        help="merge these stats dirs instead of collecting")
    args = parser.parse_args(argv)

    from a3t_tpu.dsp.normalize import aggregate_stats, collect_stats

    if args.aggregate:
        aggregate_stats(args.aggregate, args.out)
        print(f"aggregated {len(args.aggregate)} dirs -> {args.out}")
        return

    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.tasks import MLMTask, load_config

    cfg = load_config(args.config)
    conv = MLMTask.build_token_converter(cfg)
    fe = MLMTask.build_frontend(cfg)
    ds = A3TDataset(args.data_dir or cfg.train_data_dir, conv,
                    speech_only=cfg.speech_only)
    info = collect_stats(fe, ds, args.out)
    print(f"collected stats over {info['count']} frames -> {args.out}")


if __name__ == "__main__":
    main()
