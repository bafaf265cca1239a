"""Training CLI — the espnet2.bin.mlm_train analogue.

    python -m a3t_tpu.bin.train --config configs/a3t_conformer_24k.yaml \
        --set train_data_dir=dump/raw/tr_no_dev \
        --set trainer.max_epoch=100

Multi-host: launch one process per host with --coordinator/--num-hosts/
--host-id (jax.distributed bootstrap; the espnet2.bin.launch analogue is
just your scheduler's per-host spawn).
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="A3T TPU pretraining")
    parser.add_argument("--config", default=None)
    parser.add_argument("--print-config", action="store_true",
                        help="dump the (resolved or default) config yaml and exit")
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override config entries, e.g. --set optim.lr=0.5",
    )
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (multi-host only)")
    parser.add_argument("--num-hosts", type=int, default=None)
    parser.add_argument("--host-id", type=int, default=None)
    parser.add_argument("--log-level", default="INFO")
    parser.add_argument("--prng", default="unsafe_rbg",
                        choices=["unsafe_rbg", "threefry2x32"],
                        help="dropout/masking PRNG; rbg is ~25%% faster "
                             "on TPU, threefry is the splittable reference")
    parser.add_argument("--detect-anomaly", action="store_true",
                        help="fail fast at the op that produced a NaN "
                             "(jax_debug_nans — the reference's "
                             "--detect_anomaly, abs_task.py:1091-1093; "
                             "disables the non-finite skip-and-continue "
                             "path and slows training, debug only)")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper()),
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
    )

    import jax

    from a3t_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", args.prng)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    from a3t_tpu.tasks import MLMTask, load_config

    if args.print_config:
        import sys

        import yaml

        from a3t_tpu.tasks.config import A3TTaskConfig, _to_dict

        cfg = (load_config(args.config, args.set) if args.config
               else A3TTaskConfig())
        yaml.safe_dump(_to_dict(cfg), sys.stdout, sort_keys=False)
        return

    if args.config is None:
        parser.error("--config is required (or use --print-config)")

    shard = (0, 1)
    if args.coordinator is not None:
        from a3t_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(args.coordinator, args.num_hosts, args.host_id)
        shard = (args.host_id, args.num_hosts)

    cfg = load_config(args.config, args.set)
    MLMTask.run(cfg, shard=shard)


if __name__ == "__main__":
    main()
