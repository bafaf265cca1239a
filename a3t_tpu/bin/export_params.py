"""Export a params-only (optionally bf16) stash from a training exp dir.

The reference moves weights between runs with --init_param, pointing at a
full ``.pth`` (espnet2/torch_utils/load_pretrained_model.py:43-102).  The
TPU-native equivalent strips a ~1 GB orbax train state (params + Adam
moments) down to a params-only dir — ~1/6 the bytes in bf16 — that
``TrainerConfig.init_params_dir`` warm-starts from and the inference
loaders (tasks/mlm.py ``ave_*`` path) already understand.

    python -m a3t_tpu.bin.export_params --exp exp/soak12k \
        --out artifacts/soak12k_params --dtype bfloat16 [--epoch 112]
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp", required=True, help="exp dir with epoch_N/"
                    " checkpoints (or any dir holding a params tree)")
    ap.add_argument("--epoch", default="latest",
                    help="'latest', an epoch number, or a subdir name")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "keep"])
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from a3t_tpu.train.checkpoint import restore_portable

    if args.epoch == "latest":
        with open(os.path.join(args.exp, "LATEST")) as f:
            sub = f"epoch_{f.read().strip()}"
    elif args.epoch.isdigit():
        sub = f"epoch_{args.epoch}"
    else:
        sub = args.epoch
    src = os.path.join(args.exp, sub)
    tree = restore_portable(src)
    params = tree.get("params", tree)
    if args.dtype != "keep":
        dt = np.dtype("float32") if args.dtype == "float32" else "bfloat16"
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(dt), params)
    # atomic replace: save to .tmp first so an interrupted export (the
    # recipes run under wall-clock timeouts) never destroys the only
    # committed warm-start stash
    out = os.path.abspath(args.out)
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(tmp, {"params": params})
    ckpt.wait_until_finished()
    # ship the token list and model config so the stash is self-contained:
    # tokens for grow_vocab warm starts on extending corpora, config so the
    # exact architecture (e.g. spemb_dim) is reconstructible from the stash
    for name in ("tokens.txt", "config.yaml"):
        src_f = os.path.join(args.exp, name)
        if os.path.exists(src_f):
            shutil.copy(src_f, os.path.join(tmp, name))
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    n = sum(int(np.prod(np.asarray(x).shape))
            for x in jax.tree_util.tree_leaves(params))
    print(f"exported {n / 1e6:.1f}M params from {src} -> {out} "
          f"({args.dtype})")


if __name__ == "__main__":
    main()
