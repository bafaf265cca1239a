"""Validation-time mel plots (the reference's attention/att_ws plot slot,
trainer.py:764+ — disabled in the shipped config via num_att_plot: 0, but
the hook exists; here the more useful artifact for a mel-reconstruction
model is target vs predicted mel with the masked span marked)."""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def make_mel_plot_fn(model, frontend, normalizer, host_batch, out_dir: str,
                     n_examples: int = 3):
    """Build plot_fn(state, epoch): dump reconstructed-vs-target mels for
    the first ``n_examples`` utterances of a fixed validation batch."""
    from a3t_tpu.train.train_step import featurize

    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    @jax.jit
    def forward(params, batch_stats):
        mb = featurize(frontend, batch, use_fused=False,
                       normalizer=normalizer)
        before, after, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, **mb,
            train=False)
        return mb["speech"], (after if after is not None else before), \
            mb["masked_position"], mb["speech_mask"]

    def plot_fn(state, epoch: int):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        target, pred, masked, valid = (
            np.asarray(x) for x in forward(state.params, state.batch_stats))
        os.makedirs(out_dir, exist_ok=True)
        for i in range(min(n_examples, target.shape[0])):
            n_f = int(valid[i].sum())
            fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
            for ax, mel, title in zip(
                    axes, (target[i, :n_f], pred[i, :n_f]),
                    ("target", "reconstruction")):
                ax.imshow(mel.T, origin="lower", aspect="auto",
                          interpolation="none")
                ax.set_ylabel(title)
            # mark the masked span(s) on both panels
            for t in np.nonzero(masked[i, :n_f])[0]:
                for ax in axes:
                    ax.axvline(t, color="w", alpha=0.04)
            fig.suptitle(f"epoch {epoch} utt {i}")
            fig.savefig(os.path.join(out_dir, f"epoch{epoch}_utt{i}.png"),
                        dpi=80)
            plt.close(fig)

    return plot_fn


def _attn_entries(tree, prefix=""):
    """Walk an intermediates tree -> [(path, (B, H, T1, T2) array), ...]."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else str(k)
            if k == "attn":
                # sow stores a tuple of sown values
                out.extend((p, np.asarray(a)) for a in v)
            else:
                out.extend(_attn_entries(v, p))
    return out


def make_attention_plot_fn(model, frontend, normalizer, host_batch,
                           out_dir: str, n_examples: int = 1):
    """Build plot_fn(state, epoch): dump per-layer attention maps (the
    reference's att_ws plots, trainer.py:764+ / plot_attention).

    ``model`` must be built with the fused attention kernels disabled
    (use_flash_attention/use_pallas_attention False) — the kernels never
    materialize the probabilities; the XLA path sows them when the
    "intermediates" collection is mutable."""
    from a3t_tpu.train.train_step import featurize

    # only the first n_examples are plotted — slice BEFORE the forward so
    # the sown (B, H, T, T) probability tensors stay small
    batch = {k: jnp.asarray(v[:n_examples]) for k, v in host_batch.items()}

    @jax.jit
    def forward(params, batch_stats):
        mb = featurize(frontend, batch, use_fused=False,
                       normalizer=normalizer)
        _, inter = model.apply(
            {"params": params, "batch_stats": batch_stats}, **mb,
            train=False, mutable=["intermediates"])
        return inter["intermediates"]

    def plot_fn(state, epoch: int):
        import logging

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        entries = _attn_entries(
            jax.tree.map(np.asarray, forward(state.params,
                                             state.batch_stats)))
        if not entries:
            # e.g. longformer configs: WindowedSelfAttention materializes
            # no probabilities to sow
            logging.getLogger("a3t_tpu").info(
                "no attention probabilities sown; skipping attention plots")
            return
        os.makedirs(out_dir, exist_ok=True)
        for i in range(min(n_examples, batch["text"].shape[0])):
            n_l = len(entries)
            n_h = max(e[1].shape[1] for e in entries)
            fig, axes = plt.subplots(
                n_l, n_h, figsize=(3 * n_h, 2.4 * n_l), squeeze=False)
            for li, (path, a) in enumerate(entries):
                label = path.rsplit("/attn", 1)[0].replace("s_", "")
                for h in range(a.shape[1]):
                    ax = axes[li][h]
                    ax.imshow(a[i, h], origin="upper", aspect="auto",
                              interpolation="none", cmap="viridis")
                    if h == 0:
                        ax.set_ylabel(label[-24:], fontsize=6)
                    ax.set_title(f"head {h}", fontsize=6)
                    ax.tick_params(labelsize=5)
            fig.suptitle(f"epoch {epoch} utt {i} attention")
            fig.tight_layout()
            fig.savefig(
                os.path.join(out_dir, f"att_epoch{epoch}_utt{i}.png"),
                dpi=70)
            plt.close(fig)

    return plot_fn
