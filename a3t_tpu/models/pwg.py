"""ParallelWaveGAN generator (JAX/flax) — the vocoder family.

A faithful re-expression of the reference generator
(espnet2/gan_tts/parallel_wavegan/parallel_wavegan.py:26-229,
gan_tts/wavenet/residual_block.py:43-169, gan_tts/parallel_wavegan/
upsample.py:22-189) in channels-last layout:

* noise (B, T_wav, 1) -> 1x1 conv -> 30 dilated residual blocks
  (gated tanh/sigmoid, mel conditioning via 1x1, fused res+skip 1x1),
* mel (B, T_feats, C) -> context conv -> nearest-stretch + smoothing conv
  per upsample scale -> (B, T_wav, C),
* skip sum * sqrt(1/layers) -> relu -> 1x1 -> relu -> 1x1 -> waveform.

Pretrained ``parallel_wavegan`` checkpoints (the tags sedit_inference.py
downloads, :339-348) are imported with weight-norm folded
(:func:`convert_pwg_state`), so inference is pure dense convs — exactly
what XLA fuses best on TPU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class PWGConfig:
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    # hop 300 (24 kHz recipes) = 4*5*3*5; hop 256 (LJSpeech) = 4*4*4*4
    upsample_scales: tuple = (4, 5, 3, 5)
    # express each dilation-d conv as d phase-interleaved dilation-1 convs
    # (identical math; avoids XLA's pathological compile times for large
    # temporal dilations). Requires T % max_dilation == 0.
    phase_conv: bool = False

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales))


kaiming = nn.initializers.kaiming_normal()


class PWGResidualBlock(nn.Module):
    """WaveNet residual block with fused res+skip projection
    (residual_block.py:43-169, scale_residual=True)."""

    config: PWGConfig
    dilation: int

    @nn.compact
    def __call__(self, x, c):
        cfg = self.config
        residual = x
        conv = nn.Conv(
            cfg.gate_channels, (cfg.kernel_size,),
            kernel_dilation=1 if (cfg.phase_conv and self.dilation > 1)
            else self.dilation,
            padding="SAME", kernel_init=kaiming, name="conv",
        )
        if cfg.phase_conv and self.dilation > 1:
            # dilation-d SAME conv == dilation-1 conv on the d phase
            # streams: y[p + k*d] only mixes x[p + (k +- 1)*d], and the
            # zero padding at stream edges equals SAME's t +- d overrun
            b, t, ch = x.shape
            d = self.dilation
            if t % d != 0:
                raise ValueError(f"phase_conv needs T % dilation == 0 "
                                 f"(T={t}, d={d})")
            xr = x.reshape(b, t // d, d, ch).transpose(0, 2, 1, 3)
            h = conv(xr.reshape(b * d, t // d, ch))
            h = h.reshape(b, d, t // d, -1).transpose(0, 2, 1, 3)
            h = h.reshape(b, t, -1)
        else:
            h = conv(x)
        xa, xb = jnp.split(h, 2, axis=-1)
        ca, cb = jnp.split(
            nn.Conv(cfg.gate_channels, (1,), use_bias=False,
                    kernel_init=kaiming, name="conv1x1_aux")(c),
            2, axis=-1,
        )
        h = jnp.tanh(xa + ca) * nn.sigmoid(xb + cb)
        h = nn.Conv(
            cfg.residual_channels + cfg.skip_channels, (1,),
            kernel_init=kaiming, name="conv1x1_out",
        )(h)
        res, skip = jnp.split(h, [cfg.residual_channels], axis=-1)
        return (res + residual) * math.sqrt(0.5), skip


class PWGUpsampleNetwork(nn.Module):
    """Context conv + (nearest stretch -> smoothing conv) per scale
    (upsample.py:68-189, ConvInUpsampleNetwork)."""

    config: PWGConfig

    @nn.compact
    def __call__(self, c):
        cfg = self.config
        # replication pad + context conv (kernel 2*window+1, no bias)
        w = cfg.aux_context_window
        cp = jnp.concatenate(
            [jnp.repeat(c[:, :1], w, axis=1), c, jnp.repeat(c[:, -1:], w, axis=1)],
            axis=1,
        )
        c = nn.Conv(cfg.aux_channels, (2 * w + 1,), padding="VALID",
                    use_bias=False, kernel_init=kaiming, name="conv_in")(cp)

        for i, scale in enumerate(cfg.upsample_scales):
            # nearest-neighbor stretch along time
            c = jnp.repeat(c, scale, axis=1)
            # single smoothing filter along time, shared across mel channels
            # (torch Conv2d(1, 1, (1, 2*scale+1)); init 1/kernel_size)
            b, t, ch = c.shape
            flat = c.transpose(0, 2, 1).reshape(b * ch, t, 1)
            flat = nn.Conv(
                1, (2 * scale + 1,), padding="SAME", use_bias=False,
                kernel_init=nn.initializers.constant(1.0 / (2 * scale + 1)),
                name=f"up_conv_{i}",
            )(flat)
            c = flat.reshape(b, ch, t).transpose(0, 2, 1)
        return c


class ParallelWaveGANGenerator(nn.Module):
    """mel (B, T_feats, aux) [+ noise (B, T_wav, 1)] -> wav (B, T_wav)."""

    config: PWGConfig = PWGConfig()

    @nn.compact
    def __call__(self, c, z=None, rng: Optional[jax.Array] = None):
        cfg = self.config
        b, t_feats, _ = c.shape
        t_wav = t_feats * cfg.upsample_factor
        if z is None:
            rng = rng if rng is not None else self.make_rng("noise")
            z = jax.random.normal(rng, (b, t_wav, cfg.in_channels), c.dtype)

        c_up = PWGUpsampleNetwork(cfg, name="upsample_net")(c)

        x = nn.Conv(cfg.residual_channels, (1,), kernel_init=kaiming,
                    name="first_conv")(z)
        skips = 0.0
        layers_per_stack = cfg.layers // cfg.stacks
        for i in range(cfg.layers):
            x, s = PWGResidualBlock(
                cfg, dilation=2 ** (i % layers_per_stack), name=f"block_{i}"
            )(x, c_up)
            skips = skips + s
        x = skips * math.sqrt(1.0 / cfg.layers)

        x = nn.relu(x)
        x = nn.Conv(cfg.skip_channels, (1,), kernel_init=kaiming,
                    name="last_conv_1")(x)
        x = nn.relu(x)
        x = nn.Conv(cfg.out_channels, (1,), kernel_init=kaiming,
                    name="last_conv_2")(x)
        return x[..., 0]


class _PWGStack(nn.Module):
    """One dilation stack (layers_per_stack blocks, dilations 1..2^(n-1)),
    shaped as an nn.scan body: carry = (x, c_up), per-step output = skips."""

    config: PWGConfig

    @nn.compact
    def __call__(self, carry, _):
        cfg = self.config
        x, c_up = carry
        skips = 0.0
        for i in range(cfg.layers // cfg.stacks):
            x, s = PWGResidualBlock(cfg, dilation=2 ** i,
                                    name=f"block_{i}")(x, c_up)
            skips = skips + s
        return (x, c_up), skips


class ParallelWaveGANGeneratorScan(nn.Module):
    """Scan-over-stacks formulation of the PWG generator.

    Mathematically identical to :class:`ParallelWaveGANGenerator` (the
    dilation pattern 2^(i % layers_per_stack) repeats per stack), but the
    residual stacks are an ``nn.scan`` over one traced stack body — the
    unrolled 30-block graph compiled prohibitively slowly through the
    remote-compile tunnel (>30 min); this compiles the body once.  Used
    for *training* (a3t_tpu/train/vocoder.py); the unrolled module remains
    the import target for reference ``parallel_wavegan`` checkpoints
    (param names block_0..block_N match the torch layout).
    """

    config: PWGConfig = PWGConfig()

    @nn.compact
    def __call__(self, c, z=None, rng: Optional[jax.Array] = None):
        cfg = self.config
        b, t_feats, _ = c.shape
        t_wav = t_feats * cfg.upsample_factor
        if z is None:
            rng = rng if rng is not None else self.make_rng("noise")
            z = jax.random.normal(rng, (b, t_wav, cfg.in_channels), c.dtype)

        c_up = PWGUpsampleNetwork(cfg, name="upsample_net")(c)
        x = nn.Conv(cfg.residual_channels, (1,), kernel_init=kaiming,
                    name="first_conv")(z)
        # remat the stack body: the backward recomputes each stack's
        # activations instead of keeping all `layers` gate tensors live
        # ((B, T_wav, gate) x 30 at fp32 overflows a v5e's 16G HBM at
        # training crop sizes)
        scan = nn.scan(
            nn.remat(_PWGStack, prevent_cse=False),
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.stacks,
        )
        (x, _), skips = scan(cfg, name="stacks")((x, c_up), None)
        x = skips.sum(axis=0) * math.sqrt(1.0 / cfg.layers)

        x = nn.relu(x)
        x = nn.Conv(cfg.skip_channels, (1,), kernel_init=kaiming,
                    name="last_conv_1")(x)
        x = nn.relu(x)
        x = nn.Conv(cfg.out_channels, (1,), kernel_init=kaiming,
                    name="last_conv_2")(x)
        return x[..., 0]


class PWGDiscriminator(nn.Module):
    """Non-causal dilated-conv waveform discriminator.

    Re-expression of the reference ParallelWaveGANDiscriminator
    (espnet2/gan_tts/parallel_wavegan/parallel_wavegan.py:232-327): ten
    kernel-3 conv layers with linearly growing dilation (1,1,2,3,...,9),
    LeakyReLU(0.2) between, final layer 1-channel with no nonlinearity.
    Used only during vocoder training (LSGAN objective); inference never
    touches it.
    """

    layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        """wav (B, S) -> per-sample logits (B, S)."""
        h = x[..., None]
        for i in range(self.layers - 1):
            dilation = i if i > 0 else 1
            h = nn.Conv(self.conv_channels, (self.kernel_size,),
                        kernel_dilation=dilation, padding="SAME",
                        kernel_init=kaiming, name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, self.negative_slope)
        h = nn.Conv(1, (self.kernel_size,), padding="SAME",
                    kernel_init=kaiming, name="conv_out")(h)
        return h[..., 0]


# ---------------------------------------------------------------------------
# torch checkpoint import (weight-norm folding)
# ---------------------------------------------------------------------------

def _fold_weight_norm(sd: dict, key: str) -> np.ndarray:
    """Return the dense conv weight, folding weight_g/weight_v if present."""
    if f"{key}.weight" in sd:
        return np.asarray(sd[f"{key}.weight"])
    g = np.asarray(sd[f"{key}.weight_g"])
    v = np.asarray(sd[f"{key}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _conv_t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def convert_pwg_state(state_dict: dict, config: PWGConfig = PWGConfig()) -> dict:
    """Reference generator state dict -> flax params for this module.

    Accepts both the in-repo espnet2 generator and upstream
    ``parallel_wavegan`` package checkpoints (identical naming), with or
    without weight norm.
    """
    sd = {}
    for k, v in state_dict.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def conv(prefix, bias=True):
        p = {"kernel": _conv_t(_fold_weight_norm(sd, prefix))}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    params: dict = {
        "first_conv": conv("first_conv"),
        "last_conv_1": conv("last_conv_layers.1"),
        "last_conv_2": conv("last_conv_layers.3"),
    }

    up: dict = {"conv_in": conv("upsample_net.conv_in", bias=False)}
    for i in range(len(config.upsample_scales)):
        # torch up_layers: [stretch, conv2d] per scale -> conv2d at 2i+1;
        # weight (1, 1, 1, k) -> flax (k, 1, 1)
        w = _fold_weight_norm(sd, f"upsample_net.upsample.up_layers.{2 * i + 1}")
        up[f"up_conv_{i}"] = {"kernel": np.asarray(w).reshape(-1, 1, 1)}
    params["upsample_net"] = up

    for i in range(config.layers):
        params[f"block_{i}"] = {
            "conv": conv(f"conv_layers.{i}.conv"),
            "conv1x1_aux": conv(f"conv_layers.{i}.conv1x1_aux", bias=False),
            "conv1x1_out": conv(f"conv_layers.{i}.conv1x1_out"),
        }
    return {"params": params}


def load_pwg_checkpoint(path: str, config: PWGConfig = PWGConfig()) -> dict:
    """Load a ``parallel_wavegan`` pickle/pth checkpoint (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt
    for key in ("model", "generator"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    return convert_pwg_state(sd, config)
