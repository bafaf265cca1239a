"""Recompute-in-backward dropout with a raw-8-bit Bernoulli mask.

The elementwise dropout sites cost ~27 ms of the 195 ms production step
(docs/STEP_BENCH.json: prod vs flash_only_attn_drop), and the binding
resource is hardware-PRNG bit throughput — not the bits->float conversion
(raw u32 draws measured step-time neutral) and not mask-residual traffic.
So this module cuts *bits per element*:

* **u8 draws**: ``random_bits_u8 < ceil/round((1-rate)·256)`` — 8 random
  bits per element instead of bernoulli's 32.  Measured 195.6 -> 178.2
  ms/step at the bench shape (u16 lands between, 185.0).
* The u8 threshold quantizes the keep probability to multiples of 1/256
  (rate 0.2 realizes as 204.8/256 -> 205/256 = 0.80078 keep).  The
  inverted-scale uses the *realized* probability, so E[dropout(x)] == x
  holds exactly; only the regularization strength moves, by < 1/512 —
  far below run-to-run noise.
* **Recompute-in-backward** (jax.custom_vjp): saves only the PRNG key as
  the residual and regenerates the mask in the backward pass — removes
  ~34 activation-sized mask residuals from live memory between forward
  and backward (headroom for longer sequences and bigger batches) at no
  step-time cost.

Distributionally a Bernoulli(round((1-rate)·256)/256) dropout; flax's
nn.Dropout realizes different bits (key-consumption order and bit-to-mask
rule), which only matters for bit-exact replay of nn.Dropout-trained runs.

NB: a byte-packed variant (4 mask elements per u32 draw via
bitcast_convert_type + reshape) was measured *slower* (217 ms/step) — the
u8 bitcast + flat reshape breaks XLA's elementwise fusion.  ``bits()``
with a u8 dtype keeps the mask shape aligned with the operand, so the
compare/select fuse into the surrounding elementwise graph.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

# Bit-generation backend for the dropout masks.  "auto" (default) draws
# bits with whatever impl the incoming key carries — the production
# trainer sets jax_default_prng_impl=unsafe_rbg (bin/train.py:32), which
# lowers to XLA RngBitGenerator, the TPU's hardware generator.
# "threefry" (the jax default impl) is a counter-based PRNG computed on
# the VPU and costs +34 ms/step at the bench shape
# (docs/STEP_BENCH.json threefry_dropout vs prod); "rbg"/"unsafe_rbg"
# force the hardware path regardless of the key's impl.
# Reproducibility: bits remain a deterministic function of the (derived)
# key for every backend; a trained run replays bit-exactly under the
# SAME impl, but different impls realize different masks from one seed.
_PRNG_IMPL = os.environ.get("A3T_DROPOUT_PRNG", "auto")


def set_prng_impl(impl: str) -> None:
    """Select the mask bit generator
    ("auto" | "threefry" | "rbg" | "unsafe_rbg").

    "auto" follows the incoming key's impl (no re-keying).  Must be
    called before the train step is traced; benches A/B it.
    """
    global _PRNG_IMPL
    if impl not in ("auto", "threefry", "rbg", "unsafe_rbg"):
        raise ValueError(f"unknown dropout PRNG impl {impl!r}")
    _PRNG_IMPL = impl


def _threshold(rate: float) -> int:
    """Keep-threshold in [1, 255]: keep iff u8 < threshold."""
    return min(max(int(round((1.0 - rate) * 256.0)), 1), 255)


def realized_keep_prob(rate: float) -> float:
    """The exact keep probability the u8 mask realizes for ``rate``."""
    return _threshold(rate) / 256.0


_IMPL_SPEC = {"threefry": ("threefry2x32", 2), "rbg": ("rbg", 4),
              "unsafe_rbg": ("unsafe_rbg", 4)}


def _keep_mask(key, rate: float, shape):
    if _PRNG_IMPL != "auto":
        # re-key the incoming stream into the selected generator's state
        # size (threefry: 2 x u32, rbg variants: 4 x u32); when the key
        # already has that impl this is the identity, otherwise the
        # derived key keeps streams distinct per dropout site as before
        spec, n = _IMPL_SPEC[_PRNG_IMPL]
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            kd = jax.random.key_data(key)
        else:
            kd = key  # legacy uint32 key array (flax make_rng / PRNGKey)
        kd = kd.astype(jnp.uint32).reshape(-1)
        kd = jnp.tile(kd, n)[:n]
        key = jax.random.wrap_key_data(kd, impl=spec)
    bits = jax.random.bits(key, shape, jnp.uint8)
    return bits < jnp.uint8(_threshold(rate))


def _apply(x, keep, rate: float):
    # scale by the *realized* keep probability: exactly unbiased
    scale = jnp.asarray(1.0 / realized_keep_prob(rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _seeded_dropout(x, key, rate: float):
    return _apply(x, _keep_mask(key, rate, x.shape), rate)


def _fwd(x, key, rate):
    return _seeded_dropout(x, key, rate), key


def _bwd(rate, key, g):
    return _apply(g, _keep_mask(key, rate, g.shape), rate), None


_seeded_dropout.defvjp(_fwd, _bwd)


def seeded_dropout(x, key, rate: float):
    """Unbiased u8 dropout; identity when the rate is below the u8 grain.

    The u8 threshold quantizes keep probability to n/256 with a floor of
    1/256 dropped — a direct call with rate 0 (or any rate < 1/512, which
    rounds to that floor) must be the identity instead of silently dropping
    1/256 of elements.
    """
    if rate <= 1.0 / 512.0:
        return x
    return _seeded_dropout(x, key, rate)


class SeededDropout(nn.Module):
    """Drop-in for nn.Dropout with the recompute-in-backward rule."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return seeded_dropout(x, self.make_rng("dropout"), float(self.rate))
