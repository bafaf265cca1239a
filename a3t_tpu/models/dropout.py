"""Recompute-in-backward dropout.

Saves only the PRNG key as the residual and regenerates the mask in the
backward pass.  Step-time *neutral* vs nn.Dropout at the bench shape
(195.5 vs 195.4 ms — the ~27 ms the elementwise dropout sites cost is
forward RNG + mask application, not residual traffic), but it removes
~34 activation-sized mask residuals from live memory between forward and
backward — headroom for longer sequences and bigger batches.

Distributionally identical to flax's nn.Dropout; the realized bits differ
(different key-consumption order), which only matters for bit-exact
replay of nn.Dropout-trained runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


# NB: a byte-packed variant (4 mask elements per u32 draw via
# bitcast_convert_type) was measured *slower* (217 vs 195 ms/step) — the
# u8 bitcast + flat reshape breaks XLA's elementwise fusion; the plain
# bernoulli form below is step-time neutral vs nn.Dropout and saves the
# mask residual.
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def seeded_dropout(x, key, rate: float):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _fwd(x, key, rate):
    return seeded_dropout(x, key, rate), key


def _bwd(rate, key, g):
    keep = jax.random.bernoulli(key, 1.0 - rate, g.shape)
    dx = jnp.where(keep, g / (1.0 - rate), 0.0).astype(g.dtype)
    return dx, None


seeded_dropout.defvjp(_fwd, _bwd)


class SeededDropout(nn.Module):
    """Drop-in for nn.Dropout with the recompute-in-backward rule."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return seeded_dropout(x, self.make_rng("dropout"), float(self.rate))
