"""Process-level JAX runtime knobs shared by the CLIs and benches.

The reference counterpart is the scatter of ``torch.backends`` /
``CUDA_VISIBLE_DEVICES`` tweaks in espnet2/bin entry points; on TPU the
one knob that materially changes operations is XLA's *persistent
compilation cache*: the full-size train step takes ~80 s to several
minutes to compile over a remote-tunnel backend, and a resumed run pays
it again for every bucket shape.  With the cache enabled, a restart
deserializes the executable in seconds, which is what makes bounded-chunk
training (timeout + resume, trainer.py walltime dance) cheap.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("a3t_tpu")

_DEFAULT_CACHE = os.path.expanduser("~/.cache/a3t_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache.

    ``cache_dir`` defaults to ``$A3T_COMPILE_CACHE`` or
    ``~/.cache/a3t_tpu/xla``; setting ``A3T_COMPILE_CACHE=0`` disables.
    Returns the directory in use (None when disabled).  Safe to call
    multiple times.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("A3T_COMPILE_CACHE", _DEFAULT_CACHE)
    if cache_dir in ("0", "", "none", "off"):
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program that takes >=1 s to compile (default threshold
    # only caches "expensive" ones; tunnel round-trips make even small
    # programs worth caching)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logger.info("XLA compilation cache: %s", cache_dir)
    return cache_dir
