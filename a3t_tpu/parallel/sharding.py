"""Parameter partitioning rules (tensor parallelism + replication).

Rules are expressed over flattened parameter paths, so the model code stays
free of sharding annotations.  The layout follows the standard Megatron
split for transformer blocks:

* attention q/k/v projections: shard the *output* (head) dim over ``model``;
* attention output projection: shard the *input* dim over ``model``;
* feed-forward up-projection (Dense or Conv1d): shard hidden over ``model``;
* feed-forward down-projection: shard the input (hidden) dim over ``model``;
* everything else (norms, embeddings, postnet, mask feature): replicated.

XLA then inserts the psums over ICI that NCCL all-reduces provide in the
reference's DDP (trainer.py:250-265) — plus the TP collectives the
reference cannot express at all.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from a3t_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_partition_spec(path, value) -> P:
    """PartitionSpec for one parameter, by path name + rank."""
    name = _path_str(path)
    ndim = value.ndim

    # Attention projections (Dense kernels are (in, out)).
    if "self_attn" in name and name.endswith("kernel") and ndim == 2:
        if any(f"linear_{x}/" in name for x in ("q", "k", "v")) or \
           "linear_pos/" in name:
            return P(None, MODEL_AXIS)
        if "linear_out/" in name:
            return P(MODEL_AXIS, None)

    # Position-wise feed-forward: Dense (in, out) or Conv (k, in, out).
    if "feed_forward" in name and name.endswith("kernel"):
        is_up = "/Dense_0/" in name or "/Conv_0/" in name
        is_down = "/Dense_1/" in name or "/Conv_1/" in name
        if ndim == 2:
            return P(None, MODEL_AXIS) if is_up else (
                P(MODEL_AXIS, None) if is_down else P())
        if ndim == 3:
            return P(None, None, MODEL_AXIS) if is_up else (
                P(None, MODEL_AXIS, None) if is_down else P())

    return P()


def make_param_shardings(mesh: Mesh, params):
    """Tree of NamedShardings matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_partition_spec(path, v)),
        params,
    )


def shard_variables(mesh: Mesh, variables):
    """device_put a full variable collection ({params, batch_stats, ...})."""
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_partition_spec(path, v)),
        variables,
    )
    return jax.device_put(variables, shardings)


# ---------------------------------------------------------------------------
# optimizer-state sharding (the fairscale-OSS / ZeRO-1 analogue the
# reference enables via --sharded_ddp, trainer.py:215-220,244-248)
# ---------------------------------------------------------------------------

# moments smaller than this stay replicated — sharding tiny biases/norms
# buys nothing and costs collective latency
_MIN_SHARD_ELEMENTS = 2 ** 13


def moment_partition_spec(path, value, data_size: int) -> P:
    """PartitionSpec for one optimizer-moment tensor.

    Keeps the parameter's tensor-parallel layout (moments must be laid out
    like their parameter) and additionally shards the first free dimension
    divisible by the data-axis size — so Adam's mu/nu live once across the
    data replicas instead of once per replica.
    """
    base = param_partition_spec(path, value)
    spec = list(base) + [None] * (value.ndim - len(base))
    if value.size >= _MIN_SHARD_ELEMENTS:
        for i, s in enumerate(spec):
            if s is None and value.shape[i] % data_size == 0 \
                    and value.shape[i] >= data_size:
                spec[i] = DATA_AXIS
                break
    return P(*spec)


def shard_opt_state(mesh: Mesh, opt_state):
    """device_put an optax state with data-axis-sharded Adam moments.

    Scalar counters and small tensors are replicated; everything else is
    partitioned per :func:`moment_partition_spec`.  Inside the jitted train
    step XLA then keeps only the local moment shard per device and
    all-gathers the parameter update (reduce-scatter/all-gather — the
    ZeRO-1 dataflow) instead of replicating optimizer memory.
    """
    data_size = mesh.shape.get(DATA_AXIS, 1)

    def sharding(path, v):
        if getattr(v, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, moment_partition_spec(path, v, data_size))

    shardings = jax.tree_util.tree_map_with_path(sharding, opt_state)
    return jax.device_put(opt_state, shardings)
