"""Device mesh construction.

The reference's only training parallelism is NCCL DDP over 8 GPUs
(espnet2/train/distributed_utils.py:14-110, trainer.py:250-265).  The
TPU-native equivalent is a named mesh with a ``data`` axis (gradients
all-reduce over ICI via XLA-inserted psums) plus a ``model`` axis for
tensor parallelism of the wide layers — something the reference has no
analogue of.  Multi-host bootstrap is ``jax.distributed.initialize``;
on a single process the mesh simply spans the local devices.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to carve the device fleet.

    ``data_parallel=None`` means "all remaining devices": with
    ``tensor_parallel=sequence_parallel=1`` this reproduces the reference's
    pure-DDP layout.  ``sequence_parallel>1`` adds a ``seq`` axis that the
    train step shards the *time* dimension of the feature tensors over —
    context parallelism for long-audio pretraining, which the reference
    (Longformer-only sequence scaling, SURVEY §5.7) has no analogue of.
    GSPMD turns the windowed attention's band structure into
    collective-permute halo exchanges over ICI.
    """

    data_parallel: int | None = None
    tensor_parallel: int = 1
    sequence_parallel: int = 1


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    tp = config.tensor_parallel
    sp = config.sequence_parallel
    dp = config.data_parallel if config.data_parallel is not None \
        else n // (tp * sp)
    if dp * tp * sp != n:
        raise ValueError(
            f"mesh {dp}x{sp}x{tp} does not cover {n} devices; set "
            "data_parallel/sequence_parallel/tensor_parallel to factor "
            "the device count"
        )
    if sp > 1:
        return Mesh(devices.reshape(dp, sp, tp),
                    (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    # keep the historical 2-axis layout when no seq axis is requested so
    # existing checkpoint/sharding layouts are unchanged
    return Mesh(devices.reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))


def seq_axis_size(mesh: Mesh) -> int:
    """Size of the sequence axis, 1 if the mesh has none."""
    return mesh.shape.get(SEQ_AXIS, 1) if mesh is not None else 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays are sharded along their leading (batch) dim over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host (DCN) bootstrap — the jax analogue of
    torch.distributed.init_process_group(env://)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
