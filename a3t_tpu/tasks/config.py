"""YAML-driven task configuration.

The reference layers argparse + ClassChoices registries + yaml defaults
(espnet2/tasks/abs_task.py:253-830, utils/config_argparse.py); the resolved
config is dumped to ``exp/config.yaml`` and is the single source for
inference-time model reconstruction (tasks/mlm.py:446-496).  Here the whole
configuration is a tree of frozen dataclasses with the same round-trip
property: ``load_config(path)`` <-> ``save_config(cfg, path)``, and
``--set a.b.c=value`` CLI overrides.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import yaml

from a3t_tpu.data.batcher import BatcherConfig
from a3t_tpu.dsp import LogMelConfig
from a3t_tpu.models.conformer import EncoderConfig
from a3t_tpu.models.mlm import A3TModelConfig
from a3t_tpu.parallel import MeshConfig
from a3t_tpu.train import OptimConfig, TrainerConfig


@dataclasses.dataclass
class A3TTaskConfig:
    # data
    train_data_dir: str = ""
    valid_data_dir: str = ""
    token_list: str = ""  # path; built from train text if empty
    exp_dir: str = "exp/a3t"
    speech_only: bool = False
    num_workers_prefetch: int = 2
    use_tensorboard: bool = False
    # Weights & Biases sink (abs_task.py:1243-1278); requires the wandb
    # package — silently skipped when unavailable
    use_wandb: bool = False
    wandb_project: str = "a3t_tpu"
    # dump N reconstructed-vs-target mel plots per epoch during validation
    # (the reference's num_att_plot analogue, trainer.py:764+; the shipped
    # config disables it via num_att_plot: 0)
    num_plot_examples: int = 0
    # multi-corpus pretraining: list of dicts with keys
    # {name, data_dir, portion, speech_only?, frontend?{...}} — the
    # libritts/librispeech/vctk .6/.2/.2 mixture (tasks/mlm.py:499-591).
    # Empty = single-corpus training from train_data_dir.
    corpora: tuple = ()
    # "none" | "global_mvn" | "utterance_mvn" (shipped recipe: none,
    # mlm.sh:537); global_mvn reads ``stats_file`` (collect_stats output)
    normalize: str = "none"
    stats_file: str = ""
    # x-vector .npz for speaker conditioning (model.spemb_dim > 0): keys
    # are speaker names (spk2xvector, resolved through each data dir's
    # utt2spk) and/or utterance ids (direct per-utt embeddings)
    spemb_file: str = ""
    # components
    frontend: LogMelConfig = dataclasses.field(default_factory=LogMelConfig)
    model: A3TModelConfig = dataclasses.field(default_factory=A3TModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    batcher: BatcherConfig = dataclasses.field(default_factory=BatcherConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    use_fused_frontend: bool = True


def _build(cls, data: Any):
    """Recursively build (frozen) dataclasses from plain dicts."""
    if data is None:
        return cls()
    if not dataclasses.is_dataclass(cls):
        return data
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in data.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        f = fields[k]
        ft = f.type if not isinstance(f.type, str) else None
        target = _field_dataclass(cls, f)
        if target is not None and isinstance(v, dict):
            kwargs[k] = _build(target, v)
        elif target is not None and v is None:
            kwargs[k] = None
        else:
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
    return cls(**kwargs)


_NESTED = {
    "frontend": LogMelConfig,
    "model": A3TModelConfig,
    "optim": OptimConfig,
    "batcher": BatcherConfig,
    "trainer": TrainerConfig,
    "mesh": MeshConfig,
    "encoder": EncoderConfig,
    "decoder": EncoderConfig,
}


def _field_dataclass(cls, f) -> Optional[type]:
    """Resolve the dataclass type of a field, preferring the actual type
    annotation (so task configs with differently-typed fields of the same
    name — e.g. MLM vs FS2 ``model`` — both round-trip)."""
    import typing

    try:
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {}
    t = hints.get(f.name)
    if t is not None:
        if typing.get_origin(t) is typing.Union:
            args = [a for a in typing.get_args(t) if a is not type(None)]
            t = args[0] if len(args) == 1 else None
        if t is not None and dataclasses.is_dataclass(t):
            return t
    return _NESTED.get(f.name)


def _to_dict(obj) -> Any:
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_dict(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, tuple):
        return list(obj)
    return obj


def load_yaml_dict(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def load_config(path: str, overrides: Optional[list[str]] = None) -> A3TTaskConfig:
    with open(path, encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}
    data = apply_overrides(data, overrides or [])
    return _build(A3TTaskConfig, data)


def config_from_dict(data: dict) -> A3TTaskConfig:
    return _build(A3TTaskConfig, data)


def save_config(cfg: A3TTaskConfig, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(_to_dict(cfg), f, sort_keys=False)


def apply_overrides(data: dict, overrides: list[str]) -> dict:
    """Apply ``a.b.c=value`` CLI overrides (yaml-parsed values)."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return data
