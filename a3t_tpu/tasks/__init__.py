from a3t_tpu.tasks.config import A3TTaskConfig, load_config
from a3t_tpu.tasks.mlm import MLMTask

__all__ = ["A3TTaskConfig", "load_config", "MLMTask"]
