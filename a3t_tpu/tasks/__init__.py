from a3t_tpu.tasks.config import A3TTaskConfig, load_config
from a3t_tpu.tasks.mlm import MLMTask

__all__ = ["A3TTaskConfig", "load_config", "MLMTask", "FS2Task",
           "FS2TaskConfig"]


def __getattr__(name):
    # FS2Task pulls in the fastspeech2 model stack; keep it lazy so the
    # common MLM path doesn't pay the import
    if name in ("FS2Task", "FS2TaskConfig"):
        from a3t_tpu.tasks import fs2

        return getattr(fs2, name)
    raise AttributeError(name)
