from foldingdiff_tpu.training.trainer import Trainer, TrainConfig  # noqa: F401
