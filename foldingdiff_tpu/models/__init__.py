from foldingdiff_tpu.models.config import ModelConfig  # noqa: F401
from foldingdiff_tpu.models.bert import BertForDiffusion  # noqa: F401
