from .action_tokenizer import ActionCodec, ActionTokenizer
from .norm_stats import NormalizationType, load_dataset_statistics, save_dataset_statistics

__all__ = [
    "ActionCodec",
    "ActionTokenizer",
    "NormalizationType",
    "load_dataset_statistics",
    "save_dataset_statistics",
]
