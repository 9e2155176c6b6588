from .schedule import warmup_cosine_schedule
from .scaler import MinMaxScaler
from .checkpoint import load_checkpoint, save_checkpoint
from .logging import RunLogger
from .profiling import StepTimer, annotate, trace

__all__ = [
    "warmup_cosine_schedule",
    "MinMaxScaler",
    "load_checkpoint",
    "save_checkpoint",
    "RunLogger",
    "StepTimer",
    "annotate",
    "trace",
]
