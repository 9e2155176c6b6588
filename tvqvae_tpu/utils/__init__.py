from .schedule import warmup_cosine_schedule
from .scaler import MinMaxScaler

__all__ = ["warmup_cosine_schedule", "MinMaxScaler"]
