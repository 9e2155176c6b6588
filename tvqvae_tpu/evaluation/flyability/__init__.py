from .distances import (
    calculate_trajectory_distances,
    discret_frechet,
    dtw,
    edr,
    erp,
    frechet,
    hausdorff,
    lcss,
    sspd,
)
from .bluesky import (
    BlueSkyConfig,
    build_logger,
    build_scenario,
    clean,
    simulate,
)

__all__ = [
    "calculate_trajectory_distances",
    "discret_frechet",
    "dtw",
    "edr",
    "erp",
    "frechet",
    "hausdorff",
    "lcss",
    "sspd",
    "BlueSkyConfig",
    "build_logger",
    "build_scenario",
    "clean",
    "simulate",
]
