from .losses import LossConfig, OptimizationLoss  # noqa: F401
from .lpips import LPIPS  # noqa: F401
