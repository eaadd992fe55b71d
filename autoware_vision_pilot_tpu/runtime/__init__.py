from .config import Config, load_config
from .timers import FpsTimer, PerformanceMetrics
