from .config import Config, load_config
from .timers import FpsTimer, PerformanceMetrics
from .pipeline import (
    LateralPipeline,
    LongitudinalPipeline,
    PipelineEngine,
    ThreadSafeQueue,
    DoubleFrameBuffer,
    FrameResult,
)
