from .common import (
    rasterize_lanes,
    UNIFIED_LANE_COLORS,
    write_unified_sample,
    lidar_depth_fill,
)
from .tusimple import parse_tusimple_label
from .culane import parse_culane_lines
from .bdd100k import bdd100k_drivable_to_sceneseg
