from .lane_filter import LaneFilterState, lane_filter_update, eval_poly
from .lane_tracker import (
    LaneTrackerState, lane_tracker_update, bev_pixels_to_meters,
)
from .path_finder import BayesState, path_finder_update, PathFinderOutput
from .tracking import ObjectFinder, KalmanFilter1D, TrackingResult, CIPOInfo
