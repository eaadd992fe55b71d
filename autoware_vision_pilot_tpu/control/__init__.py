from .steering import SteeringController, SteeringFilter
from .speed_planner import SpeedPlanner, RSSConstants
from .pi_controller import PIController
