from .carla_bridge import CarlaBridge, StatePublisherBridge
