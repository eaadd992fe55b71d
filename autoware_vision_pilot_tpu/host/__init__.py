from .shm import VisionPilotStateStruct, SharedStatePublisher, SharedStateReader
