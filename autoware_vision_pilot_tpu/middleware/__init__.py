from .backend import InferenceBackend, JaxInferenceBackend
from .transport import Transport, InProcTransport, make_transport
from .nodes import RunModelNode, RunAutoSpeedNode, VideoPublisherNode, \
    MasksVisualizationNode
