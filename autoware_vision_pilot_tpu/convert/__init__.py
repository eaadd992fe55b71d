from .torch_import import import_state_dict, flatten_params, unflatten_params
from .onnx_import import (
    import_onnx, load_onnx_state_dict, save_state_dict_as_onnx)
