from .torch_import import import_state_dict, flatten_params, unflatten_params
