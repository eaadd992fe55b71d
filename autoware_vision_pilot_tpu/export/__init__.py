from .checkpoints import (
    save_checkpoint,
    load_checkpoint,
    save_msgpack,
    load_msgpack,
)
