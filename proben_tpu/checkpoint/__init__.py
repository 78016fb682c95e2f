from .orbax_ckpt import CheckpointManager, restore_pytree, save_pytree
from .torch_import import (
    convert_caffe2_names,
    fc1_nchw_to_nhwc_perm,
    import_detectron2_checkpoint,
    load_state_dict,
)

__all__ = [
    "CheckpointManager",
    "restore_pytree",
    "save_pytree",
    "convert_caffe2_names",
    "fc1_nchw_to_nhwc_perm",
    "import_detectron2_checkpoint",
    "load_state_dict",
]
