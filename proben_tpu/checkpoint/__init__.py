from .orbax_ckpt import CheckpointManager, restore_pytree, save_pytree
from .paths import catalog_entry_url, resolve_checkpoint_path
from .torch_import import (
    convert_caffe2_names,
    fc1_nchw_to_nhwc_perm,
    import_detectron2_checkpoint,
    load_state_dict,
)

__all__ = [
    "CheckpointManager",
    "catalog_entry_url",
    "resolve_checkpoint_path",
    "restore_pytree",
    "save_pytree",
    "convert_caffe2_names",
    "fc1_nchw_to_nhwc_perm",
    "import_detectron2_checkpoint",
    "load_state_dict",
]
