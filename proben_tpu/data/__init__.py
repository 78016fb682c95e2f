from .builtin import COCO_THING_CLASSES, register_all_builtin
from .catalog import DatasetCatalog, MetadataCatalog
from .cityscapes import load_cityscapes_instances, register_cityscapes_instances
from .coco import load_coco_json, load_sem_seg, register_coco_instances
from .dataset_mapper import DatasetMapper, MapperConfig
from .detection_utils import read_image
from .loader import TrainLoader, build_test_loader, collate, training_index_stream
from .lvis import load_lvis_json, register_lvis_instances
from .pascal_voc import load_voc_instances, register_pascal_voc

__all__ = [
    "COCO_THING_CLASSES",
    "DatasetCatalog",
    "MetadataCatalog",
    "load_coco_json",
    "load_sem_seg",
    "load_cityscapes_instances",
    "load_lvis_json",
    "load_voc_instances",
    "register_all_builtin",
    "register_cityscapes_instances",
    "register_coco_instances",
    "register_lvis_instances",
    "register_pascal_voc",
    "DatasetMapper",
    "MapperConfig",
    "read_image",
    "TrainLoader",
    "collate",
    "build_test_loader",
    "training_index_stream",
]
