from .catalog import DatasetCatalog, MetadataCatalog
from .coco import load_coco_json, register_coco_instances
from .dataset_mapper import DatasetMapper, MapperConfig
from .detection_utils import read_image
from .loader import TrainLoader, build_test_loader, collate, training_index_stream

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "load_coco_json",
    "register_coco_instances",
    "DatasetMapper",
    "MapperConfig",
    "read_image",
    "TrainLoader",
    "collate",
    "build_test_loader",
    "training_index_stream",
]
