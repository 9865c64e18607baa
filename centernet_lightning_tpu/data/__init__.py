from . import transforms
from .builder import DATASETS, build_dataloader, build_dataset, parse_transforms
from .coco import CocoDetection, load_coco_annotations
from .collate import CollateDetection, CollateTracking
from .crowdhuman import CrowdHumanDataset
from .detection_for_tracking import DetectionForTracking
from .inference import InferenceDataset
from .kitti import KITTITrackingDataset, KITTITrackingSequence
from .loader import DataLoader
from .mosaic import MosaicDataset
from .mot import MOTTrackingDataset, MOTTrackingSequence
from .transforms import Compose, build_transforms
from .voc import VOCDataset
