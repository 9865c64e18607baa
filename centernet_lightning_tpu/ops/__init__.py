from . import boxes, decode, losses, preprocess, targets
from .boxes import box_iou, convert_box_format
from .decode import (
    decode_detections,
    gather_and_decode_boxes,
    gather_at_indices,
    get_topk_from_heatmap,
    peak_class_scores,
)
from .losses import get_box_loss, get_heatmap_loss, reduce_loss
from .preprocess import IMAGENET_MEAN, IMAGENET_STD, preprocess
from .targets import center_sample_indices, get_radius_fn, render_heatmap
