from .box_np import (
    box_giou_distance_matrix,
    box_giou_matrix,
    box_inter_union_matrix,
    box_iou_distance_matrix,
    box_iou_matrix,
    convert_box_format,
)
from .kalman import KalmanFilter
