"""centernet_lightning_tpu — TPU-native CenterNet detection + tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
gau-nernst/centernet-lightning: CenterNet detection, FairMOT-style tracking,
COCO/VOC/CrowdHuman/MOT/KITTI data pipelines, COCO mAP + MOT metrics, and a
data-parallel training stack — designed for TPU (NHWC, static shapes, fused
device decode, jax.sharding mesh parallelism) rather than translated from
the reference's PyTorch patterns.
"""

__version__ = "0.1.0"

from .api import CenterNetPredictor, build_centernet  # noqa: E402
from .models.centernet import CenterNet  # noqa: E402
from .models.tracker import Track, Tracker, build_tracker  # noqa: E402
