from . import backbones, heads, layers, meta, necks
from .backbones import BACKBONES, build_backbone
from .centernet import CenterNet
from .fairmot import FairMOT
from .heads import GenericHead, ReIDClassifier
from .meta import GenericModel, create_model, param_count_report
from .necks import NECKS, BiFPN, FPN, IDA, SimpleNeck, build_neck
from .tracker import Track, Tracker, build_tracker


def build_centernet(*args, **kwargs):
    """Import-path parity with the reference
    (`from centernet_lightning.models import build_centernet`,
    reference README.md:34). Lazy to avoid a circular import."""
    from ..api import build_centernet as _build

    return _build(*args, **kwargs)
