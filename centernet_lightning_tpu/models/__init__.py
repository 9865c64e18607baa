from . import backbones, heads, layers, meta, necks
from .backbones import BACKBONES, build_backbone
from .centernet import CenterNet
from .heads import EmbeddingHead, GenericHead, ReIDClassifier
from .meta import GenericModel, create_model, param_count_report
from .necks import NECKS, BiFPN, FPN, IDA, SimpleNeck, build_neck
