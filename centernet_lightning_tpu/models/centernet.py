"""CenterNet detection task (functional, jit-first).

TPU-native re-design of the reference CenterNet LightningModule
(reference models/centernet.py:68-304). Instead of an object with stateful
hooks, the task bundles hyper-parameters + a flax model and exposes pure
functions (`compute_loss`, `decode_detections`) that close over only static
config — everything jits, shards, and differentiates.

Key behavioral contracts preserved:
 - loss structure: focal(heatmap)/num_boxes + w * box_loss/num_samples
   with 3x3 center sampling                         [centernet.py:123-175]
 - heads: heatmap (num_classes, focal prior bias) + box_2d (4)
                                                    [centernet.py:102-105]
 - decode: pseudo-NMS top-k + offset decode         [centernet.py:229-304]

Differences (deliberate, TPU-first):
 - targets are the padded CollateDetection arrays {boxes, labels, mask}
   (reference datasets/utils.py:41-74), not variable-length dict lists —
   fixed shapes are what makes the whole train step one XLA program.
 - layout is NHWC.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import decode as decode_ops
from ..ops import losses as loss_ops
from ..ops import targets as target_ops
from .meta import create_model

__all__ = ["CenterNet"]


@dataclass
class CenterNet:
    num_classes: int
    backbone: str = "resnet34"
    # False | True (raises: no download path here) | path to torch weights
    pretrained_backbone: Any = False
    neck: str = "FPN"
    neck_config: Optional[Dict[str, Any]] = None
    head_config: Optional[Dict[str, Any]] = None
    backbone_config: Optional[Dict[str, Any]] = None

    # box params (reference centernet.py:78-84)
    box_init_bias: Optional[float] = None
    box_loss: str = "L1Loss"
    box_loss_weight: float = 0.1
    box_log: bool = False
    box_multiplier: float = 1.0

    # heatmap params (reference centernet.py:85-91)
    heatmap_prior: float = 0.01
    heatmap_loss: str = "CornerNetFocalLoss"
    heatmap_loss_weight: float = 1.0
    heatmap_target: str = "cornernet"
    heatmap_target_params: Optional[Dict[str, float]] = None
    # SxS center sampling for box regression (reference centernet.py:149-166
    # is hardwired 3x3; 1 = exact-center only, the pre-center-sampling
    # recipe of the reference's Jan-2022 ablation rows (1)-(2))
    center_sampling_size: int = 3

    # inference config (reference centernet.py:92-94)
    nms_kernel: int = 3
    num_detections: int = 100

    # training/serving resolution (H, W) — recorded in hparams so a
    # checkpoint rebuilds a predictor at the resolution it was trained at
    # (InferenceDataset resizes to this; stride-32 divisible)
    image_size: Any = (512, 512)
    # input channel count (the Gen-A backbone.input_channels knob,
    # reference configs/test_config.yaml:6); only shapes the init dummy —
    # convs infer their in-channels from the first input
    input_channels: int = 3

    # data + optimizer passthrough (consumed by the trainer/CLI layers)
    train_data: Optional[Dict[str, Any]] = None
    val_data: Optional[Dict[str, Any]] = None
    optimizer_config: Dict[str, Any] = field(default_factory=dict)

    # tracking extension (FairMOT); None = plain detection
    reid_config: Optional[Dict[str, Any]] = None

    # optional extra block on the coarsest backbone map (reference
    # meta.py:43 slot), e.g. {'name': 'SPP', 'pool_sizes': [5, 9, 13]}
    extra_block: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        self.image_size = tuple(self.image_size)
        self.model, self.stride = create_model(
            num_classes=self.num_classes,
            backbone=self.backbone,
            neck=self.neck,
            neck_config=self.neck_config,
            head_config=self.head_config,
            heatmap_prior=self.heatmap_prior,
            box_init_bias=self.box_init_bias,
            backbone_config=self.backbone_config,
            reid_config=self.reid_config,
            extra_block=self.extra_block,
        )
        self._heatmap_loss_fn = loss_ops.get_heatmap_loss(self.heatmap_loss)
        self._box_loss_fn = loss_ops.get_box_loss(self.box_loss)
        self._radius_fn = target_ops.get_radius_fn(
            self.heatmap_target, **(self.heatmap_target_params or {})
        )

    # ------------------------------------------------------------------
    # model plumbing
    # ------------------------------------------------------------------

    def init(self, rng, image_size=None, batch_size: int = 1):
        # default to the task's own hparam so init/train/decode agree on
        # resolution without every caller re-passing it
        if image_size is None:
            image_size = self.image_size
        dummy = jnp.zeros((batch_size, *image_size, self.input_channels),
                          jnp.float32)
        # jit the whole init into ONE device program: eager init dispatches
        # thousands of tiny ops, which costs minutes at the axon tunnel's
        # ~20ms/dispatch (measured 276s eager vs <10s jitted for
        # mobilenet_v3_large)
        variables = jax.jit(partial(self.model.init, train=True))(rng, dummy)
        if self.pretrained_backbone:
            variables = self._load_pretrained_backbone(variables)
        if self.reid_config is not None:
            # the classifier tower only runs through classify_embeddings;
            # init it too so its params exist
            emb_dim = self.reid_config.get("emb_dim", 64)
            cls_vars = jax.jit(partial(
                self.model.init, train=True,
                method=self.model.classify_embeddings,
            ))(rng, jnp.zeros((2, emb_dim)))
            variables = _merge_variables(variables, cls_vars)
        return variables

    def _load_pretrained_backbone(self, variables):
        """Honor `pretrained_backbone` (reference meta.py:87
        `backbones.__dict__[name](pretrained=True)`): a path to a torch
        state dict (.pth/.ckpt) is converted and swapped into the backbone
        subtree. `True` without a path cannot download weights in this
        zero-egress environment and raises rather than silently no-op."""
        if self.pretrained_backbone is True:
            raise RuntimeError(
                "pretrained_backbone=True requires downloading torchvision "
                "weights, which this environment cannot do; pass a local "
                "path to a torch state dict instead "
                "(pretrained_backbone: /path/to/resnet34.pth)"
            )
        from ..utils.torch_convert import load_torch_resnet

        params, stats = load_torch_resnet(
            self.pretrained_backbone, arch=self.backbone
        )
        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"]["backbone"] = params
        if "batch_stats" in variables:
            variables["batch_stats"] = dict(variables["batch_stats"])
            variables["batch_stats"]["backbone"] = stats
        return variables

    def load_torch_checkpoint(self, path_or_state, image_size=None):
        """Full released-checkpoint ingestion: convert a Lightning .ckpt of
        the reference model into flax variables for this task (reference
        models/meta.py:87-96 + docs/model_zoo.md released ResNet34-BiFPN)."""
        from ..utils.torch_convert import load_torch_centernet

        template = self.init(jax.random.PRNGKey(0), image_size=image_size)
        return load_torch_centernet(
            path_or_state, template, backbone_arch=self.backbone
        )

    def apply(self, variables, images, train: bool = False, mutable=None):
        if mutable is None:
            mutable = ["batch_stats"] if train else False
        return self.model.apply(variables, images, train=train, mutable=mutable)

    # ------------------------------------------------------------------
    # training loss (jit-safe over padded batches)
    # ------------------------------------------------------------------

    def compute_loss(
        self,
        outputs: Dict[str, jnp.ndarray],
        targets: Dict[str, jnp.ndarray],
        stride: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Detection losses over one padded batch.

        outputs: {'heatmap': (N,H,W,C) logits, 'box_2d': (N,H,W,4)}
        targets: {'boxes': (N,K,4) xywh input coords, 'labels': (N,K),
                  'mask': (N,K)} — CollateDetection contract.
        Returns {'heatmap', 'box_2d', 'total'} scalars matching
        reference centernet.py:123-175 semantics.
        """
        stride = stride or self.stride
        # losses always in f32, independent of the forward compute dtype
        heatmap = outputs["heatmap"].astype(jnp.float32)
        box_offsets = outputs["box_2d"].astype(jnp.float32)
        n, out_h, out_w, _ = heatmap.shape

        boxes = targets["boxes"].astype(jnp.float32)
        labels = targets["labels"].astype(jnp.int32)
        mask = targets["mask"].astype(jnp.float32)

        target_heatmap = target_ops.render_heatmap(
            boxes, labels, mask, self.num_classes, out_h, out_w, stride,
            self._radius_fn,
        )
        num_dets = jnp.sum(mask)
        heatmap_loss = loss_ops.reduce_loss(
            self._heatmap_loss_fn(heatmap, target_heatmap), "sum",
            norm=jnp.maximum(1.0, num_dets),
        )

        # SxS center-sampled box regression (centernet.py:149-166)
        idx, sample_mask, target_xyxy = target_ops.center_sample_indices(
            boxes, mask, out_h, out_w, stride,
            sample_size=self.center_sampling_size,
        )
        pred_boxes = decode_ops.gather_and_decode_boxes(
            box_offsets, idx, box_log=self.box_log,
            box_multiplier=self.box_multiplier, stride=stride,
        )
        num_samples = jnp.sum(sample_mask)
        box_loss = loss_ops.reduce_loss(
            self._box_loss_fn(pred_boxes, target_xyxy), "sum",
            weights=sample_mask[..., None],
            norm=jnp.maximum(1.0, num_samples),
        )

        total = (
            heatmap_loss * self.heatmap_loss_weight
            + box_loss * self.box_loss_weight
        )
        return {"heatmap": heatmap_loss, "box_2d": box_loss, "total": total}

    # ------------------------------------------------------------------
    # inference decode
    # ------------------------------------------------------------------

    def decode_detections(
        self,
        heatmap: jnp.ndarray,
        box_offsets: jnp.ndarray,
        reid: Optional[jnp.ndarray] = None,
        normalize_boxes: bool = False,
        num_detections: Optional[int] = None,
        nms_kernel: Optional[int] = None,
        from_logits: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """heatmap is post-sigmoid (N,H,W,C) — or raw logits with
        from_logits=True (saves the full-map sigmoid; sigmoid is monotonic
        so results are identical). Reference centernet.py:229-241.
        Uses the fused Pallas peak kernel on TPU automatically."""
        return decode_ops.decode_detections_auto(
            heatmap, box_offsets, reid=reid,
            num_detections=num_detections or self.num_detections,
            nms_kernel=nms_kernel or self.nms_kernel,
            normalize_boxes=normalize_boxes,
            box_log=self.box_log,
            box_multiplier=self.box_multiplier,
            stride=self.stride,
            from_logits=from_logits,
        )

    def forward_and_decode(
        self, variables, images, normalize_boxes: bool = False,
        num_detections: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Single-program forward + decode (gather_detection2d contract,
        reference README.md:92-98). jit this."""
        outputs = self.model.apply(variables, images, train=False)
        return self.decode_detections(
            outputs["heatmap"], outputs["box_2d"],
            reid=outputs.get("reid"),
            normalize_boxes=normalize_boxes, num_detections=num_detections,
            from_logits=True,
        )

    # alias matching the reference/README naming
    gather_detection2d = forward_and_decode

    def get_dataloader(self, train: bool = True):
        """Build the train/val dataloader from the task's data hparams
        (reference centernet.py:220-227)."""
        from ..data.builder import loader_from_config

        config = dict((self.train_data if train else self.val_data) or {})
        if not config:
            raise ValueError("no train_data/val_data configured")
        return loader_from_config(config, train=train)

    @property
    def hparams(self) -> Dict[str, Any]:
        out = {
            k: v for k, v in self.__dict__.items()
            if k not in ("model", "_heatmap_loss_fn", "_box_loss_fn", "_radius_fn")
        }
        return out


def _merge_variables(a, b):
    """Shallow-merge two flax variable dicts (params/batch_stats trees)."""
    merged = dict(a)
    for col, tree in b.items():
        if col in merged:
            sub = dict(merged[col])
            sub.update(tree)
            merged[col] = sub
        else:
            merged[col] = tree
    return merged
