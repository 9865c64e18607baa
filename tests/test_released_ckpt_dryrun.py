"""Released-checkpoint pipeline dry-run at the released model shape.

The north star "COCO mAP within 0.1 of the released ResNet34-BiFPN
checkpoint" (reference docs/model_zoo.md:3-5) cannot be replicated in this
environment (no dataset, no checkpoint, zero egress). This test proves the
ENTIRE pipeline in-env with zero manual steps: build the reference-layout
ResNet34-BiFPN Lightning .ckpt (reference tools/export.py:8
load_from_checkpoint layout: {"state_dict": {"model.<module>.<param>": t}}),
convert it through the real `tools/convert_checkpoint.py` CLI, and drive
`tools/validate.py` end-to-end on a synthetic COCO directory — so the day a
real checkpoint/dataset appears it is two commands.

Resolution note: the pipeline runs at 128x128 (CPU compile time; the
1-core VM takes minutes at 512^2) — the MODEL is the released family at
full width (ResNet-34 + BiFPN-160 x2 + 256-wide heads, 80 classes); conv
parameter shapes are resolution-independent, so the conversion exercised
here is byte-for-byte the released-shape conversion.
"""
import json
import math
import os
import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from tests.test_torch_convert import (  # noqa: E402
    TorchBiFPN,
    TorchHead,
    TorchResNet,
    _randomize_bn,
)

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TorchReleasedCenterNet(nn.Module):
    """The released model family: torchvision-layout ResNet-34 backbone,
    BiFPN-160 x2 neck, 256-wide depth-1 heads over 80 classes (reference
    models/meta.py:33-47 GenericModel module naming: backbone / neck /
    heads.heatmap / heads.box_2d)."""

    def __init__(self, num_classes=80, neck_ch=160, repeats=2):
        super().__init__()
        self.backbone = TorchResNet((3, 4, 6, 3))
        self.neck = TorchBiFPN([64, 128, 256, 512], neck_ch, repeats=repeats)
        prior = math.log(0.01 / 0.99)
        self.heads = nn.ModuleDict({
            "heatmap": TorchHead(neck_ch, 256, 1, num_classes, init_bias=prior),
            "box_2d": TorchHead(neck_ch, 256, 1, 4),
        })

    def forward(self, x):
        feats = self.backbone(x)
        y = self.neck(feats)
        return {name: head(y) for name, head in self.heads.items()}


def _write_synthetic_coco(root, n_images=4, size=128, num_classes=80):
    import cv2

    img_dir = os.path.join(root, "img")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        name = f"{i:04d}.jpg"
        img = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
        for _ in range(2):
            x, y = int(rng.integers(0, size - 40)), int(rng.integers(0, size - 40))
            w, h = int(rng.integers(16, 40)), int(rng.integers(16, 40))
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": int(rng.integers(1, num_classes + 1)),
                "bbox": [x, y, w, h], "area": w * h * 0.8, "iscrowd": 0,
            })
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i + 1, "file_name": name,
                       "width": size, "height": size})
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": c, "name": str(c)}
                           for c in range(1, num_classes + 1)],
        }, f)
    return img_dir, ann_path


def _run_cli(script, argv, capsys=None):
    old_argv = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, script), run_name="__main__")
    finally:
        sys.argv = old_argv


def test_released_resnet34_bifpn_ckpt_to_metrics(tmp_path, capsys):
    torch.manual_seed(0)
    tm = TorchReleasedCenterNet().eval()
    _randomize_bn(tm)

    # 1. the reference-layout Lightning checkpoint (tools/export.py:8)
    ckpt_path = str(tmp_path / "resnet34_bifpn.ckpt")
    torch.save({
        "state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()},
        "hyper_parameters": {"num_classes": 80},
    }, ckpt_path)

    # 2. the model config (the released family: ResNet34-BiFPN)
    config_path = str(tmp_path / "resnet34_bifpn.yaml")
    with open(config_path, "w") as f:
        f.write(
            "model:\n"
            "  num_classes: 80\n"
            "  backbone: resnet34\n"
            "  neck: BiFPN\n"
            "  neck_config:\n"
            "    out_channels: 160\n"
            "    num_repeats: 2\n"
            "  head_config:\n"
            "    width: 256\n"
            "    depth: 1\n"
            "  num_detections: 50\n"
            "  image_size: [128, 128]\n"
        )

    # 3. convert through the real CLI
    out_dir = str(tmp_path / "converted")
    _run_cli("tools/convert_checkpoint.py",
             ["--config", config_path, "--torch-ckpt", ckpt_path,
              "--output", out_dir])
    assert os.path.isdir(out_dir)

    # 4. converted model reproduces the torch model's raw heads (the
    # conversion-correctness signal at the released width)
    from centernet_lightning_tpu import build_centernet

    predictor = build_centernet(config_path, checkpoint=out_dir)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_out = predictor.task.apply(predictor.variables, x)
    for name in ("heatmap", "box_2d"):
        np.testing.assert_allclose(
            t_out[name].numpy().transpose(0, 2, 3, 1), np.asarray(f_out[name]),
            rtol=1e-2, atol=1e-3)

    # 5. validate CLI end-to-end on synthetic COCO -> the 12 metrics
    img_dir, ann_path = _write_synthetic_coco(str(tmp_path / "coco"))
    capsys.readouterr()  # drop converter stdout
    _run_cli("tools/validate.py",
             ["--checkpoint", out_dir, "--config", config_path,
              "--img-dir", img_dir, "--ann-json", ann_path,
              "--batch-size", "2", "--image-size", "128",
              "--num-detections", "50"])
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert set(metrics) == {
        "mAP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
        "AR1", "AR10", "mAR", "AR_small", "AR_medium", "AR_large",
    }
    for v in metrics.values():
        assert np.isfinite(v)
