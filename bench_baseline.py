#!/usr/bin/env python
"""Measure the reference's torch-CPU throughput to anchor `vs_baseline`.

The reference stack itself cannot run here (vision_toolbox / lightning /
albumentations are not installed), so this builds the SAME architecture the
reference assembles — torchvision-layout ResNet-34 -> FPN-256 -> two
3-deep 256-wide heads — in plain torch, with the reference's exact decode
(max_pool pseudo-NMS + topk + gather, centernet.py:243-304), and measures
forward+decode images/sec on CPU at 512x512. The result is cached to
BASELINE_measured.json (BASELINE.md: speed baselines must be measured, the
reference publishes none).
"""
import json
import os
import time

import torch
import torch.nn.functional as F
from torch import nn

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_measured.json")


class BasicBlock(nn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.down = None
        if stride != 1 or c_in != c_out:
            self.down = nn.Sequential(nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                                      nn.BatchNorm2d(c_out))

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class ResNet34FPNCenterNet(nn.Module):
    def __init__(self, num_classes=80, fpn_c=256, head_w=256, head_d=3):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
        chans = [64, 128, 256, 512]
        blocks = [3, 4, 6, 3]
        self.stages = nn.ModuleList()
        c_in = 64
        for i, (c, n) in enumerate(zip(chans, blocks)):
            layers = []
            for b in range(n):
                layers.append(BasicBlock(c_in, c, 2 if (i > 0 and b == 0) else 1))
                c_in = c
            self.stages.append(nn.Sequential(*layers))
        self.lateral = nn.ModuleList([nn.Conv2d(c, fpn_c, 1) for c in chans])
        self.smooth = nn.ModuleList([nn.Conv2d(fpn_c, fpn_c, 3, 1, 1) for _ in chans[:-1]])

        def head(out_c):
            layers = []
            cc = fpn_c
            for _ in range(head_d):
                layers += [nn.Conv2d(cc, head_w, 3, 1, 1, bias=False),
                           nn.BatchNorm2d(head_w), nn.ReLU(inplace=True)]
                cc = head_w
            layers.append(nn.Conv2d(head_w, out_c, 1))
            return nn.Sequential(*layers)

        self.heatmap = head(num_classes)
        self.box = head(4)

    def forward(self, x):
        x = self.stem(x)
        feats = []
        for stage in self.stages:
            x = stage(x)
            feats.append(x)
        p = self.lateral[-1](feats[-1])
        for i in range(len(feats) - 2, -1, -1):
            p = self.lateral[i](feats[i]) + F.interpolate(p, scale_factor=2, mode="nearest")
            p = self.smooth[i](p)
        return self.heatmap(p), self.box(p)


@torch.no_grad()
def decode(heatmap, box_offsets, k=100):
    """Reference decode: centernet.py:243-304."""
    n = heatmap.shape[0]
    heatmap = heatmap.sigmoid()
    mask = F.max_pool2d(heatmap, 3, 1, 1) == heatmap
    heatmap = heatmap * mask
    heatmap, labels = torch.max(heatmap, dim=1)
    scores, indices = torch.topk(heatmap.view(n, -1), k)
    labels = torch.gather(labels.view(n, -1), -1, indices)
    w = box_offsets.shape[-1]
    cx = torch.remainder(indices, w) + 0.5
    cy = torch.div(indices, w, rounding_mode="floor") + 0.5
    off = box_offsets.flatten(-2).clamp_min(0)
    x1 = cx - torch.gather(off[:, 0], -1, indices)
    y1 = cy - torch.gather(off[:, 1], -1, indices)
    x2 = cx + torch.gather(off[:, 2], -1, indices)
    y2 = cy + torch.gather(off[:, 3], -1, indices)
    return torch.stack((x1, y1, x2, y2), -1) * 4, scores, labels


def measure(batch_size=1, iters=10, warmup=2):
    torch.set_num_threads(os.cpu_count())
    model = ResNet34FPNCenterNet().eval()
    x = torch.randn(batch_size, 3, 512, 512)
    with torch.no_grad():
        for _ in range(warmup):
            hm, bx = model(x)
            decode(hm, bx)
        t0 = time.perf_counter()
        for _ in range(iters):
            hm, bx = model(x)
            decode(hm, bx)
        dt = time.perf_counter() - t0
    return batch_size * iters / dt


def get_baseline(force=False):
    if not force and os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    ips = measure()
    result = {"torch_cpu_images_per_sec": ips, "shape": "1x3x512x512",
              "model": "resnet34-fpn256-centernet", "threads": os.cpu_count()}
    with open(CACHE, "w") as f:
        json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    print(json.dumps(get_baseline(force=True)))
