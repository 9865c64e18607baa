"""Decode parity vs a torch-CPU oracle transcribing the reference decode
(centernet.py:229-304): structure (indices/labels) exact, values tight-tol."""
import numpy as np
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.ops import decode as D


def torch_oracle_decode(heatmap_nchw, box_nchw, k, nms_kernel, box_log, box_mult, stride):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    heatmap = torch.from_numpy(heatmap_nchw)
    box_offsets = torch.from_numpy(box_nchw)
    batch_size = heatmap.shape[0]

    padding = (nms_kernel - 1) // 2
    nms_mask = F.max_pool2d(heatmap, kernel_size=nms_kernel, stride=1, padding=padding) == heatmap
    heatmap = heatmap * nms_mask
    heatmap, labels = torch.max(heatmap, dim=1)
    heatmap = heatmap.view(batch_size, -1)
    labels = labels.view(batch_size, -1)
    scores, indices = torch.topk(heatmap, k)
    labels = torch.gather(labels, dim=-1, index=indices)

    out_h, out_w = box_offsets.shape[-2:]
    cx = torch.remainder(indices, out_w) + 0.5
    cy = torch.div(indices, out_w, rounding_mode="floor") + 0.5
    box_offsets = box_offsets.flatten(start_dim=-2)
    if box_log:
        box_offsets = torch.exp(box_offsets)
    box_offsets = (box_offsets * box_mult).clamp_min(0)
    x1 = cx - torch.gather(box_offsets[..., 0, :], dim=-1, index=indices)
    y1 = cy - torch.gather(box_offsets[..., 1, :], dim=-1, index=indices)
    x2 = cx + torch.gather(box_offsets[..., 2, :], dim=-1, index=indices)
    y2 = cy + torch.gather(box_offsets[..., 3, :], dim=-1, index=indices)
    boxes = torch.stack((x1, y1, x2, y2), dim=-1) * stride
    return (
        scores.numpy(),
        indices.numpy(),
        labels.numpy(),
        boxes.numpy(),
    )


@pytest.mark.parametrize("box_log,box_mult", [(False, 1.0), (True, 16.0)])
def test_decode_matches_torch_oracle(rng, box_log, box_mult):
    N, H, W, C, k = 2, 32, 40, 6, 50
    # well-separated scores make top-k tie-break irrelevant
    heatmap = rng.uniform(0, 1, size=(N, C, H, W)).astype(np.float32)
    box = rng.normal(size=(N, 4, H, W)).astype(np.float32)

    e_scores, e_idx, e_labels, e_boxes = torch_oracle_decode(
        heatmap, box, k, 3, box_log, box_mult, stride=4
    )

    out = D.decode_detections(
        jnp.asarray(heatmap.transpose(0, 2, 3, 1)),
        jnp.asarray(box.transpose(0, 2, 3, 1)),
        num_detections=k,
        nms_kernel=3,
        box_log=box_log,
        box_multiplier=box_mult,
        stride=4,
    )
    np.testing.assert_array_equal(np.asarray(out["labels"]), e_labels)
    np.testing.assert_allclose(np.asarray(out["scores"]), e_scores, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["boxes"]), e_boxes, rtol=1e-4, atol=1e-4)


def test_decode_finds_planted_peaks():
    """Synthetic heatmap with known peaks -> exact recovery."""
    N, H, W, C = 1, 64, 64, 3
    heatmap = np.zeros((N, H, W, C), dtype=np.float32)
    peaks = [(10, 20, 0, 0.9), (40, 50, 2, 0.8), (33, 7, 1, 0.7)]
    for y, x, c, s in peaks:
        heatmap[0, y, x, c] = s
        # surrounding lower blob that pseudo-NMS must suppress
        heatmap[0, y + 1, x, c] = s * 0.5
        heatmap[0, y, x + 1, c] = s * 0.5

    box = np.zeros((N, H, W, 4), dtype=np.float32)
    for y, x, c, s in peaks:
        box[0, y, x] = [2.0, 3.0, 4.0, 5.0]  # l, t, r, b

    out = D.decode_detections(
        jnp.asarray(heatmap), jnp.asarray(box), num_detections=5, stride=4
    )
    scores = np.asarray(out["scores"])[0]
    labels = np.asarray(out["labels"])[0]
    boxes = np.asarray(out["boxes"])[0]

    np.testing.assert_allclose(scores[:3], [0.9, 0.8, 0.7], atol=1e-6)
    assert labels[:3].tolist() == [0, 2, 1]
    for i, (y, x, c, s) in enumerate(peaks):
        cx, cy = x + 0.5, y + 0.5
        np.testing.assert_allclose(
            boxes[i], np.array([cx - 2, cy - 3, cx + 4, cy + 5]) * 4, atol=1e-5
        )


def test_gather_at_indices(rng):
    N, H, W, E = 2, 8, 8, 16
    feats = rng.normal(size=(N, H, W, E)).astype(np.float32)
    idx = rng.integers(0, H * W, size=(N, 5)).astype(np.int32)
    out = np.asarray(D.gather_at_indices(jnp.asarray(feats), jnp.asarray(idx)))
    flat = feats.reshape(N, H * W, E)
    for n in range(N):
        np.testing.assert_array_equal(out[n], flat[n, idx[n]])


def test_normalized_boxes(rng):
    N, H, W = 1, 16, 20
    box = rng.normal(size=(N, H, W, 4)).astype(np.float32)
    idx = jnp.asarray([[5, 37]], dtype=jnp.int32)
    normed = np.asarray(
        D.gather_and_decode_boxes(jnp.asarray(box), idx, normalize_boxes=True)
    )
    scaled = np.asarray(
        D.gather_and_decode_boxes(jnp.asarray(box), idx, stride=4)
    )
    np.testing.assert_allclose(
        normed * np.array([W, H, W, H]) * 4, scaled, rtol=1e-5, atol=1e-5
    )


def test_decode_golden_regression():
    """Pinned decode outputs (fixed inputs) guard numerical regressions —
    the practical form of the 'bitwise-comparable' output contract."""
    import os

    import jax.numpy as jnp

    data = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                "decode_golden.npz"))
    out = D.decode_detections(
        jnp.asarray(data["heatmap"]), jnp.asarray(data["box"]),
        num_detections=25, box_log=True, box_multiplier=16.0, stride=4,
    )
    np.testing.assert_array_equal(np.asarray(out["labels"]), data["labels"])
    np.testing.assert_allclose(np.asarray(out["scores"]), data["scores"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["boxes"]), data["boxes"],
                               rtol=1e-5, atol=1e-5)


def test_decode_detections_auto_pseudo_nms_false():
    """Regression: pseudo_nms=False must reach the decoder (not TypeError,
    not silently re-enabled) — scores then keep non-peak pixels."""
    import jax
    import numpy as np

    from centernet_lightning_tpu.ops.decode import (
        decode_detections, decode_detections_auto,
    )

    rng = np.random.default_rng(0)
    hm = jax.nn.sigmoid(jnp.asarray(
        rng.normal(size=(1, 16, 16, 2)).astype(np.float32)))
    off = jnp.abs(jnp.asarray(rng.normal(size=(1, 16, 16, 4), scale=2.0)
                              .astype(np.float32)))
    with_nms = decode_detections_auto(hm, off, num_detections=20)
    without = decode_detections_auto(hm, off, num_detections=20,
                                     pseudo_nms=False)
    direct = decode_detections(hm, off, num_detections=20, pseudo_nms=False)
    np.testing.assert_allclose(np.asarray(without["scores"]),
                               np.asarray(direct["scores"]))
    # unsuppressed top-k keeps neighboring pixels: score sum is >= the
    # suppressed one and the sets differ on dense random maps
    assert float(jnp.sum(without["scores"])) >= float(jnp.sum(with_nms["scores"]))
    assert not np.array_equal(np.asarray(without["scores"]),
                              np.asarray(with_nms["scores"]))
