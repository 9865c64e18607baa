"""Target-rendering invariants + exact parity with a numpy oracle that
reproduces the reference per-box loop (centernet.py:123-200) literally."""
import itertools
import math

import numpy as np
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.ops import targets as T


# ---------------------------------------------------------------------------
# numpy oracle: literal transcription of the reference algorithm
# ---------------------------------------------------------------------------

def oracle_radius(name, w, h):
    if name == "fixed":
        return 1.0, 1.0
    if name == "ttfnet":
        return w / 2 * 0.54, h / 2 * 0.54
    # cornernet, min_overlap=0.3
    mo = 0.3
    b1 = h + w
    c1 = w * h * (1 - mo) / (1 + mo)
    r1 = (b1 - math.sqrt(b1 ** 2 - 4 * c1)) / 2
    b2 = 2 * (h + w)
    c2 = (1 - mo) * w * h
    r2 = (b2 - math.sqrt(b2 ** 2 - 16 * c2)) / 8
    a3 = 4 * mo
    b3 = -2 * mo * (h + w)
    c3 = (mo - 1) * w * h
    r3 = (b3 + math.sqrt(b3 ** 2 - 4 * a3 * c3)) / (2 * a3)
    r = min(r1, r2, r3)
    return r, r


def oracle_heatmap(boxes, labels, num_classes, out_h, out_w, stride, radius_name):
    heatmap = np.zeros((num_classes, out_h, out_w), dtype=np.float32)
    fm = np.asarray(boxes, dtype=np.float64) / stride
    centers = fm[:, :2] + fm[:, 2:] / 2
    centers = np.round(centers).astype(int)
    eps = np.finfo(np.float32).eps
    for (x, y, w, h), (cx, cy), label in zip(fm, centers, labels):
        rx, ry = oracle_radius(radius_name, w, h)
        rx, ry = max(0, round(rx)), max(0, round(ry))
        std_x, std_y = rx / 3 + 1 / 6, ry / 3 + 1 / 6
        l, t = min(cx, rx), min(cy, ry)
        r, b = min(out_w - cx, rx + 1), min(out_h - cy, ry + 1)
        gy = np.arange(-ry, ry + 1).reshape(-1, 1)
        gx = np.arange(-rx, rx + 1).reshape(1, -1)
        g = np.exp(-(gx ** 2 / (2 * std_x ** 2) + gy ** 2 / (2 * std_y ** 2))).astype(
            np.float32
        )
        g[g < eps * g.max()] = 0
        if r <= -l or b <= -t:  # window entirely off-map
            continue
        masked = heatmap[label, cy - t : cy + b, cx - l : cx + r]
        np.maximum(masked, g[ry - t : ry + b, rx - l : rx + r], out=masked)
    return heatmap.transpose(1, 2, 0)


def make_batch(rng, n=2, k=12, img=256):
    boxes = np.zeros((n, k, 4), dtype=np.float32)
    labels = np.zeros((n, k), dtype=np.int32)
    mask = np.zeros((n, k), dtype=np.float32)
    for i in range(n):
        num = rng.integers(1, k + 1)
        xy = rng.uniform(0, img * 0.7, size=(num, 2))
        wh = rng.uniform(4, img * 0.3, size=(num, 2))
        wh = np.minimum(wh, img - xy)  # clip to image like the datasets do
        boxes[i, :num] = np.concatenate([xy, wh], axis=-1)
        labels[i, :num] = rng.integers(0, 5, size=num)
        mask[i, :num] = 1
    return boxes, labels, mask


@pytest.mark.parametrize("radius_name", ["fixed", "ttfnet", "cornernet"])
def test_render_heatmap_matches_reference_oracle(rng, radius_name):
    stride, img, C = 4, 256, 5
    H = W = img // stride
    boxes, labels, mask = make_batch(rng)
    out = np.asarray(
        T.render_heatmap(
            jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask),
            C, H, W, stride, T.get_radius_fn(radius_name),
        )
    )
    for i in range(boxes.shape[0]):
        valid = mask[i].astype(bool)
        expected = oracle_heatmap(
            boxes[i][valid], labels[i][valid], C, H, W, stride, radius_name
        )
        np.testing.assert_allclose(out[i], expected, rtol=1e-5, atol=1e-6)


def test_render_heatmap_peak_is_one(rng):
    """Exact 1.0 at every in-bounds GT center (reference tests/test_heads.py:46-64)."""
    stride, img, C = 4, 256, 5
    H = W = img // stride
    boxes, labels, mask = make_batch(rng)
    out = np.asarray(
        T.render_heatmap(
            jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask),
            C, H, W, stride, T.get_radius_fn("cornernet"),
        )
    )
    assert out.min() >= 0.0 and out.max() <= 1.0
    for i in range(boxes.shape[0]):
        for b, l, m in zip(boxes[i], labels[i], mask[i]):
            if not m:
                continue
            c = np.round(b[:2] / stride + b[2:] / (2 * stride)).astype(int)
            if 0 <= c[0] < W and 0 <= c[1] < H:
                assert out[i, c[1], c[0], l] == pytest.approx(1.0)
    # padded-only image renders empty
    empty = np.asarray(
        T.render_heatmap(
            jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4)), C, H, W, stride, T.get_radius_fn("cornernet"),
        )
    )
    assert empty.sum() == 0.0


def test_center_sample_indices_matches_reference_loop(rng):
    stride, img = 4, 256
    H = W = img // stride
    boxes, labels, mask = make_batch(rng)
    idx, smask, tgt = map(
        np.asarray,
        T.center_sample_indices(jnp.asarray(boxes), jnp.asarray(mask), H, W, stride),
    )

    for i in range(boxes.shape[0]):
        # oracle: reference centernet.py:149-160
        exp_indices, exp_boxes = [], []
        for (x, y, w, h), m in zip(boxes[i], mask[i]):
            if not m:
                continue
            fm = np.array([x, y, w, h]) / stride
            cx, cy = np.round(fm[:2] + fm[2:] / 2).astype(int)
            cxs = [d for d in [cx - 1, cx, cx + 1] if 0 <= d <= W - 1]
            cys = [d for d in [cy - 1, cy, cy + 1] if 0 <= d <= H - 1]
            for ccx, ccy in itertools.product(cxs, cys):
                exp_indices.append(ccy * W + ccx)
                exp_boxes.append([x, y, x + w, y + h])

        got_indices = idx[i][smask[i] > 0]
        got_boxes = tgt[i][smask[i] > 0]
        assert sorted(got_indices.tolist()) == sorted(exp_indices)
        # match (index, box) multisets
        got = sorted(zip(got_indices.tolist(), got_boxes.tolist()))
        exp = sorted(zip(exp_indices, [list(map(float, b)) for b in exp_boxes]))
        for (gi, gb), (ei, eb) in zip(got, exp):
            assert gi == ei
            np.testing.assert_allclose(gb, eb, rtol=1e-5)


def test_center_sample_indices_size1_is_exact_center(rng):
    """sample_size=1 regresses only at the rounded center (the reference's
    pre-center-sampling recipe, docs/experiments.md rows (1)-(2))."""
    stride, img = 4, 256
    H = W = img // stride
    boxes, labels, mask = make_batch(rng)
    idx, smask, tgt = map(
        np.asarray,
        T.center_sample_indices(
            jnp.asarray(boxes), jnp.asarray(mask), H, W, stride, sample_size=1
        ),
    )
    assert idx.shape == (boxes.shape[0], boxes.shape[1])
    for i in range(boxes.shape[0]):
        for k, ((x, y, w, h), m) in enumerate(zip(boxes[i], mask[i])):
            cx, cy = np.round(
                np.array([x, y]) / stride + np.array([w, h]) / (2 * stride)
            ).astype(int)
            inb = 0 <= cx <= W - 1 and 0 <= cy <= H - 1
            assert smask[i, k] == float(bool(m) and inb)
            if m and inb:
                assert idx[i, k] == cy * W + cx
                np.testing.assert_allclose(tgt[i, k], [x, y, x + w, y + h],
                                           rtol=1e-5)

    with pytest.raises(ValueError):
        T.center_sample_indices(
            jnp.asarray(boxes), jnp.asarray(mask), H, W, stride, sample_size=2
        )


def test_cornernet_radius_vectorized_matches_scalar(rng):
    w = rng.uniform(1, 50, size=32).astype(np.float32)
    h = rng.uniform(1, 50, size=32).astype(np.float32)
    rx, ry = T.cornernet_radius(jnp.asarray(w), jnp.asarray(h))
    for i in range(32):
        er, _ = oracle_radius("cornernet", float(w[i]), float(h[i]))
        assert float(rx[i]) == pytest.approx(er, rel=1e-4)
        assert float(ry[i]) == pytest.approx(er, rel=1e-4)
