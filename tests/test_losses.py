"""Loss contracts: analytic cases from the reference test-suite intent
(reference tests/test_losses.py) plus parity against torch-CPU oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.ops import losses


def make_boxes(rng, n=16):
    xy = rng.uniform(0, 50, size=(n, 2))
    wh = rng.uniform(1, 50, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


IOU_LOSSES = {
    "iou": losses.iou_loss,
    "giou": losses.giou_loss,
    "diou": losses.diou_loss,
    "ciou": losses.ciou_loss,
}


@pytest.mark.parametrize("name", list(IOU_LOSSES))
def test_iou_losses_shapes_and_selfloss(rng, name):
    fn = IOU_LOSSES[name]
    b1, b2 = make_boxes(rng), make_boxes(rng)
    out = fn(jnp.asarray(b1), jnp.asarray(b2))
    assert out.shape == (16, 1)  # keepdim contract matches L1 shape
    # loss(box, box) ~ 0
    self_loss = fn(jnp.asarray(b1), jnp.asarray(b1))
    np.testing.assert_allclose(np.asarray(self_loss), 0.0, atol=1e-5)


@pytest.mark.parametrize("name", list(IOU_LOSSES))
def test_iou_losses_commutative(rng, name):
    fn = IOU_LOSSES[name]
    b1, b2 = make_boxes(rng), make_boxes(rng)
    ab = np.asarray(fn(jnp.asarray(b1), jnp.asarray(b2)))
    ba = np.asarray(fn(jnp.asarray(b2), jnp.asarray(b1)))
    np.testing.assert_allclose(ab, ba, rtol=1e-5, atol=1e-6)


def test_iou_analytic_cases():
    # disjoint boxes: IoU loss = 1, GIoU loss > 1
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 2.0, 3.0, 3.0]])
    np.testing.assert_allclose(np.asarray(losses.iou_loss(a, b))[0, 0], 1.0, atol=1e-6)
    assert float(losses.giou_loss(a, b)[0, 0]) > 1.0

    # containment 1/10000
    big = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    small = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(losses.iou_loss(big, small))[0, 0], 1 - 1e-4, atol=1e-6
    )

    # hand-computed GIoU: boxes [0,0,2,2] and [1,1,3,3]
    # inter=1, union=7, iou=1/7; enclosing=9; giou = 1/7 - (1 - 7/9)
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    expected = 1 - (1 / 7 - (1 - 7 / 9))
    np.testing.assert_allclose(
        np.asarray(losses.giou_loss(a, b))[0, 0], expected, rtol=1e-5
    )


def test_iou_vs_torchvision_oracle(rng):
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    from torchvision.ops import box_iou, generalized_box_iou

    b1, b2 = make_boxes(rng), make_boxes(rng)
    iou_ours = 1.0 - np.asarray(losses.iou_loss(jnp.asarray(b1), jnp.asarray(b2)))[:, 0]
    iou_tv = box_iou(torch.from_numpy(b1), torch.from_numpy(b2)).diagonal().numpy()
    np.testing.assert_allclose(iou_ours, iou_tv, rtol=1e-4, atol=1e-5)

    giou_ours = 1.0 - np.asarray(losses.giou_loss(jnp.asarray(b1), jnp.asarray(b2)))[:, 0]
    giou_tv = (
        generalized_box_iou(torch.from_numpy(b1), torch.from_numpy(b2))
        .diagonal()
        .numpy()
    )
    np.testing.assert_allclose(giou_ours, giou_tv, rtol=1e-4, atol=1e-5)


def test_cornernet_focal_loss_vs_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    targets = rng.uniform(0, 1, size=(2, 8, 8, 5)).astype(np.float32)
    targets[0, 0, 0, 0] = 1.0  # at least one positive

    ours = np.asarray(losses.cornernet_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))

    t_in = torch.from_numpy(logits)
    t_tg = torch.from_numpy(targets)
    pos_w = t_tg.eq(1).float()
    neg_w = torch.pow(1 - t_tg, 4)
    probs = torch.sigmoid(t_in)
    pos = -torch.pow(1 - probs, 2) * F.logsigmoid(t_in) * pos_w
    neg = -torch.pow(probs, 2) * F.logsigmoid(-t_in) * neg_w
    oracle = (pos + neg).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-5)


def test_quality_focal_loss_vs_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    targets = rng.uniform(0, 1, size=(2, 8, 8, 5)).astype(np.float32)

    ours = np.asarray(losses.quality_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    t_in = torch.from_numpy(logits)
    t_tg = torch.from_numpy(targets)
    ce = F.binary_cross_entropy_with_logits(t_in, t_tg, reduction="none")
    oracle = (torch.pow(torch.abs(t_tg - torch.sigmoid(t_in)), 2) * ce).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-5)


def test_smooth_l1_vs_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    a = rng.normal(size=(32, 4)).astype(np.float32)
    b = rng.normal(size=(32, 4)).astype(np.float32)
    ours = np.asarray(losses.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
    oracle = F.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_reduce_loss_masking():
    loss = jnp.ones((2, 4))
    weights = jnp.array([[1, 1, 0, 0], [1, 0, 0, 0]], dtype=jnp.float32)
    assert float(losses.reduce_loss(loss, "sum", weights)) == 3.0
    assert float(losses.reduce_loss(loss, "mean", weights)) == 1.0
    assert float(losses.reduce_loss(loss, "sum", weights, norm=jnp.asarray(3.0))) == 1.0


def test_registry_names():
    assert losses.get_heatmap_loss("CornerNetFocalLoss") is losses.cornernet_focal_loss
    assert losses.get_box_loss("GIoULoss") is losses.giou_loss
    assert losses.get_box_loss("giou") is losses.giou_loss
