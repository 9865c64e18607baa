"""Gen-A feature closures from the round-4 config-fidelity pass:
frozen_stages (reference configs/mot_tracking.yaml:7), the SimpleNeck
deconv/skip knobs (reference configs/test_config.yaml:9-18), FPN
weighted_fusion / progressive upsample_channels (reference
configs/base_resnet34_fpn.yaml:7-12), backbone input_channels, and
mid-epoch validation (Lightning val_check_interval semantics, named by
every Gen-A reference config)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_lightning_tpu.models.backbones import build_backbone
from centernet_lightning_tpu.models.necks import FPN, SimpleNeck, build_neck


def _leaf_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


# ---------------------------------------------------------------------------
# frozen_stages
# ---------------------------------------------------------------------------

def test_frozen_stages_freezes_bn_stats_and_gradients():
    """frozen_stages=2: stem+layer1+layer2 BatchNorms run on running stats
    (no batch_stats mutation) and receive zero gradients; layer3/4 train
    normally. Matches torch `.eval()` freeze semantics (reference
    configs/mot_tracking.yaml:7 uses frozen_stages: 4 for finetuning)."""
    bb = build_backbone("resnet18", width=8, frozen_stages=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 3))
    variables = jax.jit(lambda r, x: bb.init(r, x, train=True))(rng, x)

    def loss_fn(params):
        feats, mutated = bb.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(f ** 2) for f in feats), mutated["batch_stats"]

    grads, new_bs = jax.jit(jax.grad(loss_fn, has_aux=True))(
        variables["params"])

    frozen = [k for k in variables["params"]
              if k.startswith(("stem", "layer1", "layer2"))]
    live = [k for k in variables["params"]
            if k.startswith(("layer3", "layer4"))]
    assert frozen and live
    for k in frozen:
        assert all(np.allclose(np.asarray(g), 0.0)
                   for g in jax.tree_util.tree_leaves(grads[k])), k
        # BN stats untouched for frozen stages
        if k in variables["batch_stats"]:
            assert _leaf_equal(new_bs[k], variables["batch_stats"][k]), k
    assert any(
        np.abs(np.asarray(g)).max() > 0
        for k in live for g in jax.tree_util.tree_leaves(grads[k]))
    # live stages DO update their BN stats
    changed = [k for k in live if k in new_bs
               and not _leaf_equal(new_bs[k], variables["batch_stats"][k])]
    assert changed


def test_frozen_stages_whole_backbone_non_stage_named():
    """Backbones without layerN naming freeze wholesale at k>=4 via the
    optimizer mask."""
    from centernet_lightning_tpu.train.optim import _is_frozen_param

    class K:
        def __init__(self, key):
            self.key = key

    assert _is_frozen_param((K("backbone"), K("blocks_3"), K("conv")), 4)
    assert not _is_frozen_param((K("backbone"), K("blocks_3"), K("conv")), 2)
    assert not _is_frozen_param((K("neck"), K("conv")), 4)
    assert _is_frozen_param((K("backbone"), K("layer2_block0"), K("c")), 2)
    assert not _is_frozen_param((K("backbone"), K("layer3_block0"), K("c")), 2)


# ---------------------------------------------------------------------------
# neck options
# ---------------------------------------------------------------------------

PYRAMID = [jnp.ones((1, 16 // (2 ** i), 16 // (2 ** i), 4 * (2 ** i)))
           for i in range(4)]  # strides 4..32 of a 64px input


def _init_apply(neck):
    variables = neck.init(jax.random.PRNGKey(0), PYRAMID, train=True)
    out = neck.apply(variables, PYRAMID, train=False)
    return variables, out


def test_simple_neck_deconv_and_skip():
    neck = SimpleNeck(in_channels=(4, 8, 16, 32),
                      upsample_channels=(16, 8, 8),
                      upsample_type="conv_transpose",
                      deconv_kernel=3, deconv_init_bilinear=True,
                      skip_kernel=3)
    variables, out = _init_apply(neck)
    assert out.shape == (1, 16, 16, 8)  # stride 32 -> 4
    # the transpose-conv kernels are 3x3 (deconv_kernel)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    deconv = [(p, v) for p, v in flat
              if "ConvTranspose" in "/".join(str(k) for k in p)]
    assert deconv and all(v.shape[:2] == (3, 3) for _, v in deconv)
    # skip laterals exist (one extra ConvNormAct per step with a valid level)
    no_skip = SimpleNeck(in_channels=(4, 8, 16, 32),
                         upsample_channels=(16, 8, 8))
    n_skip = len(jax.tree_util.tree_leaves(variables["params"]))
    n_plain = len(jax.tree_util.tree_leaves(
        no_skip.init(jax.random.PRNGKey(0), PYRAMID, train=True)["params"]))
    assert n_skip > n_plain


def test_fpn_weighted_fusion():
    neck = FPN(in_channels=(4, 8, 16, 32), out_channels=16, weighted=True)
    variables, out = _init_apply(neck)
    assert out.shape == (1, 16, 16, 16)
    # learned fusion weights present (Fuse nodes)
    names = {str(k) for p in
             jax.tree_util.tree_leaves_with_path(variables["params"])
             for k in p[0]}
    assert any("Fuse" in n for n in names)


def test_fpn_progressive_upsample_channels():
    """The Gen-A fpn spelling with upsample_channels [256,128,64]
    (reference configs/base_resnet34_fpn.yaml:9) emits the last width and
    keeps out_channels truthful."""
    neck = build_neck("fpn", (4, 8, 16, 32),
                      upsample_channels=[16, 8, 4])
    assert neck.out_channels == 4
    variables, out = _init_apply(neck)
    assert out.shape == (1, 16, 16, 4)


def test_input_channels_init():
    from centernet_lightning_tpu.models.centernet import CenterNet

    task = CenterNet(num_classes=2, backbone="resnet18",
                     neck="SimpleNeck",
                     neck_config={"upsample_channels": [8, 8, 8]},
                     head_config={"width": 8, "depth": 1},
                     input_channels=1, image_size=(32, 32))
    variables = task.init(jax.random.PRNGKey(0))
    out = task.apply(variables, jnp.zeros((1, 32, 32, 1)))
    assert out["heatmap"].shape == (1, 8, 8, 2)


# ---------------------------------------------------------------------------
# mid-epoch validation (Lightning val_check_interval)
# ---------------------------------------------------------------------------

class _TinyLoader:
    """8 fixed synthetic batches per epoch."""

    batch_size = 2

    def __init__(self, n=8):
        self.n = n
        rng = np.random.default_rng(0)
        self.batches = []
        for _ in range(n):
            self.batches.append({
                "image": rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
                "boxes": np.tile(np.array([[4, 4, 12, 12]], np.float32),
                                 (2, 4, 1)),
                "labels": np.zeros((2, 4), np.int64),
                "mask": np.ones((2, 4), np.float32),
            })

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter(self.batches)


def _tiny_task():
    from centernet_lightning_tpu.models.centernet import CenterNet

    return CenterNet(num_classes=1, backbone="resnet18",
                     backbone_config={"width": 8},
                     neck="SimpleNeck",
                     neck_config={"upsample_channels": [8, 8, 8]},
                     head_config={"width": 8, "depth": 1},
                     num_detections=4, image_size=(32, 32))


@pytest.mark.parametrize("vci,expected", [(0.5, 2), (0.25, 4), (3, 2)])
def test_val_check_interval_drives_mid_epoch_validation(tmp_path, vci,
                                                        expected):
    """val_check_interval=0.5 validates twice inside ONE epoch (Lightning
    semantics: every int(batches*frac) batches on a per-epoch counter; an
    int > 1 means every N batches). Named by every Gen-A reference config
    (e.g. reference configs/base_resnet34.yaml:90)."""
    from centernet_lightning_tpu.train.trainer import Trainer

    task = _tiny_task()
    loader = _TinyLoader(8)
    trainer = Trainer(task, train_loader=loader, val_loader=loader,
                      max_epochs=1, image_size=(32, 32),
                      ckpt_dir=str(tmp_path / "ckpt"),
                      log_dir=str(tmp_path / "logs"),
                      val_check_interval=vci, monitor="val/mAP",
                      optimizer_config={"optimizer": "Adam", "lr": 1e-3,
                                        "warmup_epochs": 0},
                      diagnostics=False)
    calls = []
    trainer.validate = lambda: (calls.append(1),
                                {"val/mAP": float(len(calls))})[1]
    trainer.fit()
    assert len(calls) == expected
    # best-checkpoint logic ran on the improving metric
    assert trainer.best_metric == float(expected)


def test_val_check_interval_one_means_epoch_boundary(tmp_path):
    from centernet_lightning_tpu.train.trainer import Trainer

    task = _tiny_task()
    loader = _TinyLoader(4)
    trainer = Trainer(task, train_loader=loader, val_loader=loader,
                      max_epochs=2, image_size=(32, 32),
                      ckpt_dir=None, log_dir=str(tmp_path / "logs"),
                      val_check_interval=1.0,
                      optimizer_config={"optimizer": "Adam", "lr": 1e-3,
                                        "warmup_epochs": 0},
                      diagnostics=False)
    assert trainer.val_check_steps is None
    calls = []
    trainer.validate = lambda: (calls.append(1), {"val/mAP": 0.0})[1]
    trainer.fit()
    assert len(calls) == 2  # once per epoch


def test_val_check_interval_exceeding_epoch_raises(tmp_path):
    """An int val_check_interval larger than the epoch would NEVER fire
    (the per-epoch batch counter resets), silently disabling validation —
    Lightning raises a ValueError here and so do we."""
    from centernet_lightning_tpu.train.trainer import Trainer

    task = _tiny_task()
    loader = _TinyLoader(4)
    with pytest.raises(ValueError, match="val_check_interval"):
        Trainer(task, train_loader=loader, val_loader=loader,
                max_epochs=1, image_size=(32, 32),
                ckpt_dir=None, log_dir=str(tmp_path / "logs"),
                val_check_interval=500,
                optimizer_config={"optimizer": "Adam", "lr": 1e-3,
                                  "warmup_epochs": 0},
                diagnostics=False)


def test_val_check_interval_composes_with_epoch_cadence(tmp_path):
    """check_val_every_n_epoch gates WHICH epochs validate;
    val_check_interval the cadence WITHIN them (Lightning composition):
    every-2-epochs + 0.5/epoch over 2 epochs = 2 validations, both in
    epoch 2."""
    from centernet_lightning_tpu.train.trainer import Trainer

    task = _tiny_task()
    loader = _TinyLoader(8)
    trainer = Trainer(task, train_loader=loader, val_loader=loader,
                      max_epochs=2, image_size=(32, 32),
                      ckpt_dir=None, log_dir=str(tmp_path / "logs"),
                      val_interval=2, val_check_interval=0.5,
                      optimizer_config={"optimizer": "Adam", "lr": 1e-3,
                                        "warmup_epochs": 0},
                      diagnostics=False)
    calls = []
    trainer.validate = lambda: (calls.append(int(trainer.state.step)),
                                {"val/mAP": 0.0})[1]
    trainer.fit()
    # none in epoch 1 (steps 1-8), two in epoch 2 (steps 9-16)
    assert len(calls) == 2 and all(s > 8 for s in calls)


# ---------------------------------------------------------------------------
# Fuse projection parity + build_neck width precedence
# ---------------------------------------------------------------------------

def test_fuse_skips_projection_when_channels_match():
    """The reference only creates a 1x1 projection when the input width
    differs (reference models/layers.py:150 `if in_c != out`); a
    matching-width input must flow through unprojected so converted torch
    checkpoints pair structurally."""
    from centernet_lightning_tpu.models.layers import Fuse

    x16 = jnp.ones((1, 8, 8, 16))
    y16 = jnp.ones((1, 4, 4, 16))
    y8 = jnp.ones((1, 4, 4, 8))

    def n_projections(inputs):
        v = Fuse(16).init(jax.random.PRNGKey(0), inputs, train=True)
        return sum("ConvNormAct" in "/".join(str(k) for k in p)
                   for p, _ in
                   jax.tree_util.tree_leaves_with_path(v["params"])
                   ) // 4  # kernel+bias+scale+bias per ConvNormAct

    assert n_projections([x16, y16]) == 0
    assert n_projections([x16, y8]) == 1


def test_weighted_fpn_single_projection_per_lateral():
    """weighted FPN laterals are projected ONCE (in the lateral conv);
    Fuse must not re-project the already-width-matched inputs — the
    round-3 double projection inflated the weighted arm's capacity vs the
    reference Fuse node."""
    plain = FPN(in_channels=(4, 8, 16, 32), out_channels=16, weighted=False)
    weighted = FPN(in_channels=(4, 8, 16, 32), out_channels=16, weighted=True)
    n_plain = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(
        plain.init(jax.random.PRNGKey(0), PYRAMID, train=True)["params"]))
    n_weighted = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(
        weighted.init(jax.random.PRNGKey(0), PYRAMID, train=True)["params"]))
    # weighted adds ONLY the per-node fusion weight vectors (2 floats per
    # Fuse node x 3 nodes) over the unweighted path
    assert n_weighted == n_plain + 2 * 3


def test_build_neck_explicit_out_channels_wins():
    """An explicitly configured out_channels must not be silently
    overwritten by upsample_channels for the single-width necks."""
    neck = build_neck("bifpn", (4, 8, 16, 32), out_channels=16,
                      upsample_channels=[32, 16, 8])
    assert neck.out_channels == 16
    neck = build_neck("ida", (4, 8, 16, 32), out_channels=16,
                      upsample_channels=[32, 16, 8])
    assert neck.out_channels == 16
    # default still comes from upsample_channels[-1] when not set
    neck = build_neck("bifpn", (4, 8, 16, 32), upsample_channels=[32, 16, 8])
    assert neck.out_channels == 8
