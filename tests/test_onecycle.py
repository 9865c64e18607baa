"""OneCycleLR schedule (Gen-A `lr_scheduler` config surface) and the Cutout
transform — the two names from the reference configs that were still
unimplemented (reference configs/base_resnet34.yaml:33-36,
configs/mot_tracking.yaml:78-82).

The schedule is oracle-tested step-for-step against
torch.optim.lr_scheduler.OneCycleLR (torch CPU is in-env).
"""
import numpy as np
import pytest

from centernet_lightning_tpu.train.optim import (
    make_onecycle_schedule,
    make_optimizer,
    resolve_schedule,
    schedule_from_config,
)


def _torch_onecycle_lrs(total_steps, **kwargs):
    torch = pytest.importorskip("torch")

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=1.0)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, total_steps=total_steps, **kwargs
    )
    lrs = []
    for _ in range(total_steps):
        lrs.append(sch.get_last_lr()[0])
        opt.step()
        sch.step()
    return np.asarray(lrs)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"max_lr": 0.02},  # the reference configs' exact usage
        {"max_lr": 0.1, "pct_start": 0.1, "div_factor": 10.0,
         "final_div_factor": 100.0},
    ],
)
def test_onecycle_matches_torch(kwargs):
    total = 60
    oracle = _torch_onecycle_lrs(total, **kwargs)
    sched = make_onecycle_schedule(total_steps=total, **kwargs)
    ours = np.asarray([sched(s) for s in range(total)])
    # schedule math runs in float32 (it is jitted on device): ~1e-5 rounding
    np.testing.assert_allclose(ours, oracle, rtol=3e-5)


def test_onecycle_jit_path_matches_host_path():
    import jax
    import jax.numpy as jnp

    sched = make_onecycle_schedule(max_lr=0.02, total_steps=40)
    jitted = jax.jit(sched)
    for s in (0, 5, 11, 12, 25, 39):
        assert np.isclose(float(jitted(jnp.asarray(s))), sched(s), rtol=1e-6)


def test_resolve_schedule_dispatch():
    # default / cosine name -> the live warmup+cosine path
    base = resolve_schedule(0.05, max_epochs=10, steps_per_epoch=10)
    named = resolve_schedule(0.05, 10, 10,
                             lr_scheduler={"name": "CosineAnnealingLR"})
    assert np.isclose(base(37), named(37))
    # OneCycleLR peaks at max_lr around pct_start of the run
    oc = resolve_schedule(0.05, 10, 10,
                          lr_scheduler={"name": "OneCycleLR",
                                        "params": {"max_lr": 0.02}})
    lrs = np.asarray([oc(s) for s in range(100)])
    assert np.isclose(lrs.max(), 0.02, rtol=1e-4)
    assert lrs.argmax() == 29  # pct_start*total - 1
    assert lrs[-1] < 1e-5
    with pytest.raises(KeyError):
        resolve_schedule(0.05, 10, 10, lr_scheduler={"name": "StepLR"})


def test_gen_a_config_carries_lr_scheduler():
    from centernet_lightning_tpu.train.config import normalize_config

    cfg = {
        "model": {
            "task": "detection",
            "backbone": {"name": "resnet18"},
            "neck": {"name": "fpn"},
            "output_heads": {
                "heatmap": {"num_classes": 2},
                "box_2d": {},
            },
            "optimizer": {"name": "SGD", "params": {"lr": 0.05}},
            "lr_scheduler": {"name": "OneCycleLR", "params": {"max_lr": 0.02}},
        }
    }
    norm = normalize_config(cfg)
    opt_cfg = norm["model"]["optimizer_config"]
    assert opt_cfg["lr_scheduler"] == {"name": "OneCycleLR",
                                       "params": {"max_lr": 0.02}}
    # the logging schedule honors it (peak = max_lr, not base lr)
    sched = schedule_from_config(opt_cfg, max_epochs=10, steps_per_epoch=10)
    lrs = [sched(s) for s in range(100)]
    assert np.isclose(max(lrs), 0.02, rtol=1e-4)
    # and the optimizer factory accepts the key
    import jax.numpy as jnp

    params = {"w": jnp.zeros((2, 2))}
    tx = make_optimizer(params, max_epochs=10, steps_per_epoch=10, **opt_cfg)
    tx.init(params)


def _torch_onecycle_momentums(total_steps, **kwargs):
    torch = pytest.importorskip("torch")

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=1.0, momentum=0.9)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, total_steps=total_steps, **kwargs
    )
    moms = []
    for _ in range(total_steps):
        moms.append(opt.param_groups[0]["momentum"])
        opt.step()
        sch.step()
    return np.asarray(moms)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"max_lr": 0.02},  # torch defaults: 0.95 -> 0.85 -> 0.95, cos
        {"max_lr": 0.02, "base_momentum": 0.8, "max_momentum": 0.99,
         "pct_start": 0.1},
        {"max_lr": 0.02, "anneal_strategy": "linear"},
        {"max_lr": 0.02, "three_phase": True},
    ],
)
def test_onecycle_momentum_matches_torch(kwargs):
    """torch cycle_momentum=True companion curve, step-for-step
    (the reference Gen-A recipe is exactly SGD+OneCycleLR,
    reference configs/base_resnet34.yaml:26-36)."""
    from centernet_lightning_tpu.train.optim import (
        make_onecycle_momentum_schedule,
    )

    total = 60
    oracle = _torch_onecycle_momentums(total, **kwargs)
    mom_kwargs = {k: v for k, v in kwargs.items() if k != "max_lr"}
    sched = make_onecycle_momentum_schedule(total_steps=total, **mom_kwargs)
    ours = np.asarray([sched(s) for s in range(total)])
    np.testing.assert_allclose(ours, oracle, rtol=3e-5)


@pytest.mark.parametrize("three_phase", [False, True])
def test_onecycle_lr_three_phase_and_linear_match_torch(three_phase):
    total = 77
    kwargs = {"max_lr": 0.05, "anneal_strategy": "linear",
              "three_phase": three_phase, "pct_start": 0.25}
    oracle = _torch_onecycle_lrs(total, **kwargs)
    sched = make_onecycle_schedule(total_steps=total, **kwargs)
    ours = np.asarray([sched(s) for s in range(total)])
    # schedule math is f32 (jitted on device): rounding is relative to the
    # phase SPAN (max_lr), so the tiny final lr needs a span-relative atol
    np.testing.assert_allclose(ours, oracle, rtol=3e-5,
                               atol=kwargs["max_lr"] * 1e-6)


def test_sgd_onecycle_trajectory_matches_torch():
    """Full optimizer-dynamics parity: optax chain with injected cycled
    momentum reproduces torch SGD(momentum)+OneCycleLR weight trajectories
    on a quadratic, not just the hyperparameter curves."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import optax

    total = 50
    w = torch.nn.Parameter(torch.tensor([1.0, -2.0], dtype=torch.float64))
    opt = torch.optim.SGD([w], lr=0.1, momentum=0.9)
    sch = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=0.02,
                                              total_steps=total)
    torch_traj = []
    for _ in range(total):
        opt.zero_grad()
        (0.5 * (w ** 2).sum()).backward()
        opt.step()
        sch.step()
        torch_traj.append(w.detach().numpy().copy())

    params = {"w": jnp.asarray([1.0, -2.0])}
    tx = make_optimizer(
        params, optimizer="SGD", lr=0.02, weight_decay=0.0,
        norm_weight_decay=None, max_epochs=1, steps_per_epoch=total,
        lr_scheduler={"name": "OneCycleLR", "params": {"max_lr": 0.02}},
    )
    state = tx.init(params)
    ours_traj = []
    for _ in range(total):
        updates, state = tx.update({"w": params["w"]}, state, params)
        params = optax.apply_updates(params, updates)
        ours_traj.append(np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(ours_traj),
                               np.asarray(torch_traj), atol=1e-5)


def test_onecycle_momentum_disabled_and_adam_beta1():
    """cycle_momentum: false keeps constant momentum; Adam gets a cycled
    beta1 like torch (OneCycleLR use_beta1 path)."""
    from centernet_lightning_tpu.train.optim import resolve_schedules

    _, mom = resolve_schedules(
        0.02, 1, 100,
        lr_scheduler={"name": "OneCycleLR",
                      "params": {"max_lr": 0.02, "cycle_momentum": False}})
    assert mom is None
    lr_fn, mom_fn = resolve_schedules(
        0.02, 1, 100, lr_scheduler={"name": "OneCycleLR",
                                    "params": {"max_lr": 0.02}})
    assert mom_fn is not None
    # inverse relationship: momentum bottoms where lr peaks
    lrs = np.asarray([lr_fn(s) for s in range(100)])
    moms = np.asarray([mom_fn(s) for s in range(100)])
    assert lrs.argmax() == moms.argmin()
    assert np.isclose(moms.min(), 0.85, atol=1e-6)
    assert np.isclose(moms.max(), 0.95, atol=1e-6)

    # Adam path builds and steps with the injected beta1
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.ones(3)}
    tx = make_optimizer(params, optimizer="Adam", lr=0.0001,
                        max_epochs=1, steps_per_epoch=10,
                        lr_scheduler={"name": "OneCycleLR",
                                      "params": {"max_lr": 0.001}})
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_onecycle_unknown_param_raises_descriptively():
    with pytest.raises(ValueError, match="unsupported OneCycleLR params"):
        resolve_schedule(0.05, 10, 10,
                         lr_scheduler={"name": "OneCycleLR",
                                       "params": {"max_lr": 0.02,
                                                  "warmup_banana": 1}})
    # the torch epochs/steps_per_epoch span spelling is consumed
    fn = resolve_schedule(0.05, 10, 10,
                          lr_scheduler={"name": "OneCycleLR",
                                        "params": {"max_lr": 0.02,
                                                   "epochs": 2,
                                                   "steps_per_epoch": 50}})
    lrs = [float(fn(s)) for s in range(100)]
    assert np.argmax(lrs) == 29  # pct_start * 100 - 1


def test_cutout_masks_image_only():
    from centernet_lightning_tpu.data.transforms import Cutout

    rng = np.random.default_rng(0)
    img = np.full((64, 64, 3), 255, np.uint8)
    boxes = np.array([[4.0, 4.0, 20.0, 20.0]], np.float32)
    sample = {"image": img, "bboxes": boxes.copy(),
              "labels": np.array([1], np.int64)}
    out = Cutout(num_holes=10, max_h_size=16, max_w_size=16,
                 fill_value=7, p=1.0)(sample, rng)
    assert out["image"].dtype == np.uint8
    assert (out["image"] == 7).any()          # holes landed
    assert (out["image"] == 255).any()        # but not everywhere
    np.testing.assert_array_equal(out["bboxes"], boxes)  # boxes untouched
    # input image is not mutated in place (no aliasing)
    assert out["image"] is not img
    assert (img == 255).all()


def test_cutout_albumentations_border_semantics():
    """albumentations clips y1/x1 first then extends by the FULL hole size:
    holes near the top/left border shift inward instead of shrinking, and
    odd sizes produce exactly-max-size holes."""
    from centernet_lightning_tpu.data.transforms import Cutout

    t = Cutout(num_holes=1, max_h_size=9, max_w_size=9, fill_value=0, p=1.0)

    class _FixedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def integers(self, lo, hi):
            return self.vals.pop(0)

    # center at (0, 0): hole is the full 9x9 anchored at the origin
    img = np.full((32, 32, 3), 255, np.uint8)
    out = t.apply({"image": img}, _FixedRng([0, 0]))["image"]
    assert (out[:9, :9] == 0).all()
    assert (out[9:, :] == 255).all() and (out[:, 9:] == 255).all()
    # interior center: odd size stays exactly 9 (not 8)
    img = np.full((32, 32, 3), 255, np.uint8)
    out = t.apply({"image": img}, _FixedRng([16, 16]))["image"]
    ys, xs = np.where(out[..., 0] == 0)
    assert ys.max() - ys.min() + 1 == 9 and xs.max() - xs.min() + 1 == 9


def test_motion_blur():
    """MotionBlur (reference configs/crowdhuman_tracking.yaml:55-56):
    image-only op, preserves dtype/mean-ish brightness, boxes untouched."""
    from centernet_lightning_tpu.data.transforms import (MotionBlur,
                                                         build_transforms)

    rng = np.random.default_rng(0)
    img = (np.linspace(0, 255, 64 * 64 * 3).reshape(64, 64, 3)).astype(np.uint8)
    boxes = np.array([[4.0, 4.0, 20.0, 20.0]], np.float32)
    sample = {"image": img.copy(), "bboxes": boxes.copy(),
              "labels": np.array([0], np.int64)}
    out = MotionBlur(blur_limit=(3, 15), p=1.0).apply(sample, rng)
    assert out["image"].shape == img.shape and out["image"].dtype == np.uint8
    assert not np.array_equal(out["image"], img)  # blur happened
    # normalized kernel keeps brightness close
    assert abs(float(out["image"].mean()) - float(img.mean())) < 5.0
    np.testing.assert_array_equal(out["bboxes"], boxes)
    # config surface: both Gen-A spellings build
    build_transforms([{"name": "MotionBlur", "params": {"blur_limit": [3, 15]}}])
    build_transforms({"MotionBlur": {"blur_limit": [3, 15]}})


def test_cutout_from_config():
    from centernet_lightning_tpu.data.transforms import build_transforms

    # the reference mot_tracking.yaml:78-82 block, via the params spelling
    pipe = build_transforms([
        {"name": "Cutout",
         "params": {"num_holes": 10, "max_w_size": 60, "max_h_size": 60}},
    ], seed=0)
    sample = {"image": np.full((128, 128, 3), 200, np.uint8),
              "bboxes": np.zeros((0, 4), np.float32),
              "labels": np.zeros((0,), np.int64)}
    out = pipe(sample)
    assert out["image"].shape == (128, 128, 3)
