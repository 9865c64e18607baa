"""W&B logger call-contract test against a stub wandb module.

wandb is not installed in this environment (zero egress), so the backend
path in train/logging.py never executes in the other tests. This stub
pins the call contract — init kwargs, log(metrics, step=), wandb.Image
box-overlay schema (reference utils/image_annotate.py:252-264 /
convert_bboxes_to_wandb), Histogram, finish — so a real wandb install
can't be surprised by a drifted call shape.
"""
import sys
import types

import numpy as np
import pytest


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, data, step=None):
        self.logged.append((data, step))

    def finish(self):
        self.finished = True


class _FakeImage:
    def __init__(self, image, boxes=None):
        self.image = np.asarray(image)
        self.boxes = boxes


class _FakeHistogram:
    def __init__(self, values):
        self.values = np.asarray(values)


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.run = _FakeRun()
    mod.init_kwargs = None

    def init(**kwargs):
        mod.init_kwargs = kwargs
        return mod.run

    mod.init = init
    mod.Image = _FakeImage
    mod.Histogram = _FakeHistogram
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_wandb_backend_call_contract(fake_wandb, tmp_path):
    from centernet_lightning_tpu.train.logging import MetricLogger

    logger = MetricLogger(
        log_dir=str(tmp_path), backends=("wandb",), project="proj",
        run_name="run", config={"lr": 0.1},
    )
    assert fake_wandb.init_kwargs["project"] == "proj"
    assert fake_wandb.init_kwargs["name"] == "run"
    assert fake_wandb.init_kwargs["config"] == {"lr": 0.1}
    # offline by default: no egress surprises on machines without a login
    assert fake_wandb.init_kwargs["mode"] == "offline"

    logger.log({"train/total_loss": 1.5}, step=3)
    data, step = fake_wandb.run.logged[-1]
    assert data == {"train/total_loss": 1.5} and step == 3

    logger.log_image("diag/heatmap", np.zeros((8, 8, 3), np.uint8), step=4)
    data, step = fake_wandb.run.logged[-1]
    assert isinstance(data["diag/heatmap"], _FakeImage) and step == 4

    logger.log_histogram("diag/scores", np.linspace(0, 1, 32), step=5)
    data, step = fake_wandb.run.logged[-1]
    assert isinstance(data["diag/scores"], _FakeHistogram) and step == 5

    # box overlay: the native W&B schema {predictions: {box_data: [...]}}
    logger.log_boxes(
        "val/preds", np.zeros((16, 16, 3), np.uint8),
        boxes=np.array([[2.0, 2.0, 10.0, 10.0]]), labels=np.array([0]),
        scores=np.array([0.9]), step=6, class_names=["thing"],
    )
    data, step = fake_wandb.run.logged[-1]
    img = data["val/preds"]
    assert isinstance(img, _FakeImage) and step == 6
    overlay = img.boxes["predictions"]
    assert "box_data" in overlay
    box0 = overlay["box_data"][0]
    assert {"position", "class_id"} <= set(box0)
    assert box0["position"]["minX"] == pytest.approx(2.0)

    logger.close()
    assert fake_wandb.run.finished


def test_wandb_unavailable_falls_back(tmp_path, monkeypatch):
    """No wandb module: backend skipped with a warning, JSONL still logs."""
    import builtins

    real_import = builtins.__import__

    def block_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("no wandb here")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block_wandb)
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    from centernet_lightning_tpu.train.logging import MetricLogger

    with pytest.warns(UserWarning, match="wandb backend unavailable"):
        logger = MetricLogger(log_dir=str(tmp_path), backends=("wandb",))
    logger.log({"x": 1.0}, step=0)
    logger.close()
    assert (tmp_path / "metrics.jsonl").read_text().strip()
