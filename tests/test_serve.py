"""tools/serve.py — the HTTP detection server: micro-batching service
contract + the stdlib HTTP layer (no reference counterpart; the TPU-native
deployment surface)."""
import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from serve import DetectionService, make_server  # noqa: E402

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def predictor():
    import jax

    from centernet_lightning_tpu.api import CenterNetPredictor
    from centernet_lightning_tpu.models.centernet import CenterNet

    task = CenterNet(
        num_classes=2, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=6,
        image_size=(64, 64),
    )
    variables = task.init(jax.random.PRNGKey(0))
    return CenterNetPredictor(task, variables, image_size=(64, 64))


def make_image(seed=0, hw=(48, 72)):
    rng = np.random.default_rng(seed)
    img = rng.integers(10, 40, (*hw, 3)).astype(np.uint8)
    img[10:30, 20:44] = 235
    return img


def test_service_micro_batching(predictor):
    """4 concurrent submits share ONE device batch (the core serving
    design: fixed-shape program, stragglers joined within the window)."""
    service = DetectionService(predictor, batch_size=4, max_wait_ms=500,
                               num_detections=6, score_threshold=0.0).start()
    try:
        results = [None] * 4
        errors = []

        def worker(i):
            try:
                results[i] = service.submit(make_image(i))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert service.requests_served == 4
        assert service.batches_run == 1, "requests did not share a batch"
        for r in results:
            assert r["width"] == 72 and r["height"] == 48
            assert len(r["detections"]) == 6  # threshold 0: all slots
            for d in r["detections"]:
                assert set(d) >= {"box", "label", "score"}
                assert len(d["box"]) == 4
                assert 0 <= d["label"] < 2
    finally:
        service.stop()


def test_service_per_request_threshold(predictor):
    service = DetectionService(predictor, batch_size=2, max_wait_ms=1,
                               num_detections=6, score_threshold=0.0).start()
    try:
        none = service.submit(make_image(), score_threshold=1.1)
        assert none["detections"] == []
        all_ = service.submit(make_image(), score_threshold=0.0)
        assert len(all_["detections"]) == 6
    finally:
        service.stop()


def test_http_server_end_to_end(predictor):
    import cv2

    service = DetectionService(
        predictor, batch_size=2, max_wait_ms=1, num_detections=6,
        score_threshold=0.0, class_names=["cat", "dog"]).start()
    server = make_server(service, "127.0.0.1", 0, model_info={"tag": "t"})
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        # healthz
        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health["status"] == "ok" and health["tag"] == "t"
        assert health["image_size"] == [64, 64]

        # raw image bytes
        ok, buf = cv2.imencode(".jpg", cv2.cvtColor(make_image(),
                                                    cv2.COLOR_RGB2BGR))
        assert ok
        req = urllib.request.Request(
            f"{base}/v1/detect", data=buf.tobytes(),
            headers={"Content-Type": "image/jpeg"})
        out = json.loads(urllib.request.urlopen(req).read())
        assert out["width"] == 72 and out["height"] == 48
        assert len(out["detections"]) == 6
        assert out["detections"][0]["class_name"] in ("cat", "dog")
        assert out["latency_ms"] > 0

        # JSON base64 body + query threshold that prunes everything
        import base64 as b64

        payload = json.dumps(
            {"image_b64": b64.b64encode(buf.tobytes()).decode()}).encode()
        req = urllib.request.Request(
            f"{base}/v1/detect?score_threshold=1.1", data=payload,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req).read())
        assert out["detections"] == []

        # bad routes / bad payloads
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/nope")
        assert e.value.code == 404
        req = urllib.request.Request(
            f"{base}/v1/detect", data=b"not an image",
            headers={"Content-Type": "image/jpeg"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        service.stop()
