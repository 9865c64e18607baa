"""Public API — the documented reference surface, TPU-native.

Restores the Gen-A/README contracts the reference documents but broke
mid-refactor (reference README.md:34-65, 92-98; SURVEY.md §0):

    model = build_centernet("configs/centernet.yaml")          # or ckpt dir
    dets  = model.gather_detection2d(images)                   # device decode
    out   = model.inference_detection(img_dir)                 # numpy dict
    out   = model.inference_tracking(img_dir, save_dir=...)    # MOT tracking

Everything device-side is one jitted program (preprocess -> forward ->
decode); only the final top-k arrays cross to host.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .data.inference import InferenceDataset
from .models.centernet import CenterNet
from .models.tracker import Tracker
from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, preprocess
from .train.config import load_config, normalize_config

__all__ = ["CenterNetPredictor", "build_centernet"]


def _extract_norm(data_cfg: Optional[Dict]) -> tuple:
    """Pull Normalize(mean, std) out of a transforms config list."""
    for t in (data_cfg or {}).get("transforms", []) or []:
        if t.get("name") == "Normalize":
            args = t.get("init_args") or t.get("params") or {}
            return tuple(args.get("mean", IMAGENET_MEAN)), tuple(
                args.get("std", IMAGENET_STD)
            )
    return tuple(IMAGENET_MEAN), tuple(IMAGENET_STD)


class CenterNetPredictor:
    """Task + weights bundle with the reference's inference API.

    compute_dtype='bfloat16' casts weights + activations to bf16 (full MXU
    rate on TPU, ~1.5x the f32 throughput; the decode itself stays f32).
    """

    def __init__(self, task: CenterNet, variables: Dict[str, Any],
                 image_size=(512, 512),
                 mean: Sequence[float] = IMAGENET_MEAN,
                 std: Sequence[float] = IMAGENET_STD,
                 compute_dtype: Optional[str] = None):
        self.task = task
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        if self.compute_dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(self.compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                variables,
            )
        self.variables = variables
        self.image_size = tuple(image_size)
        self.mean = tuple(mean)
        self.std = tuple(std)
        self._decode_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # jitted device programs (cached per (k, nms, normalize) signature)
    # ------------------------------------------------------------------

    def _decode_fn(self, num_detections: int, nms_kernel: int, normalize: bool,
                   raw_uint8: bool):
        # per-INSTANCE jit cache: an lru_cache on the method would key on
        # self at class level, pinning every predictor's weight tree for
        # the process lifetime and sharing one eviction budget across
        # instances (recompile thrash)
        key = (num_detections, nms_kernel, normalize, raw_uint8)
        cached = self._decode_cache.get(key)
        if cached is not None:
            return cached
        task, mean, std = self.task, self.mean, self.std

        dtype = self.compute_dtype

        forward = self._forward

        def fn(variables, images):
            if raw_uint8:
                images = preprocess(images, mean=mean, std=std,
                                    dtype=dtype or jnp.float32)
            elif dtype is not None:
                images = images.astype(dtype)
            outputs = forward(variables, images)
            reid = outputs.get("reid")
            # raw model dtypes (bf16) flow straight into decode: the fused
            # kernel consumes NHWC bf16 natively; scores/boxes/embeddings
            # come back f32 either way
            return task.decode_detections(
                outputs["heatmap"],
                outputs["box_2d"],
                reid=reid,
                normalize_boxes=normalize,
                num_detections=num_detections, nms_kernel=nms_kernel,
                from_logits=True,
            )

        jitted = jax.jit(fn)
        self._decode_cache[key] = jitted
        return jitted

    def _forward(self, variables, images):
        """Model forward inside the serving program (hook for the int8
        predictor, which swaps every conv for MXU int8 math)."""
        return self.task.model.apply(variables, images, train=False)

    def _prep_calibration(self, images) -> jnp.ndarray:
        """Preprocess a calibration batch exactly like serving inputs."""
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8:
            return preprocess(images, mean=self.mean, std=self.std,
                              dtype=self.compute_dtype or jnp.float32)
        return images.astype(self.compute_dtype) if self.compute_dtype \
            else images

    def quantize(self, calibration_images, exclude=None):
        """Calibrate + return an int8-serving predictor (quantize.py).

        calibration_images: one batch or a list of batches (uint8 raw or
        preprocessed float, NHWC) representative of serving inputs. The
        returned predictor has the same API; its convs run int8 on the
        MXU (~2x bf16 rate on v5e). No reference counterpart (the
        reference exports f32/fp16 only, tools/export.py:7-32).
        """
        from .quantize import default_exclude, quantize_model

        exclude = exclude or default_exclude
        batches = (list(calibration_images)
                   if isinstance(calibration_images, (list, tuple))
                   else [calibration_images])
        prepped = [self._prep_calibration(b) for b in batches]
        forward_fn, quant_variables = quantize_model(
            self.task.model, self.variables, prepped, exclude=exclude)
        return QuantizedCenterNetPredictor(self, forward_fn, quant_variables)

    def __call__(self, images, train: bool = False):
        """Raw forward: encoded outputs dict (README.md:92-95 step 1).
        train=True routes through task.apply (mutable batch_stats) and
        returns (outputs, mutated_variables) like flax does."""
        if train:
            return self.task.apply(self.variables, images, train=True)
        # jit per instance: an eager apply dispatches every op individually
        # (~20ms each over the axon tunnel)
        if getattr(self, "_raw_forward_jit", None) is None:
            self._raw_forward_jit = jax.jit(self._forward)
        return self._raw_forward_jit(self.variables, images)

    def gather_detection2d(self, images, num_detections: Optional[int] = None,
                           nms_kernel: Optional[int] = None,
                           normalize_boxes: bool = False) -> Dict[str, np.ndarray]:
        """Forward + decode -> numpy {bboxes xyxy, labels, scores}.

        Accepts either images (uint8 raw or preprocessed float, NHWC) or a
        dict of ENCODED outputs from `model(images)` — the reference's
        two-step contract (README.md:92-98: encoded = model(img);
        dets = model.gather_detection2d(encoded)).
        """
        if isinstance(images, dict):
            encoded = images
            out = self.task.decode_detections(
                encoded["heatmap"],
                encoded["box_2d"],
                reid=encoded.get("reid"),
                normalize_boxes=normalize_boxes,
                num_detections=num_detections, nms_kernel=nms_kernel,
                from_logits=True,
            )
            return {
                "bboxes": np.asarray(out["boxes"]),
                "labels": np.asarray(out["labels"]),
                "scores": np.asarray(out["scores"]),
                **({"embeddings": np.asarray(out["embeddings"])}
                   if "embeddings" in out else {}),
            }
        images = jnp.asarray(images)
        raw = images.dtype == jnp.uint8
        fn = self._decode_fn(
            num_detections or self.task.num_detections,
            nms_kernel or self.task.nms_kernel, normalize_boxes, raw,
        )
        out = fn(self.variables, images)
        return {
            "bboxes": np.asarray(out["boxes"]),
            "labels": np.asarray(out["labels"]),
            "scores": np.asarray(out["scores"]),
            **({"embeddings": np.asarray(out["embeddings"])}
               if "embeddings" in out else {}),
        }

    def gather_tracking2d(self, images, num_detections: Optional[int] = None,
                          nms_kernel: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Tracking decode: boxes normalized + ReID embeddings
        (reference fairmot.py:138-151)."""
        return self.gather_detection2d(
            images, num_detections=num_detections, nms_kernel=nms_kernel,
            normalize_boxes=True,
        )

    def _gather_tracking_device(self, images, num_detections=None,
                                nms_kernel=None):
        """gather_tracking2d but returning DEVICE arrays: dispatch is async,
        so the caller can overlap the forward with host work and convert to
        numpy later (inference_tracking's software pipeline depends on
        this — np.asarray at dispatch time would serialize everything)."""
        images = jnp.asarray(images)
        fn = self._decode_fn(
            num_detections or self.task.num_detections,
            nms_kernel or self.task.nms_kernel, True,
            images.dtype == jnp.uint8,
        )
        return fn(self.variables, images)

    # ------------------------------------------------------------------
    # folder APIs
    # ------------------------------------------------------------------

    def inference_detection(self, img_dir: str, batch_size: int = 4,
                            num_detections: int = 100,
                            score_threshold: float = 0.0) -> Dict[str, np.ndarray]:
        """Detect over a folder (README.md:49-65): returns numpy
        {bboxes (I,K,4) xyxy in ORIGINAL image coords, labels (I,K),
        scores (I,K)}. Shapes stay fixed at K=num_detections; entries below
        `score_threshold` are masked out (label -1, score/box 0)."""
        ds = InferenceDataset(img_dir, resize=self.image_size)
        all_boxes, all_labels, all_scores, paths = [], [], [], []

        for start in range(0, len(ds), batch_size):
            items = [ds[i] for i in range(start, min(start + batch_size, len(ds)))]
            n = len(items)
            batch = np.stack([x["image"] for x in items])
            if n < batch_size:  # pad for static shapes
                pad = np.zeros((batch_size - n, *batch.shape[1:]), batch.dtype)
                batch = np.concatenate([batch, pad])
            dets = self.gather_detection2d(
                jnp.asarray(batch), num_detections=num_detections,
                normalize_boxes=True,
            )
            for i, item in enumerate(items):
                scale = np.array([
                    item["original_width"], item["original_height"],
                    item["original_width"], item["original_height"],
                ], np.float32)
                keep = dets["scores"][i] >= score_threshold
                all_boxes.append(dets["bboxes"][i] * scale * keep[:, None])
                all_labels.append(np.where(keep, dets["labels"][i], -1))
                all_scores.append(dets["scores"][i] * keep)
                paths.append(item["image_path"])

        return {
            "bboxes": np.stack(all_boxes) if all_boxes else np.zeros((0, num_detections, 4)),
            "labels": np.stack(all_labels) if all_labels else np.zeros((0, num_detections), int),
            "scores": np.stack(all_scores) if all_scores else np.zeros((0, num_detections)),
            "image_paths": paths,
        }

    def track_stream(self, batches, tracker_config: Optional[Dict] = None,
                     pipeline_depth: int = 1, **tracker_kwargs):
        """Pipelined tracking over an iterator of `(frames, n_valid)` pairs,
        where `frames` is a uint8/float (B, H, W, 3) array at the model's
        image size and `n_valid <= B` marks how many leading frames are
        real (the rest is padding for static shapes).

        Yields one dict per valid frame, in order:
        `{'bboxes': [xyxy norm], 'track_ids': [int], 'num_detections': int}`
        (active tracks after that frame's association; num_detections =
        detections above the tracker's score threshold that entered it).

        This is the serving hot path (reference tracker.py:83-121
        step_batch, made streaming): the device forward of batch i+1 is
        dispatched — async, device arrays, no host sync — before the host
        runs batch i's Hungarian association, so the TPU computes while the
        host associates (SURVEY.md §7 hard parts). The numpy conversion
        (the only blocking point) happens AFTER the next dispatch.

        pipeline_depth: number of batches in flight. 1 (default) keeps the
        dispatch inline on the caller's thread. >= 2 moves H2D upload +
        dispatch to a background thread with up to `pipeline_depth` batches
        queued — required when the upload itself blocks the host (remote
        TPU tunnels, slow PCIe): with an inline dispatch the upload
        serializes against the Hungarian association, so association time
        is never hidden no matter how fast the device is.
        """
        assert self.task.reid_config is not None, (
            "tracking needs a model with a reid head (reid_config)"
        )
        cfg = dict(tracker_config or {})
        cfg.update(tracker_kwargs)

        def model_fn(images, num_detections=None, nms_kernel=None):
            return self.gather_tracking2d(
                jnp.asarray(images), num_detections=num_detections,
                nms_kernel=nms_kernel,
            )

        tracker = Tracker(model=model_fn, **cfg)
        k = cfg.get("num_detections", tracker.num_detections)
        nms = cfg.get("nms_kernel")

        if pipeline_depth >= 2:
            pending_iter = self._threaded_dispatch(
                batches, pipeline_depth, num_detections=k, nms_kernel=nms)
        else:
            def inline_dispatch():
                it = iter(batches)
                nxt = next(it, None)
                pending = None
                if nxt is not None:
                    pending = (nxt[1], self._gather_tracking_device(
                        nxt[0], num_detections=k, nms_kernel=nms))
                while pending is not None:
                    n, dets_dev = pending
                    nxt = next(it, None)
                    pending = None
                    if nxt is not None:
                        pending = (nxt[1], self._gather_tracking_device(
                            nxt[0], num_detections=k, nms_kernel=nms))
                    yield n, dets_dev

            pending_iter = inline_dispatch()

        for n, dets_dev in pending_iter:
            boxes = np.asarray(dets_dev["boxes"])
            labels = np.asarray(dets_dev["labels"])
            scores = np.asarray(dets_dev["scores"])
            embeddings = np.asarray(dets_dev["embeddings"])
            for i in range(n):
                tracker.update(boxes[i], labels[i], scores[i], embeddings[i])
                tracker.frame += 1
                yield {
                    "bboxes": [t.bbox for t in tracker.tracks if t.active],
                    "track_ids": [t.track_id for t in tracker.tracks
                                  if t.active],
                    "num_detections": int(
                        (scores[i] >= tracker.detection_threshold).sum()),
                }

    def _threaded_dispatch(self, batches, depth: int, **gather_kwargs):
        """Upload + dispatch batches on a background thread, keeping up to
        `depth` batches in flight; yields (n_valid, device_dets) in input
        order. This makes the (potentially host-blocking) H2D upload of
        batch i+1 overlap the consumer's host work on batch i — jnp.asarray
        of a full frame batch is a synchronous copy, and over a remote-TPU
        tunnel it IS the serving bottleneck (measured in bench_track.py)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(depth - 1, 1))
        stop = threading.Event()
        _END = object()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for frames, n in batches:
                    if stop.is_set():
                        return
                    dev = self._gather_tracking_device(frames, **gather_kwargs)
                    if not put((n, dev)):
                        return
            except BaseException as exc:  # surfaced on the consumer thread
                put(exc)
                return
            put(_END)

        t = threading.Thread(target=worker, daemon=True,
                             name="track_stream_dispatch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def inference_tracking(self, img_dir: str, batch_size: int = 4,
                           save_dir: Optional[str] = None,
                           save_results: bool = False,
                           save_images: bool = False,
                           tracker_config: Optional[Dict] = None,
                           **tracker_kwargs) -> Dict[str, list]:
        """Track a folder of frames (the reference's commented-out
        inference_tracking2d spec, fairmot.py:154-216). Returns per-frame
        {'bboxes', 'track_ids'}; optionally writes MOT-format results."""
        ds = InferenceDataset(img_dir, resize=self.image_size)
        results_path = images_dir = None
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            if save_results:
                results_path = os.path.join(save_dir, "tracking_results.txt")
                if os.path.exists(results_path):
                    os.remove(results_path)
            if save_images:
                images_dir = os.path.join(save_dir, "images")
                os.makedirs(images_dir, exist_ok=True)

        # items for frame f are loaded (appended) before track_stream can
        # yield f — the stream holds at most one batch in flight, so the
        # deque never exceeds two batches of decoded frames.
        import collections

        loaded_items = collections.deque()

        def batch_iter():
            for start in range(0, len(ds), batch_size):
                items = [ds[i] for i in
                         range(start, min(start + batch_size, len(ds)))]
                loaded_items.extend(items)
                batch = np.stack([x["image"] for x in items])
                if len(items) < batch_size:
                    pad = np.zeros(
                        (batch_size - len(items), *batch.shape[1:]),
                        batch.dtype)
                    batch = np.concatenate([batch, pad])
                yield batch, len(items)

        out = {"bboxes": [], "track_ids": []}
        stream = self.track_stream(batch_iter(), tracker_config=tracker_config,
                                   **tracker_kwargs)
        for frame, step in enumerate(stream):
            item = loaded_items.popleft()
            out["bboxes"].append(step["bboxes"])
            out["track_ids"].append(step["track_ids"])

            if results_path:
                from .eval.utils import write_mot_results

                write_mot_results(
                    results_path, [step["bboxes"]], [step["track_ids"]],
                    img_width=item["original_width"],
                    img_height=item["original_height"],
                    start_frame=frame,
                )
            if images_dir:
                import cv2

                from .utils.viz import draw_boxes

                annotated = draw_boxes(
                    item["image"], step["bboxes"],
                    labels=step["track_ids"], normalized_boxes=True,
                )
                cv2.imwrite(
                    os.path.join(images_dir, f"{frame:06d}.jpg"),
                    cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR),
                )
        return out


class QuantizedCenterNetPredictor(CenterNetPredictor):
    """int8-serving predictor produced by CenterNetPredictor.quantize().

    Same API as the float predictor; inside the jitted serving program
    every calibrated nn.Conv runs as int8 x int8 -> int32 on the MXU
    (quantize.py). The int8 weights + dequant scales travel INSIDE the
    variables tree (collection "_quant") so they are jit arguments on
    device, not constants baked into the executable; flax ignores the
    extra collection.
    """

    def __init__(self, base: CenterNetPredictor, forward_fn, quant_variables):
        # delegate so the classes stay in lockstep as the base gains state;
        # compute_dtype=None because base.variables are already cast
        super().__init__(base.task, quant_variables,
                         image_size=base.image_size, mean=base.mean,
                         std=base.std, compute_dtype=None)
        self.compute_dtype = base.compute_dtype  # honored in _decode_fn
        self._quant_forward = forward_fn

    def _forward(self, variables, images):
        """int8 forward — both the jitted serving program (_decode_fn) and
        the two-step __call__ (train=False) route through here; train=True
        stays a float fallback (int8 weights carry no gradients)."""
        return self._quant_forward(variables, images, train=False)


def build_centernet(
    config: Union[str, Dict[str, Any]],
    checkpoint: Optional[str] = None,
    rng=None,
    torch_ckpt: Optional[str] = None,
) -> CenterNetPredictor:
    """YAML path / config dict / checkpoint dir -> ready predictor
    (the documented Gen-A entry point, README.md:34-47).

    Accepts Gen-A and Gen-B config shapes (train/config.py normalizes).
    If `config` is a checkpoint directory with hparams.json, the model is
    rebuilt from the checkpoint alone (Lightning load_from_checkpoint
    equivalent). `torch_ckpt` ingests a reference Lightning .ckpt (the
    released-checkpoint path, reference docs/model_zoo.md:3-5) by full
    torch->flax conversion.
    """
    from .train.checkpoint import load_checkpoint

    hparams: Dict[str, Any]
    state = None
    if isinstance(config, str) and os.path.isdir(config):
        state, hparams = load_checkpoint(config)
        if hparams is None:
            raise ValueError(f"{config} has no hparams.json")
        model_cfg = hparams
    else:
        if isinstance(config, str):
            config = load_config(config)
        config = normalize_config(config)
        model_cfg = dict(config.get("model", config))

    # strip non-CenterNet keys
    task_kwargs = {
        k: v for k, v in model_cfg.items()
        if k in CenterNet.__dataclass_fields__
    }
    task = CenterNet(**task_kwargs)

    image_size = tuple(model_cfg.get("image_size", (512, 512)))
    mean, std = _extract_norm(model_cfg.get("val_data"))

    if checkpoint is not None:
        state, _ = load_checkpoint(checkpoint)
    if torch_ckpt is not None:
        variables = task.load_torch_checkpoint(torch_ckpt, image_size=image_size)
    elif state is not None:
        # a run trained with ema_decay serves its AVERAGED weights — the
        # same ones validation monitored when selecting this checkpoint
        params = state.get("ema_params") or state["params"]
        variables = {"params": params,
                     "batch_stats": state.get("batch_stats", {})}
    else:
        variables = task.init(rng or jax.random.PRNGKey(0), image_size=image_size)

    return CenterNetPredictor(task, variables, image_size=image_size,
                              mean=mean, std=std,
                              compute_dtype=model_cfg.get("compute_dtype"))
