"""Training orchestration — the Lightning Trainer/CLI replacement.

Drives the jitted train step (train/state.py) over the data-parallel mesh
(parallel/mesh.py), with:
 - per-step train/{k}_loss logging           (reference meta.py:115-125)
 - per-epoch COCO validation -> val/<12 metrics>  (centernet.py:202-218)
 - or MOT tracking validation -> val/HOTA|MOTA|IDF1  (fairmot.py:87-136)
 - orbax checkpointing monitoring a metric + save_last + auto-resume
   (SURVEY.md §5.4), param-count report at fit start (meta.py:108-113)
 - optional jax.profiler trace (--profile, SURVEY.md §5.1)
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.coco_eval import CocoEvaluator
from ..models.meta import param_count_report
from ..models.tracker import Tracker
from ..parallel.mesh import (
    batch_sharding, create_mesh, gather_object_lists, replicated,
)
from ..utils.box_np import convert_box_format
from .checkpoint import (latest_checkpoint, load_checkpoint, save_checkpoint,
                         wait_for_saves)
from .logging import MetricLogger
from .optim import make_optimizer, schedule_from_config
from .state import TrainState, _task_mean_std, make_eval_step, make_train_step

__all__ = ["Trainer"]


class Trainer:
    def __init__(
        self,
        task,
        train_loader=None,
        val_loader=None,
        max_epochs: int = 100,
        optimizer_config: Optional[Dict[str, Any]] = None,
        ckpt_dir: Optional[str] = None,
        log_dir: Optional[str] = None,
        monitor: str = "val/mAP",
        monitor_mode: str = "max",
        val_interval: int = 1,
        val_check_interval: Optional[float] = None,  # Lightning semantics:
        # float < 1 = fraction of an epoch (mid-epoch validation), int > 1 =
        # every N training batches; 1/None = epoch boundaries (val_interval)
        image_size=(512, 512),
        seed: int = 0,
        resume: bool = True,
        profile: bool = False,
        log_every: int = 50,
        tracker_config: Optional[Dict[str, Any]] = None,
        precision: Optional[str] = None,   # 'bf16'/'bfloat16'/16 -> bf16 fwd/bwd
        diagnostics: bool = True,          # heatmap-grid image at fit start
        finetune_from: Optional[str] = None,  # partial weight restore
        logger_config: Optional[Dict[str, Any]] = None,  # backend selection
        accumulate_grad_batches: int = 1,  # Lightning trainer key: optimizer
                                           # updates every k micro-batches
                                           # (optax.MultiSteps — one jitted
                                           # program either way)
        ema_decay: float = 0.0,  # >0: keep an EMA of the weights (updated
                                 # inside the jitted step), validate/serve
                                 # with it (train/state.py make_train_step)
    ):
        self.task = task
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.max_epochs = max_epochs
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        self.val_interval = val_interval
        self.image_size = tuple(image_size)
        if hasattr(task, "image_size"):
            # keep hparams truthful: checkpoints record the resolution the
            # trainer actually ran at, so build_centernet(ckpt) serves it
            task.image_size = self.image_size
        self.seed = seed
        self.resume = resume
        self.profile = profile
        self.log_every = log_every
        self.tracker_config = tracker_config or {}

        # data-axis size must divide the GLOBAL batch (per-process loader
        # batch x process count); clamp to the largest divisor. In multihost
        # the mesh must keep every process's devices — dropping devices
        # would strand peers' collectives — so there we require
        # divisibility instead of clamping.
        n_dev = len(jax.devices())
        batch_size = getattr(train_loader, "batch_size", None)
        global_batch = (batch_size or 0) * jax.process_count()
        if jax.process_count() > 1:
            if global_batch and global_batch % n_dev != 0:
                raise ValueError(
                    f"multihost: global batch {global_batch} "
                    f"({batch_size}/process x {jax.process_count()}) must be "
                    f"divisible by the {n_dev} global devices")
            n_data = n_dev
        elif global_batch:
            n_data = n_dev
            while n_data > 1 and global_batch % n_data != 0:
                n_data -= 1
        else:
            n_data = n_dev
        self.mesh = create_mesh(n_data=n_data, n_model=1,
                                devices=jax.devices()[:n_data])
        lc = dict(logger_config or {})
        # one metric writer per JOB: non-zero processes get a no-op logger
        # (rank-0 gating like the reference's prints, meta.py:109)
        if jax.process_index() == 0:
            self.logger = MetricLogger(
                log_dir, backends=tuple(lc.get("backends", ("tensorboard",))),
                project=lc.get("project"), run_name=lc.get("run_name"),
                config=task.hparams,
            )
        else:
            self.logger = MetricLogger(None, backends=())

        opt_cfg = dict(optimizer_config or task.optimizer_config or {})
        opt_cfg.pop("jit", None)  # always jitted here
        # backbone freeze (Gen-A frozen_stages) must reach the optimizer
        # mask too, or weight decay shrinks the frozen weights
        opt_cfg.setdefault("frozen_stages",
                           (getattr(task, "backbone_config", None) or {})
                           .get("frozen_stages", 0))
        steps_per_epoch = len(train_loader) if train_loader else 1
        # sub-epoch validation cadence (Lightning val_check_interval:
        # fraction of an epoch, or an absolute batch count when > 1)
        self.val_check_steps = None
        if val_check_interval and train_loader is not None:
            if val_check_interval < 1.0:
                self.val_check_steps = max(
                    1, int(steps_per_epoch * float(val_check_interval)))
            elif val_check_interval > 1:
                # Lightning raises when the batch-count form exceeds the
                # epoch length — otherwise the mid-epoch modulo would never
                # fire (batch_idx resets each epoch) and validation would
                # silently never run
                if int(val_check_interval) > steps_per_epoch:
                    raise ValueError(
                        f"val_check_interval={int(val_check_interval)} exceeds "
                        f"the {steps_per_epoch} batches in an epoch; validation "
                        f"would never run (Lightning raises here too)")
                self.val_check_steps = int(val_check_interval)
        self.accumulate = max(1, int(accumulate_grad_batches))
        if self.accumulate > 1:
            # the LR schedule counts OPTIMIZER updates (the inner tx only
            # steps every k micro-batches), so the per-epoch horizon shrinks
            steps_per_epoch = max(1, steps_per_epoch // self.accumulate)
        rng = jax.random.PRNGKey(seed)
        variables = task.init(rng, image_size=self.image_size)
        if finetune_from:
            # the reference's load_from_checkpoint finetune key
            # (configs/mot_tracking.yaml:3): overlapping shape-matching
            # weights restored, the rest (new heads/classifier) stay fresh
            from .checkpoint import restore_partial

            variables = restore_partial(finetune_from, variables)
        self.tx = make_optimizer(
            variables["params"], max_epochs=max_epochs,
            steps_per_epoch=steps_per_epoch, **opt_cfg,
        )
        # step -> lr, for logging (LearningRateMonitor parity); counts
        # OPTIMIZER updates, so divide micro-steps by `accumulate`
        self.lr_schedule = schedule_from_config(
            opt_cfg, max_epochs, steps_per_epoch)
        if self.accumulate > 1:
            # mean-of-k-micro-grads, applied every k-th step; clipping (inside
            # the chain) acts on the accumulated gradient like Lightning's
            import optax

            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=self.accumulate
            ).gradient_transformation()
        self.ema_decay = float(ema_decay)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            tx=self.tx,
            # EMA starts at the (possibly finetune-restored) init weights.
            # One jitted tree-copy = ONE dispatch: per-leaf eager jnp.copy
            # costs ~20 ms/leaf over the axon tunnel (hundreds of leaves)
            ema_params=(jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t))(
                    variables["params"])
                        if self.ema_decay > 0 else None),
        )
        self.start_epoch = 0
        self._maybe_resume()

        # replicate state over the mesh once
        rep = replicated(self.mesh)
        self.state = self.state.replace(
            params=jax.device_put(self.state.params, rep),
            batch_stats=jax.device_put(self.state.batch_stats, rep),
            opt_state=jax.device_put(self.state.opt_state, rep),
            step=jax.device_put(self.state.step, rep),
            ema_params=(jax.device_put(self.state.ema_params, rep)
                        if self.state.ema_params is not None else None),
        )

        compute_dtype = (
            "bfloat16" if str(precision) in ("16", "bf16", "bfloat16") else None
        )
        self.train_step = make_train_step(task, compute_dtype=compute_dtype,
                                          ema_decay=self.ema_decay,
                                          ema_every=self.accumulate)
        self.eval_step = make_eval_step(task)
        self._feature_fn = None  # lazy jitted backbone-feature diagnostic
        self._diag_warned = False  # first diagnostic failure warns once
        self.best_metric = -np.inf if monitor_mode == "max" else np.inf
        if hasattr(self, "_resumed_best"):
            self.best_metric = self._resumed_best
        self.diagnostics = diagnostics

    # ------------------------------------------------------------------

    def _maybe_resume(self):
        if not (self.resume and self.ckpt_dir):
            return
        latest = latest_checkpoint(self.ckpt_dir)
        if latest is None:
            return
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "epoch": 0,
            "best_metric": 0.0,
        }
        if self.state.ema_params is not None:
            target["ema_params"] = jax.device_get(self.state.ema_params)
        try:
            restored, _ = load_checkpoint(latest, target=target)
        except Exception:
            # EMA config/checkpoint mismatch, either direction:
            # - checkpoint predates ema_decay: restore without ema_params
            #   and re-seed the EMA from the restored raw weights
            # - checkpoint carries ema_params but this run disabled EMA:
            #   restore WITH them (orbax needs the full on-disk structure)
            #   and drop them afterwards
            if "ema_params" in target:
                target.pop("ema_params")
            else:
                target["ema_params"] = jax.device_get(self.state.params)
            restored, _ = load_checkpoint(latest, target=target)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        if self.state.ema_params is not None:
            # restored leaves are host numpy arrays; the replicate
            # device_put below transfers them into fresh device buffers,
            # so no copy is needed (per-leaf eager copies cost ~20 ms each
            # over the axon tunnel)
            self.state = self.state.replace(
                ema_params=restored.get("ema_params", restored["params"]))
        self.start_epoch = int(restored.get("epoch", 0))
        # restore the monitored best so auto-resume can't overwrite the
        # real best checkpoint with a worse first validation
        self._resumed_best = float(restored.get("best_metric", 0.0))
        if jax.process_index() == 0:
            print(f"resumed from {latest} (epoch {self.start_epoch})")

    def _save(self, epoch: int, tag: Optional[str] = None):
        if not self.ckpt_dir or jax.process_index() != 0:
            return
        tree = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "epoch": epoch,
            "best_metric": float(self.best_metric),
        }
        if self.state.ema_params is not None:
            # build_centernet serves ema_params when a checkpoint has them
            tree["ema_params"] = jax.device_get(self.state.ema_params)
        # best checkpoints go to a tagged subdir (ModelCheckpoint monitor
        # semantics, reference configs/centernet.yaml:103-106); untagged
        # saves are the rolling `save_last` chain
        ckpt_dir = os.path.join(self.ckpt_dir, tag) if tag else self.ckpt_dir
        # async: the epoch loop continues while orbax serializes on its
        # background thread; fit() joins via wait_for_saves()
        save_checkpoint(ckpt_dir, tree, hparams=self.task.hparams,
                        step=int(self.state.step),
                        keep_last=1 if tag else 3, async_save=True)

    def _shard(self, batch):
        from ..parallel.mesh import shard_batch

        batch = {k: v for k, v in batch.items() if k != "image_id"}
        n = batch["image"].shape[0]
        if jax.process_count() > 1:
            # each process contributes its local slice; slices join into
            # the global batch (mesh.shard_batch multihost path). Ragged
            # final batches can't be expressed that way — require the
            # loader to drop them.
            local_shards = self.mesh.shape["data"] // jax.process_count()
            if local_shards == 0 or n % max(local_shards, 1) != 0:
                raise ValueError(
                    f"multihost validation/training needs per-process "
                    f"batches divisible by the local mesh slots "
                    f"({local_shards}); got {n}. Set drop_last=True on the "
                    f"dataloader.")
            return shard_batch(batch, self.mesh)
        if n % self.mesh.shape["data"] == 0:
            return shard_batch(batch, self.mesh)
        # ragged final eval batch: replicate over the same mesh so the
        # placement matches the (replicated) train state
        sharding = replicated(self.mesh)
        return {k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batch.items()}

    # ------------------------------------------------------------------

    def _log_heatmap_diagnostic(self, batch):
        """Target-heatmap grid at fit start (the DiagnoseCenterNetLogger's
        core, SURVEY.md §5.5)."""
        try:
            import jax.numpy as jnp2

            from ..ops.targets import render_heatmap
            from ..utils.viz import render_heatmap_diagnostic

            img = np.asarray(batch["image"][:4])
            h, w = img.shape[1:3]
            hm = np.asarray(render_heatmap(
                jnp2.asarray(batch["boxes"][:4]),
                jnp2.asarray(batch["labels"][:4]).astype(jnp2.int32),
                jnp2.asarray(batch["mask"][:4]),
                self.task.num_classes, h // self.task.stride,
                w // self.task.stride, self.task.stride,
                self.task._radius_fn,
            ))
            grid = render_heatmap_diagnostic(img, hm)
            self.logger.log_image("diagnostics/target_heatmap", grid, 0)
        except Exception as exc:  # diagnostics must never break training
            self._warn_diagnostic_failure("target_heatmap", exc)

    def _install_preemption_handler(self):
        """SIGTERM/SIGINT request a graceful stop: finish the current step,
        checkpoint, exit cleanly so auto-resume continues the run (the
        failure-recovery behavior the reference lacks, SURVEY.md §5.3 — its
        recovery is manual resume only). A SECOND signal escalates: the
        original handler is restored and the signal re-raised, so a repeat
        Ctrl-C during a long compile/validation actually aborts.
        Returns the handlers to restore."""
        import signal

        self._stop_requested = False
        previous = {}

        def handler(signum, frame):
            if self._stop_requested:  # escalate on repeat
                signal.signal(signum, previous.get(signum, signal.SIG_DFL))
                os.kill(os.getpid(), signum)
                return
            self._stop_requested = True
            if jax.process_index() == 0:
                print(f"signal {signum}: stopping after the current step "
                      f"(checkpoint + clean exit); repeat to force-abort")

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous[sig] = signal.signal(sig, handler)
            except ValueError:  # not the main thread (tests/embedders)
                pass
        return previous

    _STOP_SYNC_EVERY = 10

    def _should_stop(self, step: int) -> bool:
        """Cross-host agreement on the preemption flag: in multihost runs
        the signal may reach only some hosts (or at different steps); acting
        on a local flag would leave the other hosts blocked in the next
        step's collectives. The flag is gathered at fixed sync points
        (every _STOP_SYNC_EVERY steps — a per-step host gather would add a
        cross-host barrier to every iteration) so all hosts stop at the
        SAME step boundary, at most _STOP_SYNC_EVERY steps after the
        signal."""
        if jax.process_count() == 1:
            return self._stop_requested
        if step % self._STOP_SYNC_EVERY != 0:
            return False
        from ..parallel.mesh import all_gather_host

        flags = np.asarray(all_gather_host(
            np.asarray([1.0 if self._stop_requested else 0.0])))
        stop = bool(flags.any())
        self._stop_requested = stop  # adopt the group decision
        return stop

    def _restore_signal_handlers(self, previous):
        import signal

        for sig, h in previous.items():
            signal.signal(sig, h)

    def fit(self):
        if jax.process_index() == 0:
            print(param_count_report({"params": jax.device_get(self.state.params)}))

        if self.profile and jax.process_index() == 0:
            jax.profiler.start_trace(os.path.join(self.ckpt_dir or ".", "profile"))

        previous_handlers = self._install_preemption_handler()
        try:
            return self._fit_loop()
        finally:
            self._restore_signal_handlers(previous_handlers)

    def _stop_profile(self):
        """Close the jax.profiler trace if one is open (normal end of the
        first epoch OR a preemption early-return — an unstopped trace never
        flushes and makes the next start_trace raise)."""
        if self.profile and jax.process_index() == 0:
            jax.profiler.stop_trace()
        self.profile = False

    def _fit_loop(self):
        first_batch_logged = not self.diagnostics
        # host-side mirror of state.step: reading int(self.state.step) every
        # iteration would block on the async-dispatched device step and
        # serialize host data loading with device compute; the device value
        # is exactly start + iterations, so mirror it and only sync at
        # logging boundaries (where losses are fetched anyway)
        step = int(self.state.step)
        for epoch in range(self.start_epoch, self.max_epochs):
            t0 = time.time()
            n_imgs = 0
            for batch_idx, batch in enumerate(self.train_loader):
                if not first_batch_logged and jax.process_index() == 0:
                    self._log_heatmap_diagnostic(batch)
                    first_batch_logged = True
                sharded = self._shard(batch)
                n_imgs += batch["image"].shape[0]
                self.state, losses = self.train_step(self.state, sharded)
                step += 1
                if self._should_stop(step):
                    self._stop_profile()
                    self._save(epoch)  # resume restarts this epoch
                    wait_for_saves()
                    if jax.process_index() == 0:
                        print(f"preempted at step {step}: "
                              f"checkpoint written, exiting cleanly")
                    return self.state
                if step % self.log_every == 0:
                    metrics = {f"train/{k}_loss": float(v) for k, v in losses.items()}
                    metrics["train/images_per_sec"] = n_imgs / (time.time() - t0)
                    metrics["train/lr"] = float(
                        self.lr_schedule(step // self.accumulate))
                    self.logger.log(metrics, step)
                if (self.val_check_steps and self.val_loader is not None
                        and (batch_idx + 1) % self.val_check_steps == 0
                        and (epoch + 1) % self.val_interval == 0):
                    # Lightning val_check_interval: validate mid-epoch on a
                    # per-epoch batch counter (the final hit of an epoch IS
                    # the epoch-boundary validation). check_val_every_n_epoch
                    # COMPOSES with it in Lightning: it gates which epochs
                    # validate at all, val_check_steps the cadence within them
                    self._run_validation(epoch + 1)

            if epoch == self.start_epoch:
                self._stop_profile()

            if (self.val_loader is not None and self.val_check_steps is None
                    and (epoch + 1) % self.val_interval == 0):
                self._run_validation(epoch + 1)
            self._save(epoch + 1)
        wait_for_saves()  # join the background checkpoint writer
        return self.state

    def _run_validation(self, epoch: int):
        """One validation pass + monitor bookkeeping + best-checkpoint save
        (shared by the epoch-boundary and mid-epoch cadences)."""
        metrics = self.validate()
        self.logger.log(metrics, int(self.state.step))
        score = metrics.get(self.monitor)
        if score is not None:
            better = (score > self.best_metric if self.monitor_mode == "max"
                      else score < self.best_metric)
            if better:
                self.best_metric = score
                self._save(epoch, tag="best")
        return metrics

    # ------------------------------------------------------------------

    def validate(self) -> Dict[str, float]:
        if self.task.reid_config is not None:
            return self.validate_tracking()
        return self.validate_detection()

    def _log_prediction_diagnostic(self, batch, dets, step: int):
        """Prediction-overlay grid per validation (DiagnoseCenterNetLogger's
        per-epoch box grids, reference image_annotate.py:169-264)."""
        try:
            from ..utils.viz import draw_boxes, make_image_grid

            tiles = []
            for i in range(min(4, batch["image"].shape[0])):
                keep = dets["scores"][i] >= 0.3
                tiles.append(draw_boxes(
                    np.asarray(batch["image"][i]),
                    np.asarray(dets["boxes"][i])[keep],
                    labels=np.asarray(dets["labels"][i])[keep],
                    scores=np.asarray(dets["scores"][i])[keep],
                ))
            self.logger.log_image("diagnostics/val_predictions",
                                  make_image_grid(tiles, ncols=2), step)
            # value-distribution diagnostics (reference
            # image_annotate.py:159-168 log_histogram)
            self.logger.log_histogram("diagnostics/det_scores",
                                      dets["scores"], step)
            self.logger.log_boxes(
                "diagnostics/val_boxes", np.asarray(batch["image"][0]),
                np.asarray(dets["boxes"][0]),
                labels=np.asarray(dets["labels"][0]),
                scores=np.asarray(dets["scores"][0]), step=step,
            )
            self._log_feature_diagnostic(batch, step)
        except Exception as exc:  # diagnostics must never break training
            self._warn_diagnostic_failure("val_predictions", exc)

    def _warn_diagnostic_failure(self, which: str, exc: Exception):
        """Diagnostics are best-effort, but a broken diagnostic pipeline
        must not stay invisible: surface the FIRST failure per run as a
        warning (subsequent ones are suppressed to keep logs readable)."""
        if self._diag_warned:
            return
        self._diag_warned = True
        import warnings

        warnings.warn(
            f"diagnostic logging ({which}) failed and will be skipped for "
            f"this run: {type(exc).__name__}: {exc}",
            RuntimeWarning, stacklevel=3)

    def _log_feature_diagnostic(self, batch, step: int):
        """Backbone feature colormaps — the last piece of the
        DiagnoseCenterNetLogger surface (reference image_annotate.py:169-264
        logs intermediate feature maps as mpl colormaps): channel-mean of
        every backbone pyramid level on the first validation image,
        viridis-mapped, tiled coarse->fine."""
        import cv2

        from ..utils.viz import apply_mpl_cmap, make_image_grid

        if self._feature_fn is None:
            task = self.task

            def feats(state, images):
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                if images.dtype == jnp.uint8:
                    from ..ops.preprocess import preprocess
                    from .state import _task_mean_std

                    mean, std = _task_mean_std(task)
                    images = preprocess(images, mean=mean, std=std)
                pyramid = task.model.apply(
                    variables, images, train=False,
                    method=lambda m, x, train: m.backbone(x, train))
                # channel-mean per level: one (N, H_l, W_l) map each
                return [level.mean(axis=-1) for level in pyramid]

            self._feature_fn = jax.jit(feats)
        levels = jax.device_get(self._feature_fn(self.state, batch["image"][:1]))
        size = max(l.shape[1] for l in levels)
        tiles = [
            cv2.resize(apply_mpl_cmap(np.asarray(l[0])), (size, size),
                       interpolation=cv2.INTER_NEAREST)
            for l in levels
        ]
        self.logger.log_image("diagnostics/backbone_features",
                              make_image_grid(tiles, ncols=2), step)

    def validate_detection(self) -> Dict[str, float]:
        """COCO validation epoch (reference centernet.py:202-218).

        Pipelined one deep like inference_tracking: the NEXT batch's
        forward+decode is dispatched (async) before the previous batch's
        top-k arrays are pulled to host, so the device computes while the
        host runs box conversion + evaluator accumulation."""
        evaluator = CocoEvaluator(self.task.num_classes)
        logged = not self.diagnostics

        def to_host(dets_dev):
            if jax.process_count() == 1:
                return jax.device_get(dets_dev)
            # the eval output is a GLOBAL array spanning non-addressable
            # devices; take this process's local slice (aligned with its
            # own loader's batch) before fetching
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as P

            return jax.device_get(
                multihost_utils.global_array_to_host_local_array(
                    dets_dev, self.mesh, P("data")))

        def forwarded():
            for batch in self.val_loader:
                yield batch, self.eval_step(self.state, self._shard(batch))

        it = forwarded()
        pending = next(it, None)
        while pending is not None:
            batch, dets_dev = pending
            pending = next(it, None)  # dispatch next before the D2H sync
            dets = to_host(dets_dev)
            if not logged and jax.process_index() == 0:
                self._log_prediction_diagnostic(batch, dets, int(self.state.step))
                logged = True
            boxes_xywh = convert_box_format(dets["boxes"], "xyxy", "xywh")
            n = batch["image"].shape[0]
            preds = [
                {"boxes": boxes_xywh[i], "scores": dets["scores"][i],
                 "labels": dets["labels"][i]}
                for i in range(n)
            ]
            targets = []
            for i in range(n):
                m = batch["mask"][i].astype(bool)
                entry = {"boxes": batch["boxes"][i][m],
                         "labels": batch["labels"][i][m]}
                if "iscrowd" in batch:
                    entry["iscrowd"] = batch["iscrowd"][i][m]
                if "area" in batch:
                    # annotation area: the evaluator's GT area-range source
                    # (pycocotools ann['area'] semantics)
                    entry["area"] = batch["area"][i][m]
                targets.append(entry)
            evaluator.update(preds, targets)
        # multihost: union per-process ragged prediction/target lists via
        # fixed-shape padded blocks (eval/coco.py:10-18 analog)
        if jax.process_count() > 1:
            pred_schema = {"boxes": ((4,), np.float64),
                           "scores": ((), np.float64),
                           "labels": ((), np.int64)}
            # the schema must be IDENTICAL on every process (it shapes the
            # collective); iscrowd is always present, zero-filled where the
            # dataset provided none (0 == not-crowd, the semantic default)
            tgt_schema = {"boxes": ((4,), np.float64),
                          "labels": ((), np.int64),
                          "iscrowd": ((), np.int64),
                          "area": ((), np.float64)}
            for t in evaluator.targets:
                t.setdefault("iscrowd",
                             np.zeros(len(t["labels"]), np.int64))
                # default matches the no-area evaluator fallback (box w*h)
                t.setdefault("area", (np.asarray(t["boxes"])[:, 2]
                                      * np.asarray(t["boxes"])[:, 3]))
            evaluator.preds = gather_object_lists(evaluator.preds, pred_schema)
            evaluator.targets = gather_object_lists(evaluator.targets, tgt_schema)
        return {f"val/{k}": v for k, v in evaluator.get_metrics().items()}

    def validate_tracking(self) -> Dict[str, float]:
        """MOT validation: one tracker per SEQUENCE (reset at boundaries,
        reference eval/mot_challenge.py:9-83 + fairmot.py:87-136), metrics
        combined TrackEval-style across sequences.

        Multihost: association is sequential per sequence, so frames can't
        be scattered across processes mid-sequence. Instead whole SEQUENCES
        are assigned round-robin (seq_id % process_count): each process
        re-reads the full dataset (the rank-interleaved loader shard would
        split sequences), forwards + tracks only its own sequences on its
        local devices, then the raw per-sequence results are allgathered
        and every process scores the identical union — bit-identical to a
        single-process run on the same data."""
        from ..eval.mot import evaluate_mot_tracking_sequences

        multihost = jax.process_count() > 1
        if multihost:
            src = self.val_loader
            if hasattr(src, "dataset"):
                from ..data.loader import DataLoader as _DataLoader

                loader = _DataLoader(
                    src.dataset, batch_size=src.batch_size, shuffle=False,
                    collate_fn=src.collate_fn, num_workers=src.num_workers,
                    drop_last=False, seed=src.seed,
                )
            else:
                # custom loader: trust it to yield the FULL dataset on
                # every process (sequence filtering below still applies)
                loader = src
            run_eval = self._make_local_eval_step()
            pidx, pcount = jax.process_index(), jax.process_count()
        else:
            loader = self.val_loader
            run_eval = lambda batch: jax.device_get(
                self.eval_step(self.state, self._shard(batch)))
            pidx, pcount = 0, 1

        tracker = Tracker(model=None, **self.tracker_config)
        per_seq: Dict[int, Dict[str, list]] = {}
        current_seq = None
        for batch in loader:
            n = batch["image"].shape[0]
            seq_ids = np.asarray(
                batch.get("sequence_id", np.zeros(n, np.int64)))
            mine = (seq_ids % pcount) == pidx
            if not mine.any():
                continue  # no device work for foreign sequences
            dets = run_eval(batch)
            in_h, in_w = batch["image"].shape[1:3]
            scale = np.array([in_w, in_h, in_w, in_h])
            for i in range(n):
                if not mine[i]:
                    continue
                sid = int(seq_ids[i])
                if sid != current_seq:
                    tracker.reset()
                    current_seq = sid
                entry = per_seq.setdefault(sid, {
                    "pred_bboxes": [], "pred_track_ids": [],
                    "target_bboxes": [], "target_track_ids": [],
                })
                tracker.update(
                    dets["boxes"][i] / scale,
                    dets["labels"][i], dets["scores"][i], dets["embeddings"][i],
                )
                live = [t for t in tracker.tracks if t.active]
                entry["pred_bboxes"].append(
                    [convert_box_format(t.bbox, "xyxy", "xywh") for t in live])
                entry["pred_track_ids"].append([t.track_id for t in live])
                m = batch["mask"][i].astype(bool)
                entry["target_bboxes"].append(batch["boxes"][i][m] / scale)
                entry["target_track_ids"].append(batch["ids"][i][m])
        if multihost:
            per_seq = _allgather_tracking_results(per_seq)
        metrics = evaluate_mot_tracking_sequences(
            {f"seq{k}": v for k, v in sorted(per_seq.items())})
        # per-sequence breakdowns only when there are multiple sequences
        if len(per_seq) <= 1:
            metrics = {k: v for k, v in metrics.items() if "/" not in k}
        return {f"val/{k}": v for k, v in metrics.items()}

    def _make_local_eval_step(self):
        """Per-process forward+decode on the local default device, for
        multihost tracking validation: the replicated global-mesh state is
        fully addressable on every process, so fetch it once and jit a
        plain local program (no cross-host collectives in the eval path)."""
        task = self.task
        params = jax.device_get(
            self.state.params if self.state.ema_params is None
            else self.state.ema_params)
        batch_stats = jax.device_get(self.state.batch_stats)

        @jax.jit
        def run(params, batch_stats, images):
            if images.dtype == jnp.uint8:
                from ..ops.preprocess import preprocess

                mean, std = _task_mean_std(task)
                images = preprocess(images, mean=mean, std=std)
            outputs = task.model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=False)
            return task.decode_detections(
                outputs["heatmap"], outputs["box_2d"],
                reid=outputs.get("reid"), from_logits=True)

        return lambda batch: jax.device_get(
            run(params, batch_stats, jnp.asarray(batch["image"])))


def _allgather_tracking_results(per_seq: Dict[int, Dict[str, list]],
                                _allgather=None,
                                _process_count: Optional[int] = None,
                                ) -> Dict[int, Dict[str, list]]:
    """Union per-process tracking results (sequence -> per-frame ragged
    box/id lists) across hosts via fixed-shape padded collectives (the
    gather_object_lists machinery; reference eval/coco.py:10-18 analog for
    the MOT path). Sequences are disjoint across processes (round-robin
    assignment), frames are keyed explicitly so empty frames survive."""

    def flatten(entry, box_key, id_key, sid):
        boxes, ids, frames = [], [], []
        for j, (bxs, tids) in enumerate(zip(entry[box_key], entry[id_key])):
            b = np.asarray(bxs, np.float64).reshape(-1, 4)
            boxes.append(b)
            ids.append(np.asarray(tids, np.int64).reshape(-1))
            frames.append(np.full(len(b), j, np.int64))
        b = np.concatenate(boxes) if boxes else np.zeros((0, 4), np.float64)
        i = np.concatenate(ids) if ids else np.zeros((0,), np.int64)
        f = np.concatenate(frames) if frames else np.zeros((0,), np.int64)
        return {"boxes": b, "ids": i, "frame": f,
                "seq": np.full(len(b), sid, np.int64)}

    meta_items, pred_items, tgt_items = [], [], []
    for sid, entry in sorted(per_seq.items()):
        n_frames = len(entry["pred_bboxes"])
        meta_items.append(
            {"info": np.asarray([[sid, n_frames]], np.int64)})
        pred_items.append(flatten(entry, "pred_bboxes", "pred_track_ids", sid))
        tgt_items.append(
            flatten(entry, "target_bboxes", "target_track_ids", sid))

    kw = {"_allgather": _allgather, "_process_count": _process_count}
    meta = gather_object_lists(meta_items, {"info": ((2,), np.int64)}, **kw)
    schema = {"boxes": ((4,), np.float64), "ids": ((), np.int64),
              "frame": ((), np.int64), "seq": ((), np.int64)}
    preds = gather_object_lists(pred_items, schema, **kw)
    tgts = gather_object_lists(tgt_items, schema, **kw)

    out: Dict[int, Dict[str, list]] = {}
    for m in meta:
        sid, nf = int(m["info"][0, 0]), int(m["info"][0, 1])
        out[sid] = {
            "pred_bboxes": [np.zeros((0, 4)) for _ in range(nf)],
            "pred_track_ids": [np.zeros((0,), np.int64) for _ in range(nf)],
            "target_bboxes": [np.zeros((0, 4)) for _ in range(nf)],
            "target_track_ids": [np.zeros((0,), np.int64)
                                 for _ in range(nf)],
        }
    for items, box_key, id_key in ((preds, "pred_bboxes", "pred_track_ids"),
                                   (tgts, "target_bboxes",
                                    "target_track_ids")):
        for it in items:
            if not len(it["seq"]):
                continue
            sid = int(it["seq"][0])
            entry = out[sid]
            for j in np.unique(it["frame"]):
                sel = it["frame"] == j
                entry[box_key][int(j)] = it["boxes"][sel]
                entry[id_key][int(j)] = it["ids"][sel]
    return out
