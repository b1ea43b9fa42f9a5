"""Training loop: step timing, validation cadence, checkpointing, metric logging.

Replaces ``slim.learning.train`` + the manual session loops
(``train_depth_only.py:353-377``, ``train_depth_then_cam.py:315-356``).  Throughput
counters (steps/sec, frames/sec) are first-class — they are the BASELINE metric set —
and timing uses a host readback per log interval (the axon runtime's dispatch is fully
async; see utils/timing notes).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp


class MetricLogger:
    """JSONL metric stream + stdout, optionally mirrored to TensorBoard.

    Stand-in for the reference's ``tf.summary`` scalars (``split_training.py:275-282``);
    pass ``tensorboard=True`` to also emit TB event files under ``<dir>/sum`` (the
    reference's writer path, ``train_depth_then_cam.py:319``).
    """

    def __init__(self, directory: str, quiet: bool = False, tensorboard: bool = False):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.quiet = quiet
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # optional heavy dep, only on request

                self._tb = tf.summary.create_file_writer(os.path.join(directory, "sum"))
            except Exception as e:  # pragma: no cover
                print(f"tensorboard writer unavailable: {e}")

    def log(self, step: int, scope: str, values: dict):
        rec = {"step": int(step), "scope": scope}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in rec.items():
                    if k not in ("step", "scope"):
                        tf.summary.scalar(f"{scope}/{k}", v, step=int(step))
                self._tb.flush()
        if not self.quiet:
            flat = " ".join(f"{k}={v:.5g}" for k, v in rec.items() if k not in ("step", "scope"))
            print(f"[{scope}] step {step}: {flat}")

    def log_images(self, step: int, images: dict):
        """TB image summaries (uint8 [N,H,W,C]) — the reference's per-scale
        ``tf.summary.image`` set (``split_training.py:290-325``).  No-op without the
        TensorBoard writer (JSONL can't carry images)."""
        if self._tb is None:
            return
        import tensorflow as tf

        with self._tb.as_default():
            for name, img in images.items():
                tf.summary.image(name, img, step=int(step), max_outputs=img.shape[0])
            self._tb.flush()

    def log_histograms(self, step: int, hists: dict):
        """TB histogram summaries (``split_training.py:283-303``)."""
        if self._tb is None:
            return
        import tensorflow as tf

        with self._tb.as_default():
            for name, v in hists.items():
                tf.summary.histogram(name, v, step=int(step))
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def run_training(
    *,
    state,
    train_step: Callable,
    batches: Iterator[dict],
    max_steps: int,
    logger: MetricLogger,
    checkpoint=None,
    checkpoint_group: str = "model",
    save_latest_freq: int = 1000,
    validation_check: int = 0,
    val_fn: Optional[Callable] = None,
    summary_freq: int = 100,
    image_summary_fn: Optional[Callable] = None,
    image_summary_freq: int = 0,
    profile_dir: Optional[str] = None,
    profile_steps: tuple = (10, 15),
):
    """Drive ``train_step`` over ``batches`` until ``max_steps``.

    Returns the final state.  Loss schedules read the step counter carried in the
    train state (``state.step``).  ``profile_dir`` captures a ``jax.profiler`` trace of
    steps [profile_steps) — the tracing capability the reference lacks (SURVEY §5).
    """
    start = int(state.step)
    t0 = time.time()
    frames = 0
    last_metrics = None
    for step in range(start, max_steps):
        if profile_dir and step == profile_steps[0]:
            jax.profiler.start_trace(profile_dir)
        try:
            batch = next(batches)
        except StopIteration:
            break
        state, metrics = train_step(state, batch)
        frames += next(iter(batch.values())).shape[0]
        if profile_dir and step + 1 == profile_steps[1]:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()

        if summary_freq and (step + 1) % summary_freq == 0:
            metrics = {k: float(v) for k, v in metrics.items()}  # forces readback/sync
            dt = time.time() - t0
            n = step + 1 - start
            metrics["steps_per_sec"] = n / dt
            metrics["frames_per_sec"] = frames / dt
            logger.log(step + 1, "train", metrics)
            last_metrics = metrics

        if image_summary_fn and image_summary_freq and (
                step + 1) % image_summary_freq == 0:
            images, hists = image_summary_fn(state, batch)
            logger.log_images(step + 1, images)
            logger.log_histograms(step + 1, hists)

        if validation_check and val_fn and (step + 1) % validation_check == 0:
            val = val_fn(state)
            if val is not None:
                logger.log(step + 1, "val", {k: float(v) for k, v in val.items()})

        if checkpoint is not None and (step + 1) % save_latest_freq == 0:
            checkpoint.save(step + 1, {checkpoint_group: _save_tree(state)})

    if checkpoint is not None and checkpoint.latest_step() != int(state.step):
        checkpoint.save(int(state.step), {checkpoint_group: _save_tree(state)}, force=True)
    return state, last_metrics


def _save_tree(state):
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def load_into_state(state, tree):
    """Restore a saved group into a TrainState (shapes must match)."""
    return state.replace(
        step=jnp.asarray(tree["step"]),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
