"""Training/validation driver loop.

Replaces the Lightning Trainer usage of the reference (`cli.py`,
`lightning.py`): epoch loop over the host loader, sharded device feed,
jitted SPMD steps, epoch-mean metric aggregation (Lightning's
`on_epoch=True` semantics, `lightning.py:33-62` — cross-device reduction
falls out of the sharded mean inside the step), best/last checkpointing,
JSONL + console metric logging, per-step timing in audio-seconds/sec
(the BASELINE.json north-star), and media logging on val batch 0.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.parallel.mesh import make_mesh, shard_batch
from mod_extraction_tpu.paths import ensure_dir
from mod_extraction_tpu.train.checkpoints import CheckpointManager

log = logging.getLogger(__name__)


def _mean_metrics(acc: list[Dict[str, Any]]) -> Dict[str, float]:
    """Mean over per-step metric dicts.

    Values may be live device scalars — sum on device first so the epoch
    costs ONE host pull per key instead of one per step (each pull is a
    full tunnel round trip on remote-TPU hosts)."""
    if not acc:
        return {}
    sums = acc[0]
    for m in acc[1:]:
        sums = {k: sums[k] + m[k] for k in sums}
    return {k: float(v) / len(acc) for k, v in sums.items()}


class MetricLogger:
    """Console + JSONL + TensorBoard metric sink (reference: TensorBoard
    always on + optional wandb, `cli.py:39-45,152-160`).

    TensorBoard events are written with the tensorboard package's own
    pure-python `EventFileWriter` (no TF / torch dependency) so existing
    TB tooling can plot the runs; if the package is absent the sink
    degrades to JSONL/console with one warning (the JSONL file remains
    the canonical record either way)."""

    def __init__(self, out_dir: str, run_name: str, tensorboard: bool = True) -> None:
        self.path = os.path.join(ensure_dir(out_dir), f"{run_name}_metrics.jsonl")
        self._tb = None
        self._tb_dir = os.path.join(out_dir, f"{run_name}_tb")
        self._tb_wanted = tensorboard

    def _tb_writer(self):
        if self._tb is None and self._tb_wanted:
            try:
                from tensorboard.summary.writer.event_file_writer import (
                    EventFileWriter,
                )

                self._tb = EventFileWriter(ensure_dir(self._tb_dir))
            except Exception as e:  # pragma: no cover - env-dependent
                self._tb_wanted = False
                log.warning("tensorboard unavailable (%s); JSONL only", e)
        return self._tb

    def _log_tb(self, payload: Dict[str, Any]) -> None:
        tb = self._tb_writer()
        if tb is None:
            return
        from tensorboard.compat.proto.event_pb2 import Event
        from tensorboard.compat.proto.summary_pb2 import Summary

        step = int(payload.get("step", payload.get("epoch", 0)))
        values = [
            Summary.Value(tag=k, simple_value=float(v))
            for k, v in payload.items()
            if k not in ("phase", "step", "epoch") and isinstance(v, (int, float))
        ]
        if values:
            tb.add_event(
                Event(wall_time=time.time(), step=step,
                      summary=Summary(value=values))
            )

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def log(self, payload: Dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(payload) + "\n")
        self._log_tb(payload)
        parts = "  ".join(
            f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in payload.items()
        )
        log.info(parts)
        print(parts, flush=True)


class Trainer:
    def __init__(
        self,
        task,
        data_module,
        max_epochs: int = 400,
        out_dir: str = "out",
        run_name: str = "run",
        seed: int = 42,
        mesh: Optional[Any] = None,
        media_callback: Optional[Callable] = None,
        media_every_n_epochs: int = 10,
        log_every_n_steps: int = 50,
        steps_per_dispatch: int = 1,
        resume: bool = False,
        lr=None,  # float, or schedule fn of global_step (display only)
        profile_dir: Optional[str] = None,
        check_finite: bool = True,
        warm_start_params: Optional[Any] = None,
    ) -> None:
        self.task = task
        self.dm = data_module
        self.max_epochs = max_epochs
        self.seed = seed
        self.mesh = mesh if mesh is not None else make_mesh()
        self.run_name = run_name
        self.out_dir = ensure_dir(out_dir)
        self.metrics = MetricLogger(out_dir, run_name)
        self.ckpts = CheckpointManager(os.path.join(out_dir, run_name + "_ckpts"))
        self.media_callback = media_callback
        # media logging is expensive on remote-TPU hosts (the callback
        # pulls full audio batches over the ~45MB/s tunnel and renders
        # matplotlib figures on the host) — default to every 10th epoch
        # rather than the reference's every-val-epoch wandb push
        self.media_every_n_epochs = max(1, int(media_every_n_epochs))
        self.log_every_n_steps = log_every_n_steps
        # compiled multi-step dispatch: group N train steps into ONE
        # device program (task.train_steps, a lax.scan of updates),
        # amortizing per-step dispatch cost (neutral on an idle tunnel
        # where async dispatch hides the round trip; matters for small
        # batches / busy hosts).  Needs the task to expose train_steps;
        # logging stays per-step (the scan returns stacked metrics).
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.resume = resume
        # ConsoleLRMonitor analog (`callbacks.py:22-34`): log the LR with
        # every step line (fixed-LR optimizers in all reference configs)
        self.lr = lr
        # jax.profiler hook (SURVEY §5.1): trace a few steady-state steps
        self.profile_dir = profile_dir
        self._profiling = False
        # NaN/Inf guard (SURVEY §5.2): metrics reach the host anyway, so
        # checking them is free; fail fast instead of training on NaNs
        self.check_finite = check_finite
        # bare-weights warm start (used when a run continues from an
        # exported models/*.npz after its out/ checkpoint dir is gone);
        # a restorable `last` checkpoint always takes precedence.  May be
        # a zero-arg callable, invoked only if actually needed.
        self.warm_start_params = warm_start_params
        # device-resident corpus array (set by _attach_corpus)
        self.corpus = None

    def _attach_corpus(self) -> None:
        """Device-resident corpus (data/corpus.py): upload once, replicated
        on the mesh.  Held by the TRAINER and passed to every step as an
        ordinary argument — never trace-time-captured by the task, so one
        compiled step evaluates whatever corpus each call supplies."""
        payload = getattr(self.dm, "corpus_payload", lambda: None)()
        if payload is not None:
            from mod_extraction_tpu.parallel.mesh import put_replicated

            self.corpus = put_replicated(payload, self.mesh)

    def _device_batches(self, loader, epoch: int, depth: int = 2):
        """Iterate a loader epoch with batches already sharded on device.

        The host->device transfer (`shard_batch`) runs in a side thread a
        couple of batches ahead, so H2D copies overlap the previous
        step's compute instead of serializing in the step loop — the
        main live-training-vs-bench gap (the bench reuses one resident
        batch and pays no feed at all)."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)
        err: list = []
        stop = threading.Event()  # set when the consumer abandons the epoch

        def _put(item) -> bool:
            """Bounded put that gives up once the consumer is gone —
            otherwise an abandoned epoch (NaN guard, KeyboardInterrupt)
            would leave this thread blocked forever holding `depth`
            device-resident batches."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in loader.epoch(epoch):
                    if stop.is_set() or not _put(shard_batch(b, self.mesh)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                _put(None)

        threading.Thread(target=worker, daemon=True).start()
        try:
            while True:
                b = q.get()
                if b is None:
                    if err:
                        raise err[0]
                    return
                yield b
        finally:
            stop.set()
            while not q.empty():  # unblock a pending put promptly
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def fit(self) -> Any:
        self.dm.setup("fit")
        self._attach_corpus()
        key = jax.random.PRNGKey(self.seed)
        state = self.task.init_state(key)
        start_epoch = 0
        restored = self.ckpts.restore("last", state) if self.resume else None
        if restored is not None:
            state = restored
            meta_path = os.path.join(self.ckpts.ckpt_dir, "last.json")
            if os.path.isfile(meta_path):
                with open(meta_path) as f:
                    start_epoch = json.load(f).get("epoch", -1) + 1
            log.info("Resumed from epoch %d", start_epoch)
        elif self.warm_start_params is not None:
            ws = self.warm_start_params
            state = state.replace(params=ws() if callable(ws) else ws)
            log.info("Warm-started params (fresh optimizer state)")

        train_loader = self.dm.train_loader()
        val_loader = self.dm.val_loader()
        sr = self.dm.render_cfg.sr
        n_samples = self.dm.render_cfg.n_samples
        audio_sec_per_batch = self.dm.batch_size * n_samples / sr

        global_step = int(np.asarray(state.step))
        spd = (
            self.steps_per_dispatch
            if hasattr(self.task, "train_steps")
            else 1
        )
        for epoch in range(start_epoch, self.max_epochs):
            train_acc = []
            t_epoch = time.time()
            t_step = time.time()

            def after_step(metrics):
                """Per-step bookkeeping: accumulate metrics (as device
                scalars — pulling them here would block on the step and
                serialize the pipeline; they are materialized at log
                points and at the epoch mean), advance the step counter,
                and emit the windowed log line."""
                nonlocal global_step, t_step
                train_acc.append(metrics)
                global_step += 1
                if global_step % self.log_every_n_steps == 0:
                    last = {k: float(v) for k, v in train_acc[-1].items()}
                    if self.check_finite:
                        # NaN anywhere in the window poisons the mean, so
                        # one device-side reduction + one scalar pull
                        # checks every step since the last log point (not
                        # just the latest) without extra transfers
                        window = train_acc[-self.log_every_n_steps :]
                        losses = [m["loss"] for m in window if "loss" in m]
                        window_mean = (
                            float(jnp.stack(losses).mean()) if losses else 0.0
                        )
                        if not np.isfinite(window_mean):
                            raise FloatingPointError(
                                f"non-finite loss within the last "
                                f"{len(window)} steps (at step "
                                f"{global_step}): latest={last}"
                            )
                    dt = time.time() - t_step
                    payload = {
                        "phase": "train_step",
                        "step": global_step,
                        "audio_sec_per_sec": self.log_every_n_steps
                        * audio_sec_per_batch
                        / dt,
                        **last,
                    }
                    if self.lr is not None:
                        payload["lr"] = (
                            self.lr(global_step) if callable(self.lr) else self.lr
                        )
                    self.metrics.log(payload)
                    t_step = time.time()

            def maybe_profile(n_ahead: int) -> None:
                # jax.profiler hook (SURVEY §5.1): trace the dispatch(es)
                # covering steady-state steps 10..15
                if (
                    self.profile_dir
                    and not self._profiling
                    and global_step <= 10 < global_step + n_ahead
                ):
                    jax.profiler.start_trace(ensure_dir(self.profile_dir))
                    self._profiling = True
                elif self._profiling and global_step >= 15:
                    jax.profiler.stop_trace()
                    self._profiling = False
                    self.profile_dir = None

            if spd <= 1:
                for batch in self._device_batches(train_loader, epoch):
                    maybe_profile(1)
                    step_key = jax.random.fold_in(key, global_step)
                    state, metrics = self.task.train_step(
                        state, batch, step_key, self.corpus
                    )
                    after_step(metrics)
            else:
                group: list = []

                def flush_group():
                    nonlocal state
                    if not group:
                        return
                    n = len(group)
                    maybe_profile(n)
                    batches = jax.tree.map(
                        lambda *xs: jnp.stack(xs), *group
                    )
                    keys = jnp.stack(
                        [
                            jax.random.fold_in(key, global_step + i)
                            for i in range(n)
                        ]
                    )
                    state, ms = self.task.train_steps(
                        state, batches, keys, self.corpus
                    )
                    for i in range(n):
                        after_step({k: v[i] for k, v in ms.items()})
                    group.clear()

                for batch in self._device_batches(train_loader, epoch):
                    group.append(batch)
                    if len(group) == spd:
                        flush_group()
                flush_group()
            if self._profiling:  # epoch shorter than the trace window
                jax.profiler.stop_trace()
                self._profiling = False
                self.profile_dir = None

            val_metrics = self.validate(state, val_loader, epoch)
            epoch_time = time.time() - t_epoch
            payload = {
                "phase": "epoch",
                "epoch": epoch,
                "step": global_step,
                "epoch_time_s": epoch_time,
            }
            payload.update({f"train/{k}": v for k, v in _mean_metrics(train_acc).items()})
            payload.update({f"val/{k}": v for k, v in val_metrics.items()})
            self.metrics.log(payload)

            if self.check_finite:
                # epoch-boundary guard: never checkpoint NaN params (the
                # in-epoch check only fires at log points)
                bad = {
                    k: v for k, v in payload.items()
                    if isinstance(v, float) and not np.isfinite(v)
                }
                if bad:
                    raise FloatingPointError(
                        f"non-finite epoch metrics at epoch {epoch}: {bad}"
                    )
            self.ckpts.save_last(state, epoch, global_step)
            if "loss" in val_metrics:
                self.ckpts.maybe_save_best(state, val_metrics["loss"], epoch, global_step)
        self.metrics.close()
        return state

    def validate(self, state, val_loader=None, epoch: int = 0) -> Dict[str, float]:
        if val_loader is None:
            self.dm.setup("validate")
            self._attach_corpus()
            val_loader = self.dm.val_loader()
        key = jax.random.PRNGKey(self.seed + 1)
        acc = []
        params = state.params if hasattr(state, "params") else state
        for i, batch in enumerate(val_loader.epoch(epoch)):
            batch = shard_batch(batch, self.mesh)
            metrics = self.task.val_step(
                params, batch, jax.random.fold_in(key, i), self.corpus
            )
            acc.append(metrics)  # device scalars; materialized in the mean
            if (
                i == 0
                and self.media_callback is not None
                and epoch % self.media_every_n_epochs == 0
            ):
                self.media_callback(self, params, batch, epoch)
        return _mean_metrics(acc)
