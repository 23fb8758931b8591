"""Logging / metrics / profiling.

The reference has rank-0 Python logging with a config-encoded filename
(``main.py:67-99, 335``), W&B via accelerate (``task_trainer.py:95-100``),
and NO profiler (SURVEY.md §5.1).  Here:

  * ``setup_logger``: process-0-only stream+file logger whose filename
    encodes the experiment config;
  * ``MetricsLogger``: JSONL metrics stream (per-step loss at a configurable
    frequency like ``--wandb_freq``, per-round scores, samples/sec) with an
    optional W&B sink (gated import — never required);
  * ``trace``: a ``jax.profiler`` trace context manager for TPU profiling.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any, Dict, Optional


def experiment_name(config) -> str:
    """Config-encoded run name (analogue of ``main.py:335``)."""
    fed = config.federated
    return (
        f"{config.encoder_name}_{config.peft_mode.value}"
        f"_bs{config.batch_size}_lr{config.optimizer.lr}"
        f"_rounds{fed.comm_rounds}x{fed.local_epochs}_seed{config.seed}"
    )


def setup_logger(
    log_dir: Optional[str] = None,
    name: str = "feddat_tpu",
    level: int = logging.INFO,
    run_name: Optional[str] = None,
) -> logging.Logger:
    """Process-0 gets stream(+file) handlers; other hosts log errors only
    (the reference's rank-aware root logger, ``main.py:67-99``)."""
    import jax

    logger = logging.getLogger(name)
    logger.setLevel(level)
    if jax.process_index() != 0:
        logger.setLevel(logging.ERROR)
        return logger
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    # dedup by exact type: FileHandler subclasses StreamHandler, so an
    # isinstance check would let an earlier file-only setup suppress the
    # console handler forever
    if not any(type(h) is logging.StreamHandler for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.abspath(os.path.join(log_dir, f"{run_name or 'run'}.log"))
        # re-running setup (notebooks, programmatic main()) must not stack a
        # second handler on the same file (every record written twice)
        if not any(
            isinstance(h, logging.FileHandler) and h.baseFilename == path
            for h in logger.handlers
        ):
            fh = logging.FileHandler(path, "w")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class MetricsLogger:
    """JSONL metrics with throughput accounting and an optional W&B sink."""

    def __init__(
        self,
        path: Optional[str] = None,
        log_every: int = 100,
        wandb_project: Optional[str] = None,
        wandb_run_name: Optional[str] = None,
    ):
        self.path = path
        self.log_every = log_every
        self._fh = open(path, "a") if path else None
        self._step = 0
        self._step_t0 = None
        self._samples = 0
        self._wandb = None
        if wandb_project:
            try:  # never a hard dependency
                import wandb

                self._wandb = wandb.init(project=wandb_project, name=wandb_run_name)
            except Exception:
                self._wandb = None
        if self._fh:
            # run boundary: the JSONL appends across relaunches (resume keeps
            # prior rounds' records); a marker keeps downstream readers from
            # silently merging two runs' step streams
            self._emit({"kind": "run_start"})

    def _emit(self, record: Dict[str, Any]):
        record = {"ts": time.time(), **record}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if isinstance(v, (int, float))})
        return record

    def step(self, metrics: Dict[str, Any], batch_size: int, task_key: str = ""):
        """Per-train-step hook; logs every ``log_every`` steps with
        samples/sec since the last emission."""
        self._step += 1
        self._samples += batch_size
        if self._step_t0 is None:
            self._step_t0 = time.time()
        if self._step % self.log_every == 0:
            dt = time.time() - self._step_t0
            rec = {
                "kind": "step",
                "task": task_key,
                "step": self._step,
                "samples_per_sec": self._samples / max(dt, 1e-9),
                **{k: float(v) for k, v in metrics.items()},
            }
            self._step_t0 = time.time()
            self._samples = 0
            self._emit(rec)

    def round(self, round_idx: int, scores: Dict[str, Any], wall_s: float):
        self._emit({"kind": "round", "round": round_idx, "scores": scores, "wall_s": wall_s})

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """``jax.profiler`` trace window (view in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on jax's persistent compilation cache (works through the axon
    TPU relay too — measured 2.3s -> 0.07s on a cached re-compile).

    Default location: ``.jax_cache`` next to the repo root (override with
    ``FEDDAT_JAX_CACHE_DIR``; set it to ``off`` to disable).  Safe no-op on
    failure — callers never break because caching is unavailable.
    """
    import os

    env = os.environ.get("FEDDAT_JAX_CACHE_DIR")
    if env == "off":
        return
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
