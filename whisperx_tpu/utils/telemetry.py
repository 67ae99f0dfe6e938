"""Observability: stage timers, audio-seconds/s counters, profiler traces.

The reference has no tracing at all — progress is bare prints
(whisperx/asr.py:219-222, transcribe.py:175). Production serving needs more:
this module provides per-stage wall-clock + realtime-factor counters (the
north-star metric is audio-seconds processed per second), structured logging,
and optional JAX profiler capture for TPU timeline analysis.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

logger = logging.getLogger("whisperx_tpu")


@dataclass
class StageStats:
    seconds: float = 0.0
    calls: int = 0
    audio_seconds: float = 0.0

    @property
    def realtime_factor(self) -> float:
        return self.audio_seconds / self.seconds if self.seconds > 0 else 0.0


class PipelineTelemetry:
    """Accumulates per-stage timings across a pipeline run."""

    def __init__(self):
        self.stages: Dict[str, StageStats] = {}

    @contextlib.contextmanager
    def stage(self, name: str, audio_seconds: float = 0.0):
        stats = self.stages.setdefault(name, StageStats())
        t0 = time.perf_counter()
        try:
            yield stats
        finally:
            dt = time.perf_counter() - t0
            stats.seconds += dt
            stats.calls += 1
            stats.audio_seconds += audio_seconds
            logger.debug(
                "stage=%s dt=%.3fs audio=%.1fs xRT=%.1f",
                name, dt, audio_seconds, audio_seconds / dt if dt > 0 else 0,
            )

    def record(self, name: str, seconds: float, audio_seconds: float = 0.0):
        """Accumulate an externally-timed stage (non-context-manager form)."""
        stats = self.stages.setdefault(name, StageStats())
        stats.seconds += seconds
        stats.calls += 1
        stats.audio_seconds += audio_seconds
        logger.debug(
            "stage=%s dt=%.3fs audio=%.1fs xRT=%.1f",
            name, seconds, audio_seconds, audio_seconds / seconds if seconds > 0 else 0,
        )

    def report(self) -> dict:
        return {
            name: {
                "seconds": round(s.seconds, 4),
                "calls": s.calls,
                "audio_seconds": round(s.audio_seconds, 2),
                "x_realtime": round(s.realtime_factor, 2),
            }
            for name, s in self.stages.items()
        }

    def log_report(self):
        logger.info("pipeline stats: %s", json.dumps(self.report()))


# Process-wide collector for the stages that run outside a WhisperPipeline
# instance (align(), diarization) — the CLI and library flows both land here,
# so telemetry.GLOBAL.report() covers the whole job.
GLOBAL = PipelineTelemetry()


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Capture a JAX profiler trace (TensorBoard format) around a block."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def configure_logging(level: str = "INFO", structured: bool = False):
    """Install a handler for the framework logger (idempotent)."""
    handler = logging.StreamHandler()
    if structured:
        class JsonFormatter(logging.Formatter):
            def format(self, record):
                return json.dumps(
                    {
                        "t": round(record.created, 3),
                        "level": record.levelname,
                        "logger": record.name,
                        "msg": record.getMessage(),
                    }
                )

        handler.setFormatter(JsonFormatter())
    else:
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
    logger.handlers[:] = [handler]
    logger.setLevel(level)
    return logger
