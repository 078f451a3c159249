"""Common CLI args, logging, profiling, and device-memory telemetry.

Parity surface of ref deep_sdf/utils.py:9-115 with TPU-native
observability (SURVEY.md §5.1): the reference logged wall-clock +
torch.cuda memory counters; here ``profile_trace`` captures real
``jax.profiler`` traces and ``log_memory_usage`` reads live device
memory stats.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax


def add_common_args(arg_parser) -> None:
    """ref: deep_sdf/utils.py:9-30."""
    arg_parser.add_argument("--debug", dest="debug", default=False,
                            action="store_true",
                            help="If set, debugging messages will be printed")
    arg_parser.add_argument("--quiet", "-q", dest="quiet", default=False,
                            action="store_true",
                            help="If set, only warnings will be printed")
    arg_parser.add_argument("--log", dest="logfile", default=None,
                            help="If set, the log will be saved using the specified filename.")


def configure_logging(args) -> None:
    """ref: deep_sdf/utils.py:33-49."""
    logger = logging.getLogger()
    if getattr(args, "debug", False):
        logger.setLevel(logging.DEBUG)
    elif getattr(args, "quiet", False):
        logger.setLevel(logging.WARNING)
    else:
        logger.setLevel(logging.INFO)
    handler = logging.StreamHandler()
    formatter = logging.Formatter(
        "%(asctime)s DeepSdfTpu - %(levelname)s - %(message)s", datefmt="%H:%M:%S")
    handler.setFormatter(formatter)
    logger.addHandler(handler)
    if getattr(args, "logfile", None):
        fh = logging.FileHandler(args.logfile)
        fh.setFormatter(formatter)
        logger.addHandler(fh)


def format_memory_size(size_in_bytes: float) -> str:
    """ref: deep_sdf/utils.py:92-101."""
    units = ["B", "KiB", "MiB", "GiB", "TiB"]
    size = float(size_in_bytes)
    unit_index = 0
    while size >= 1024 and unit_index < len(units) - 1:
        size /= 1024
        unit_index += 1
    return f"{size:6.2f}{units[unit_index]}"


def device_memory_stats(device=None) -> dict:
    """Live device memory counters (replaces torch.cuda.memory_allocated,
    ref utils.py:103-115). Empty dict when the backend has no stats."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return stats or {}


def log_memory_usage(device=None) -> None:
    stats = device_memory_stats(device)
    if not stats:
        logging.debug("device memory stats unavailable on this backend")
        return
    in_use = stats.get("bytes_in_use", 0)
    peak = stats.get("peak_bytes_in_use", 0)
    limit = stats.get("bytes_limit", 0)
    logging.debug("device bytes_in_use: %s | peak: %s | limit: %s",
                  format_memory_size(in_use), format_memory_size(peak),
                  format_memory_size(limit))


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard-viewable) around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state samples/s counter for training loops (§5.1 parity:
    per-epoch timing + ETA, plus throughput)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._samples = 0
        self._steps = 0

    def update(self, n_samples: int):
        self._samples += n_samples
        self._steps += 1

    @property
    def samples_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._samples / dt if dt > 0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0
