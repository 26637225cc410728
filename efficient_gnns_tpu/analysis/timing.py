"""Inference timing + device-memory measurement.

The analog of the reference's checkpoint-evaluation/benchmark scripts
(``arxiv_pyg/test.py:88-114`` wall-clock + NVML polling around a full-graph
forward; ``mag_pyg/test.py:141-207``; ``arxiv_dgl/test_timing_{gat,sign}.py``)
— but TPU-native: memory comes from ``device.memory_stats()`` instead of
NVML, timing uses ``block_until_ready`` so the async dispatch queue can't
fake a fast forward, and the model forward is jitted once and measured over
``runs`` repetitions.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax


def device_memory_stats(device=None) -> Dict[str, int]:
    """Best-effort device memory counters (bytes). Empty dict on backends
    that expose none (CPU)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: int(stats[k]) for k in keys if k in stats}


def time_inference(
    fn: Callable,
    *args,
    runs: int = 10,
    warmup: int = 2,
    device=None,
) -> Dict[str, float]:
    """Times a jitted forward: mean/min wall-clock per call + memory.

    ``fn`` is jitted here if it isn't already; the first ``warmup`` calls
    (compile included) are excluded, matching how the reference averages
    post-warmup iterations (``arxiv_pyg/test.py:168-190``).
    """
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        times.append(time.perf_counter() - t0)
    out = {
        "mean_s": sum(times) / len(times),
        "min_s": min(times),
        "max_s": max(times),
        "runs": runs,
    }
    out.update({f"mem_{k}": v for k, v in device_memory_stats(device).items()})
    return out


def count_params(params) -> int:
    """Total trainable parameter count of a pytree (the reference prints
    this per model, e.g. ``arxiv_dgl/gat.py:382``)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def capture_trace(
    fn: Callable,
    *args,
    trace_dir: str = "logs/traces",
    steps: int = 3,
    warmup: int = 1,
) -> str:
    """Record a ``jax.profiler`` trace of ``steps`` executions of ``fn``.

    The kernel-level attribution the reference never had (its profiling is
    wall-clock ``time.time()`` + NVML polling, ``arxiv_pyg/test.py:88-114``;
    SURVEY.md §5 tracing row). View with TensorBoard's profile plugin or
    Perfetto (``trace.json.gz`` under the returned directory).

    Returns the trace directory path. ``fn`` is jitted if it isn't already.
    """
    import os

    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            with jax.profiler.StepTraceAnnotation("step", step_num=i):
                out = jfn(*args)
        jax.block_until_ready(out)
    return trace_dir


def summarize_trace(trace_dir: str, top: int = 30) -> Dict[str, float]:
    """Aggregate device-op durations (ms) by op name from a profiler trace.

    Parses the ``*.trace.json.gz`` files :func:`capture_trace` wrote and sums
    complete-event durations on TPU device tracks — the per-kernel ceiling
    attribution behind the bench's speed-of-light analysis. Returns
    ``{op_name: total_ms}`` including a ``"__total__"`` entry, and prints the
    ``top`` heaviest ops.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    by_name: Dict[str, float] = defaultdict(float)
    total = 0.0
    for path in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        pid_names = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        device_pids = {
            p for p, n in pid_names.items() if "TPU" in n or "tpu" in n
        }
        for ev in events:
            if ev.get("ph") == "X" and ev.get("pid") in device_pids:
                dur = ev.get("dur", 0) / 1e3  # us -> ms
                by_name[ev.get("name", "?")] += dur
                total += dur
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur:8.2f} ms  {name[:110]}", flush=True)
    out = dict(by_name)
    out["__total__"] = total
    return out
