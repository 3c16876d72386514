"""Device-memory and per-program shape/HBM reporting.

TPU-native analogue of the reference profiler's ``record_shapes=True,
profile_memory=True, with_stack=True`` (reference train.py:44-47): under
XLA the interesting memory facts are static per *compiled program* —
argument/output/temp HBM and generated code size are known at compile time
(``Compiled.memory_analysis()``), and the dynamic side is the set of live
device buffers (``jax.live_arrays()``). Both are captured here:

- :func:`program_memory_summary` — per-program HBM budget + FLOPs/bytes
  from a lowered+compiled jit (works AOT, any backend, no execution).
- :func:`live_buffer_table` — resident device buffers aggregated by
  (shape, dtype), the runtime "what is holding HBM right now" view.
- :func:`dump_heap_profile` — ``jax.profiler.device_memory_profile()``
  (pprof format). OFF by default: on PJRT C-API plugins missing
  ``PJRT_Executable_SizeOfGeneratedCodeInBytes`` (the axon tunnel plugin,
  observed on jax 0.9.0) the call FATALLY ABORTS the process. Enable with
  ``MEMPROF_HEAP=1``, or ``MEMPROF_HEAP=probe`` to test support in a
  throwaway subprocess first (itself opt-in: the probe spins up a second
  JAX backend, which exclusive-ownership TPU runtimes reject or block).

``train.JaxProfiler`` writes both views alongside each trace cycle;
``scripts/memory_report.py`` emits the standalone per-program report
(packed corrector at full-volume shape, train step at the reference mix
and at batch 96).
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Dict, Iterable, Optional

import jax

_HEAP_PROBE: Optional[bool] = None


def program_memory_summary(compiled) -> Dict[str, float]:
    """HBM budget + cost facts for one compiled XLA program.

    ``compiled`` is a ``jax.stages.Compiled`` (``jit(f).lower(...)
    .compile()``). Returns sizes in bytes plus flops/bytes-accessed when the
    backend reports them (missing entries are simply absent)."""
    out: Dict[str, float] = {}
    ma = compiled.memory_analysis()
    if ma is not None:
        for k in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
            "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                out[k] = int(v)
        # peak static HBM the program needs on top of whatever produced its
        # arguments: args + outputs + scratch (aliased bytes are counted in
        # arguments already)
        out["program_hbm_bytes"] = (
            out.get("argument_size_in_bytes", 0)
            + out.get("output_size_in_bytes", 0)
            + out.get("temp_size_in_bytes", 0)
            - out.get("alias_size_in_bytes", 0)
        )
    try:
        ca = compiled.cost_analysis()
    except Exception:  # some backends raise instead of returning None
        ca = None
    if ca:
        for src, dst in (("flops", "flops"), ("bytes accessed", "bytes_accessed")):
            if src in ca:
                out[dst] = float(ca[src])
    return out


def live_buffer_table(top: int = 30) -> Dict:
    """Aggregate live device arrays by (shape, dtype, committed device).

    Returns ``{"total_bytes": int, "n_buffers": int, "rows": [...]}`` with
    rows sorted by total bytes descending, at most ``top`` rows (the rest
    folded into a final "...other" row)."""
    agg: Dict[tuple, list] = {}
    total = 0
    n = 0
    for a in jax.live_arrays():
        try:
            key = (str(a.shape), str(a.dtype),
                   ",".join(sorted(str(d) for d in a.sharding.device_set)))
            nbytes = int(a.nbytes)
        except Exception:  # deleted/donated between listing and inspection
            continue
        ent = agg.setdefault(key, [0, 0])
        ent[0] += nbytes
        ent[1] += 1
        total += nbytes
        n += 1
    rows = [
        {"shape": k[0], "dtype": k[1], "devices": k[2],
         "bytes": v[0], "count": v[1]}
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1][0])
    ]
    if len(rows) > top:
        rest = rows[top:]
        rows = rows[:top] + [{
            "shape": f"...other ({len(rest)} kinds)", "dtype": "", "devices": "",
            "bytes": sum(r["bytes"] for r in rest),
            "count": sum(r["count"] for r in rest),
        }]
    return {"total_bytes": total, "n_buffers": n, "rows": rows}


def format_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:.2f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.2f} GiB"


def format_live_buffer_table(table: Dict) -> str:
    lines = [
        f"live device buffers: {table['n_buffers']}  "
        f"total {format_bytes(table['total_bytes'])}",
        f"{'bytes':>12}  {'count':>5}  {'dtype':<10} shape",
    ]
    for r in table["rows"]:
        lines.append(
            f"{format_bytes(r['bytes']):>12}  {r['count']:>5}  "
            f"{r['dtype']:<10} {r['shape']}"
        )
    return "\n".join(lines)


def heap_profile_supported() -> bool:
    """Whether to attempt ``device_memory_profile`` in-process.

    On PJRT C-API plugins without SizeOfGeneratedCodeInBytes the call is a
    LOG(FATAL) — an uncatchable process abort — so it is OFF by default.
    ``MEMPROF_HEAP=1`` force-enables (operator knows the backend survives);
    ``MEMPROF_HEAP=probe`` tests it once in an expendable subprocess — but
    note the probe initializes a second JAX backend, which on runtimes with
    exclusive device ownership (standard TPU hosts) fails or blocks for its
    timeout, so probing is itself opt-in rather than the default."""
    global _HEAP_PROBE
    env = os.environ.get("MEMPROF_HEAP", "0")
    if env == "probe":
        if _HEAP_PROBE is None:
            try:
                rc = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; jax.profiler.device_memory_profile()"],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    timeout=180, env=os.environ.copy(),
                ).returncode
                _HEAP_PROBE = rc == 0
            except Exception:
                _HEAP_PROBE = False
        return _HEAP_PROBE
    return env == "1"


def dump_heap_profile(path) -> bool:
    """Write the pprof-format device memory profile to ``path`` when heap
    profiling is enabled (MEMPROF_HEAP=1/probe — see
    :func:`heap_profile_supported`); returns whether a file was written."""
    if not heap_profile_supported():
        return False
    data = jax.profiler.device_memory_profile()
    with open(path, "wb") as f:
        f.write(data)
    return True


def write_memory_snapshot(directory, tag: str) -> list:
    """The per-trace-cycle memory artifact set (JaxProfiler hook): a
    human-readable live-buffer table (always) + the pprof heap profile
    (MEMPROF_HEAP opt-in). Returns the paths written."""
    os.makedirs(directory, exist_ok=True)
    written = []
    txt = os.path.join(directory, f"memory_{tag}.txt")
    with open(txt, "w") as f:
        f.write(format_live_buffer_table(live_buffer_table()) + "\n")
    written.append(txt)
    prof = os.path.join(directory, f"memory_{tag}.prof")
    if dump_heap_profile(prof):
        written.append(prof)
    return written
