"""Print the one-line environment record that heads SWEEP_r{N}.log
(VERDICT r13 #6): the bench's Spark-free cpu/io probes + load, so a
throttled-disk or noisy-neighbor sweep is visible in the artifact
itself (the r13 bench run 3 lesson, extended to sweeps).

Usage: python tools/sweep_probes.py   # first line of the sweep log
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def probe_line() -> str:
    cpu = bench._cpu_probe()
    io = bench._io_probe()
    return "# sweep_env " + json.dumps(
        {
            "load1": round(os.getloadavg()[0], 2),
            "load15": round(os.getloadavg()[2], 2),
            "cpu_probe_st_sec": cpu.get("st_sec"),
            "cpu_probe_mt_sec": cpu.get("mt32_sec") or cpu.get("mt_sec"),
            "io_fsync_ms": io.get("fsync_4k_ms_each"),
            "io_seq_mib_s": io.get("seq_mib_per_sec"),
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    print(probe_line())
    sys.exit(0)
