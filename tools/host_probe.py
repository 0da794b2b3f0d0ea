"""Host-window calibration probe: compute AND memory-bandwidth scaling.

Usage:
    python tools/host_probe.py [lo] [hi]     # default 8 32

Prints one JSON line:
    {"cpu": <ratio>, "mem": <ratio>, "lo": L, "hi": H}

Both ratios are (hi-procs aggregate throughput / lo-procs) / (hi/lo) — 1.0
means the host scales the process count perfectly; lower means a co-tenant
is eating the resource. The two resources fail INDEPENDENTLY here: a
co-tenant can saturate the memory bus while leaving CPUs idle (observed
mem=0.10 with cpu=0.88), which slows bandwidth-bound stages (text sorts,
big shuffles) invisibly to a compute-only probe. BASELINE.md calibration:
compare benchmark numbers to recorded bands only when BOTH read >= ~0.85
(ER's sketch-carry pipelines tolerate low mem ratios far better than the
text-heavy crawl chain).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import importlib.util as _iu

_spec = _iu.spec_from_file_location(
    "_benchmod", __file__.rsplit("/", 2)[0] + "/bench.py"
)
_bench = _iu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else lo * 4
    print(
        json.dumps(
            {
                "cpu": _bench._raw_cpu_probe(lo, hi),
                "mem": _bench._mem_bw_probe(lo, hi),
                "lo": lo,
                "hi": hi,
            }
        )
    )


if __name__ == "__main__":
    main()
