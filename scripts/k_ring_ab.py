"""Same-process interleaved A/B of superbatch K and the fetch ring.

Device-side timings on this TPU swing ~2x BETWEEN processes (CLAUDE.md),
so only mode-controlled A/Bs interleaved in ONE process are comparable.
Each config gets its own dataset copy so pack caches don't thrash
(the pack-cache signature includes K).

Usage: python scripts/k_ring_ab.py [--reps 3] [--rows 1000000]
"""

import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402
from fwumious_wabbit_tpu.config.cmdline import build_parser  # noqa: E402
from fwumious_wabbit_tpu.config.model_instance import ModelInstance  # noqa: E402
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap  # noqa: E402
from fwumious_wabbit_tpu.models.model import FwModel  # noqa: E402
from fwumious_wabbit_tpu.train.loop import (  # noqa: E402
    configure_compile_cache, run_train_loop,
)


def main() -> int:
    reps = 3
    rows = 1_000_000
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    configure_compile_cache()
    data = bench.ensure_dataset(rows)

    configs = [
        ("K8", 8, 0), ("K8+ring4", 8, 4),
    ]
    if "--full" in sys.argv:
        configs += [("K16", 16, 0), ("K16+ring4", 16, 4)]
    # private dataset copy per K so each records its own caches
    paths = {}
    for name, k, _m in configs:
        p = bench.CACHE_DIR / f"ab_k{k}.vw"
        if not p.exists():
            shutil.copy(data, p)
        paths[name] = p

    ctx = {}
    for name, k, m in configs:
        argv = bench._base_argv(paths[name]) + [
            "--fwt_superbatch", str(k), "--fwt_fetch_stack", str(m), "-c"]
        args = build_parser().parse_args(argv)
        vw = VwNamespaceMap.from_dataset_dir(args.data)
        mi = ModelInstance.from_cmdline(args, vw)
        model = FwModel(mi, precision="default")
        ctx[name] = (args, mi, vw, model)
        t0 = time.time()
        run_train_loop(args, mi, vw, model)  # warm: cache + pack + compile
        print(f"# warm {name}: {time.time() - t0:.1f}s", file=sys.stderr)

    results = {name: [] for name, _, _ in configs}
    cpu = {name: [] for name, _, _ in configs}
    for rep in range(reps):
        for name, _k, _m in configs:
            args, mi, vw, model = ctx[name]
            r = run_train_loop(args, mi, vw, model)
            ex_s = r["examples"] / r["elapsed"]
            results[name].append(round(ex_s))
            c = r["counters"]
            cpu[name].append(round(c.get("process_cpu_s", 0.0)
                                   / r["elapsed"], 3))
            print(f"# rep{rep} {name}: {ex_s:,.0f} ex/s "
                  f"(cpu_util {cpu[name][-1]}, device "
                  f"{c['dispatch_s'] + c['fetch_force_s']:.2f}s, "
                  f"xfer {c['xfer_busy_s']:.2f}s, producer "
                  f"{c['producer_busy_s']:.2f}s)", file=sys.stderr)
    print(json.dumps({"cache_train": results, "cpu_util": cpu}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
