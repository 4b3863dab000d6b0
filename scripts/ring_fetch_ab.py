"""Mode-controlled A/B: end-to-end train with the prediction fetch ring
(--fwt_fetch_stack M) vs per-step fetches, interleaved in ONE process.

The ring (train/packed.py make_packed_train_step_ring) cuts D2H fetch RPCs
M× with zero extra dispatches. Per-step async fetches overlap fine in GOOD
tunnel windows (the earlier jnp.stack variant measured ~4% slower there);
the ring targets BAD windows, where fetch RPCs head-of-line-block the
uplink (measured: with -p collapses to 75–151k ex/s while no -p runs
399–506k). Interleaving pairs in one process controls for the tunnel's
minute-scale bandwidth swings; run during both good and bad windows.

Usage: python scripts/ring_fetch_ab.py [--rows 500000] [--m 4] [--reps 3]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench as B
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.config.model_instance import ModelInstance
    from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
    from fwumious_wabbit_tpu.models.model import FwModel
    from fwumious_wabbit_tpu.train.loop import run_train_loop

    data = B.ensure_dataset(args.rows)
    argv = B._base_argv(data)
    a1 = build_parser().parse_args(argv + ["--fwt_fetch_stack", "1"])
    aM = build_parser().parse_args(argv + ["--fwt_fetch_stack", str(args.m)])
    vw = VwNamespaceMap.from_dataset_dir(a1.data)
    mi = ModelInstance.from_cmdline(a1, vw)
    model = FwModel(mi, precision="default")

    run_train_loop(a1, mi, vw, model)  # warm both programs
    run_train_loop(aM, mi, vw, model)

    rates = {1: [], args.m: []}
    for rep in range(args.reps):
        for m, a in ((1, a1), (args.m, aM)):
            r = run_train_loop(a, mi, vw, model)
            ex_s = r["examples"] / r["elapsed"]
            rates[m].append(ex_s)
            print(f"rep {rep} M={m}: {ex_s:,.0f} ex/s")
    for m, rs in rates.items():
        print(f"M={m}: mean {np.mean(rs):,.0f} best {max(rs):,.0f} ex/s")


if __name__ == "__main__":
    main()
