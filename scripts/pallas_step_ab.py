"""Mode-controlled A/B: the Eat-Rate packed train step with the Pallas
table-sweep update kernel ON vs OFF, interleaved in ONE process.

Why: the end-to-end bench's step rate swings ~2x BETWEEN processes
(516k..1.13M ex/s for the same program) and XLA's scatter lowering is the
known bimodal term (ops/pallas/SPARSE_UPDATE_NOTES.md). The sweep kernel is
flat-access and stable; at 2^25 it measured a tie with XLA's FAST mode on
the isolated update op. This script answers, for the FULL bench step
(b=25 LR, batch-mean counts riding the batch): does forcing the kernel pin
the step near the fast mode? Per-environment rules (CLAUDE.md), only
interleaved same-process timings are comparable — run it a few times to see
both XLA modes.

Usage: python scripts/pallas_step_ab.py [--rows 500000] [--reps 4] [--windows 3]
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import bench as B
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.config.model_instance import ModelInstance
    from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
    from fwumious_wabbit_tpu.models.model import FwModel
    from fwumious_wabbit_tpu.train.loop import native_batch_stream
    from fwumious_wabbit_tpu.train import packed as packed_mod

    import jax

    data = B.ensure_dataset(args.rows)
    K = 8

    setups = {}
    for mode in ("off", "on"):
        argv = B._base_argv(data) + ["--fwt_pallas_update", mode]
        a = build_parser().parse_args(argv)
        vw = VwNamespaceMap.from_dataset_dir(a.data)
        mi = ModelInstance.from_cmdline(a, vw)
        model = FwModel(mi, precision="default")
        staged = []
        spec = ((), (), (), ())
        for bd, _k in native_batch_stream(a, mi, vw, 32768,
                                          count_keys={"lr": 0}):
            bd, *spec = packed_mod.prepare_for_transfer(bd, mi)
            staged.append(bd)
            if len(staged) >= K:
                break
        lay = packed_mod.layout_of(staged[0], *spec)
        buf = jax.device_put(packed_mod.pack(lay, staged))
        step = packed_mod.make_packed_train_step(model, lay, K)
        params = model.init_params()
        for _ in range(3):  # compile + donation warm-up
            params, preds = step(params, buf)
        _ = float(preds[0, 0])
        setups[mode] = [step, params, buf]

    print(f"# interleaved windows ({args.windows}x{args.reps} reps/mode, "
          f"B=32768 K={K})")
    rates = {"off": [], "on": []}
    for w in range(args.windows):
        for mode in ("off", "on"):
            step, params, buf = setups[mode]
            t0 = time.perf_counter()
            for _ in range(args.reps):
                params, preds = step(params, buf)
            _ = float(preds[-1, -1])  # force completion
            dt = time.perf_counter() - t0
            setups[mode][1] = params
            r = args.reps * K * 32768 / dt
            rates[mode].append(r)
            print(f"window {w} pallas={mode}: {r:,.0f} ex/s "
                  f"({dt / args.reps * 1e3:.1f} ms/superbatch)")
    for mode in ("off", "on"):
        print(f"pallas={mode}: mean {np.mean(rates[mode]):,.0f} "
              f"best {max(rates[mode]):,.0f} ex/s")


if __name__ == "__main__":
    main()
