"""A REAL two-process `jax.distributed` run (CPU backend, 4 virtual devices
per process = 8 global) — turning the multi-host wiring
(parallel/distributed.py) from "wired" into "validated": both processes
train the same config through the CLI, and the final model saved by process
0 must equal the single-process 8-device run bit for bit.

The reference is strictly single-machine (src/hogwild.rs is its only
parallel training); multi-host is net-new capability per SURVEY §2.4.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_dataset(d: Path, rows: int = 512):
    (d / "vw_namespace_map.csv").write_text("A,a\nB,b\n")
    data = d / "d.vw"
    data.write_text("".join(
        f"{1 if i % 2 else -1} |A a{i % 23} |B b{i % 17}\n"
        for i in range(rows)
    ))
    return data


def _run(argv, n_devices: int, timeout=240):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("FWT_BENCH_CHILD", None)
    return subprocess.Popen(
        [sys.executable, "-m", "fwumious_wabbit_tpu", *argv],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    ), timeout


COMMON = ["--keep", "A", "--keep", "B", "--interactions", "AB",
          "-b", "18", "--adaptive", "-l", "0.1", "--power_t", "0.5",
          "--fwt_platform", "cpu", "--fwt_batch_size", "64",
          "--fwt_data_axis", "4", "--fwt_table_axis", "2",
          "--fwt_exchange", "a2a", "--save_resume"]


@pytest.mark.parametrize("exchange", ["a2a", "psum"])
def test_two_process_distributed_equals_single_process(tmp_path, exchange):
    data = _write_dataset(tmp_path)
    common = [a if a != "a2a" else exchange for a in COMMON]
    port = _free_port()

    # -- two processes, 4 devices each ----------------------------------
    procs = []
    for rank in range(2):
        argv = common + [
            "--data", str(data),
            "-f", str(tmp_path / f"mp_{rank}.fw"),
            "-p", str(tmp_path / f"mp_{rank}.preds"),
            "--fwt_hosts", "2", "--fwt_host_id", str(rank),
            "--fwt_coordinator", f"127.0.0.1:{port}",
        ]
        p, to = _run(argv, n_devices=4)
        procs.append(p)
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=to)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # -- single process, 8 devices --------------------------------------
    argv = common + ["--data", str(data),
                     "-f", str(tmp_path / "sp.fw"),
                     "-p", str(tmp_path / "sp.preds")]
    p, to = _run(argv, n_devices=8)
    out, _ = p.communicate(timeout=to)
    assert p.returncode == 0, out.decode(errors="replace")[-4000:]

    # the trajectories must be identical: same mesh shape, same batches,
    # same collective schedule — process count is an implementation detail
    sp = (tmp_path / "sp.fw").read_bytes()
    for rank in range(2):
        mp = (tmp_path / f"mp_{rank}.fw").read_bytes()
        assert mp == sp, f"rank {rank} model diverged from single-process"
    sp_preds = (tmp_path / "sp.preds").read_bytes()
    assert len(sp_preds.splitlines()) == 512
    for rank in range(2):
        assert (tmp_path / f"mp_{rank}.preds").read_bytes() == sp_preds
