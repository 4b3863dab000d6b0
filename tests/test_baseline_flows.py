"""End-to-end flows for the BASELINE.json north-star configs that the unit
suites cover only piecewise:

* config 3 — Deep FFM (FFM + relu tower) trained on a synthetic CTR stream
  must actually learn (logloss well under chance on held-out data);
* config 5 — streaming train+serve: quantized inference export, live
  serving, a retrain shipped as a weight_patcher byte diff, hot-swapped
  into the running server without dropping connections.
"""

import math
import socket
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.cmdline import build_parser
from fwumious_wabbit_tpu.config.model_instance import ModelInstance
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.persistence import model_file
from fwumious_wabbit_tpu.train.loop import main as cli_main


def gen_ctr_stream(path: Path, rows: int, seed: int = 7) -> None:
    """Synthetic CTR stream in the spirit of the reference's
    benchmark/generate.py: two interacting namespaces decide the label,
    noise namespaces don't."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(rows):
            a = rng.integers(0, 50)
            b = rng.integers(0, 40)
            label = 1 if (a + b) % 3 == 0 else -1
            noise = rng.integers(0, 1000, 2)
            f.write(f"{label} |A a{a} |B b{b} |C c{noise[0]} |D d{noise[1]}\n")


def logloss(pred_file: Path, data_file: Path) -> float:
    preds = [float(x) for x in open(pred_file)]
    labels = [1 if l.split()[0] == "1" else 0 for l in open(data_file)]
    assert len(preds) == len(labels)
    return -sum(y * math.log(max(p, 1e-12)) + (1 - y) * math.log(max(1 - p, 1e-12))
                for p, y in zip(preds, labels)) / len(preds)


def test_deep_ffm_learns(tmp_path):
    """BASELINE config 3: FFM + relu tower end to end through the CLI."""
    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\nC,c\nD,d\n")
    train, test = tmp_path / "train.vw", tmp_path / "test.vw"
    gen_ctr_stream(train, 12000, seed=7)
    gen_ctr_stream(test, 3000, seed=8)
    flags = [
        "--keep", "A", "--keep", "B", "--keep", "C", "--keep", "D",
        "--interactions", "AB",
        "--ffm_k", "4", "--ffm_field", "A", "--ffm_field", "B",
        "--nn_layers", "1", "--nn", "0:width:16", "--nn", "0:activation:relu",
        "--nn_topology", "one", "--nn_learning_rate", "0.02",
        "--nn_power_t", "0.5",
        "-l", "0.1", "-b", "20", "--ffm_bit_precision", "20", "--adaptive",
        "--sgd", "--loss_function", "logistic", "--link", "logistic",
        "--power_t", "0.5", "--hash", "all",
        "--fwt_platform", "cpu", "--fwt_batch_size", "512",
    ]
    model = tmp_path / "deep.fwt"
    rc = cli_main(flags + ["--data", str(train), "-f", str(model),
                           "--save_resume", "-p", str(tmp_path / "tr.out")])
    assert rc == 0
    rc = cli_main(flags + ["-i", str(model), "-t", "--data", str(test),
                           "-p", str(tmp_path / "te.out")])
    assert rc == 0
    ll = logloss(tmp_path / "te.out", test)
    # chance is ~0.64 (p(label=1) ≈ 1/3); the tower+FFM must beat it clearly
    base = 0.6365
    assert ll < base - 0.05, f"deep FFM logloss {ll:.4f} vs chance {base:.4f}"


class Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=15)
        self.fh = self.sock.makefile("rwb")

    def send(self, line: bytes) -> bytes:
        self.fh.write(line)
        self.fh.flush()
        return self.fh.readline()

    def close(self):
        self.fh.close()
        self.sock.close()


def test_streaming_train_serve_patch_flow(tmp_path):
    """BASELINE config 5 (single-host bring-up of the multi-host flow):
    v1 model → quantized inference export → serve it → keep training → ship
    v2 as a weight_patcher diff → recreate v2 at the 'serving host' →
    hogwild_load hot swap → the open connection now serves v2 predictions."""
    from fwumious_wabbit_tpu.serve import server as server_mod
    from fwumious_wabbit_tpu.serve.server import Serving
    from fwumious_wabbit_tpu.tools import weight_patcher

    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\nC,c\nD,d\n")
    train1, train2 = tmp_path / "t1.vw", tmp_path / "t2.vw"
    gen_ctr_stream(train1, 3000, seed=1)
    gen_ctr_stream(train2, 3000, seed=2)
    flags = [
        "--keep", "A", "--keep", "B", "--interactions", "AB",
        "--ffm_k", "4", "--ffm_field", "A", "--ffm_field", "B",
        "-l", "0.1", "-b", "20", "--ffm_bit_precision", "20", "--adaptive",
        "--sgd", "--loss_function", "logistic", "--link", "logistic",
        "--power_t", "0.5", "--hash", "all",
        "--fwt_platform", "cpu", "--fwt_batch_size", "512",
    ]
    v1, v2 = tmp_path / "v1.fwt", tmp_path / "v2.fwt"
    assert cli_main(flags + ["--data", str(train1), "-f", str(v1),
                             "--save_resume"]) == 0
    # continue training from v1 → v2 (the streaming update)
    assert cli_main(flags + ["-i", str(v1), "--data", str(train2),
                             "-f", str(v2), "--save_resume"]) == 0

    # quantized inference exports (what actually ships to serving)
    v1q, v2q = tmp_path / "v1q.fwt", tmp_path / "v2q.fwt"
    assert cli_main(flags + ["-i", str(v1),
                             "--convert_inference_regressor", str(v1q),
                             "--weight_quantization"]) == 0
    assert cli_main(flags + ["-i", str(v2),
                             "--convert_inference_regressor", str(v2q),
                             "--weight_quantization"]) == 0

    # ship v1q→v2q as a byte diff; 'serving host' reconstructs v2q
    diff = tmp_path / "update.patch"
    weight_patcher.create_diff(str(v1q), str(v2q), str(diff))
    v2q_re = tmp_path / "v2q_re.fwt"
    weight_patcher.recreate(str(v1q), str(diff), str(v2q_re))
    assert v2q_re.read_bytes() == v2q.read_bytes()

    # serve v1q, then hot-swap to the patched v2q on a LIVE connection
    args = build_parser().parse_args(flags + ["--data", "x"])
    mi, vw, model, params = model_file.load_model(v1q, immutable=True,
                                                  args=args)
    srv = Serving(args, mi, vw, model, params, model_path=str(v1q))
    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 4)
    s.fwt_serving = srv
    srv._server = s
    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    try:
        c = Client(port)
        probe = b"|A a1 |B b1\n"
        before = float(c.send(probe))
        out = c.send(f"hogwild_load {v2q_re}\n".encode())
        assert out == b"hogwild_load success\n", out
        after = float(c.send(probe))
        assert before != after  # v2 weights now serve on the same connection

        # the served post-swap prediction equals offline v2q inference
        pred_file = tmp_path / "probe.out"
        probe_data = tmp_path / "probe.vw"
        probe_data.write_bytes(probe)
        assert cli_main(flags + ["-i", str(v2q), "-t", "--data",
                                 str(probe_data), "-p", str(pred_file)]) == 0
        offline = float(pred_file.read_text())
        assert abs(after - offline) < 2e-5, (after, offline)
        c.close()
    finally:
        srv.shutdown()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _distributed_train(data: Path, flags: list, out_model: Path,
                       extra: list, tmp_path: Path, tag: str) -> None:
    """One two-process jax.distributed training run (4 virtual CPU devices
    per process = 8 global); rank 0 writes ``out_model``."""
    import os
    import subprocess

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("FWT_BENCH_CHILD", None)
    procs = []
    for rank in range(2):
        argv = flags + extra + [
            "--data", str(data),
            "-f", str(out_model if rank == 0
                      else tmp_path / f"{tag}_r{rank}.fw"),
            "--fwt_hosts", "2", "--fwt_host_id", str(rank),
            "--fwt_coordinator", f"127.0.0.1:{port}",
        ]
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fwumious_wabbit_tpu", *argv],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, \
            f"{tag} rank {rank} failed:\n{out.decode(errors='replace')[-4000:]}"


def test_distributed_train_patch_hotswap_chain(tmp_path):
    """BASELINE config 5 as ONE chained flow (VERDICT r4 missing #3):
    two-process distributed train (v1) → continued distributed train (v2,
    from the --save_resume checkpoint) → quantized inference exports →
    weight_patcher diff v1→v2 → 'serving host' recreates v2 from v1+diff →
    live hogwild_load hot swap → the served prediction equals direct-load
    offline inference of the same quantized model.

    Reference anchors: src/persistence.rs:176-186 (hot swap),
    weight_patcher/src/main.rs:17-29 (diff/recreate); the distributed
    front end is net-new capability per SURVEY §2.4."""
    from fwumious_wabbit_tpu.serve import server as server_mod
    from fwumious_wabbit_tpu.serve.server import Serving
    from fwumious_wabbit_tpu.tools import weight_patcher

    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\nC,c\nD,d\n")
    train1, train2 = tmp_path / "t1.vw", tmp_path / "t2.vw"
    gen_ctr_stream(train1, 1024, seed=31)
    gen_ctr_stream(train2, 1024, seed=32)
    flags = [
        "--keep", "A", "--keep", "B", "--interactions", "AB",
        "-l", "0.1", "-b", "18", "--adaptive", "--sgd",
        "--loss_function", "logistic", "--link", "logistic",
        "--power_t", "0.5", "--hash", "all",
        "--fwt_platform", "cpu", "--fwt_batch_size", "64",
        "--fwt_data_axis", "4", "--fwt_table_axis", "2",
        "--fwt_exchange", "a2a", "--save_resume",
    ]
    v1, v2 = tmp_path / "v1.fwt", tmp_path / "v2.fwt"
    _distributed_train(train1, flags, v1, [], tmp_path, "v1")
    assert v1.exists()
    _distributed_train(train2, flags, v2, ["-i", str(v1)], tmp_path, "v2")
    assert v2.exists()

    # quantized inference exports of both checkpoints (single-process)
    v1q, v2q = tmp_path / "v1q.fwt", tmp_path / "v2q.fwt"
    assert cli_main(flags + ["-i", str(v1),
                             "--convert_inference_regressor", str(v1q),
                             "--weight_quantization"]) == 0
    assert cli_main(flags + ["-i", str(v2),
                             "--convert_inference_regressor", str(v2q),
                             "--weight_quantization"]) == 0

    # ship v1q→v2q as a byte diff; the serving host reconstructs v2q
    diff = tmp_path / "update.patch"
    weight_patcher.create_diff(str(v1q), str(v2q), str(diff))
    v2q_re = tmp_path / "v2q_re.fwt"
    weight_patcher.recreate(str(v1q), str(diff), str(v2q_re))
    assert v2q_re.read_bytes() == v2q.read_bytes()

    # serve v1q, hot-swap to the patched v2q on a live connection
    args = build_parser().parse_args(flags + ["--data", "x"])
    mi, vw, model, params = model_file.load_model(v1q, immutable=True,
                                                  args=args)
    srv = Serving(args, mi, vw, model, params, model_path=str(v1q))
    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 4)
    s.fwt_serving = srv
    srv._server = s
    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    try:
        c = Client(port)
        probe = b"|A a1 |B b1\n"
        before = float(c.send(probe))
        out = c.send(f"hogwild_load {v2q_re}\n".encode())
        assert out == b"hogwild_load success\n", out
        after = float(c.send(probe))
        assert before != after

        # served post-swap prediction equals direct-load offline inference
        pred_file = tmp_path / "probe.out"
        probe_data = tmp_path / "probe.vw"
        probe_data.write_bytes(probe)
        assert cli_main(flags + ["-i", str(v2q), "-t", "--data",
                                 str(probe_data), "-p", str(pred_file)]) == 0
        offline = float(pred_file.read_text())
        assert abs(after - offline) < 2e-5, (after, offline)
        c.close()
    finally:
        srv.shutdown()
