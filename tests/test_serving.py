"""TCP daemon tests over real loopback sockets — the analogue of the
reference's mock-stream serving tests (reference: src/serving.rs:256-468):
exact wire bytes, parse-error replies, flush, live hogwild_load hot swaps."""

import socket
import time

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.cmdline import build_parser
from fwumious_wabbit_tpu.config.model_instance import ModelInstance
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.persistence import model_file
from fwumious_wabbit_tpu.serve.server import Serving

VW_CSV = "A,animal\nB,food\n"


def build(tmp_path, train_steps=0):
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    vw = VwNamespaceMap.from_dataset_dir(str(tmp_path / "d.vw"))
    args = build_parser().parse_args(
        ["--keep", "A", "--keep", "B", "-b", "18", "--adaptive",
         "-l", "0.1", "--data", "x"]
    )
    mi = ModelInstance.from_cmdline(args, vw)
    model = FwModel(mi)
    params = model.init_params()
    if train_steps:
        from fwumious_wabbit_tpu.ingest.parser import VowpalParser
        from fwumious_wabbit_tpu.ingest.translator import Batcher, FeatureTranslator
        from fwumious_wabbit_tpu.train.loop import _batch_dict
        from fwumious_wabbit_tpu.train.step import make_train_step

        parser = VowpalParser(vw)
        ft = FeatureTranslator(mi)
        step = make_train_step(model)
        lines = [b"1 |A cat |B milk\n", b"-1 |A dog |B stone\n"]
        tes = [ft.translate(parser.parse_line(l)) for l in lines]
        b = Batcher(2).make_batch(tes, pad_to_batch=False)
        for _ in range(train_steps):
            params, _ = step(params, _batch_dict(b))
    mpath = tmp_path / "m.fwt"
    model_file.save_model(mpath, mi, vw, model, params)
    return args, mi, vw, model, params, mpath


def start_server(args, mi, vw, model, params, num_children=10):
    srv = Serving(args, mi, vw, model, params)
    srv.port = 0  # pick an ephemeral port
    # bind manually to learn the port
    from fwumious_wabbit_tpu.serve import server as server_mod

    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler,
                                    num_children)
    s.fwt_serving = srv
    srv._server = s
    import threading

    t = threading.Thread(target=s.serve_forever, daemon=True)
    t.start()
    return srv, s.server_address[1]


class Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        self.fh = self.sock.makefile("rwb")

    def send(self, line: bytes) -> bytes:
        self.fh.write(line)
        self.fh.flush()
        return self.fh.readline()

    def close(self):
        # close the makefile handle too: it holds the socket's _io_refs, so
        # closing only the socket never sends FIN (and a pooled worker would
        # wait on readline forever)
        self.fh.close()
        self.sock.close()


def test_predict_wire_format(tmp_path):
    args, mi, vw, model, params, _ = build(tmp_path)
    srv, port = start_server(args, mi, vw, model, params)
    try:
        c = Client(port)
        out = c.send(b"|A cat |B milk\n")
        assert out == b"0.500000\n"  # zero weights → exact 0.5, 6 decimals
        out = c.send(b"1 |A dog |B stone\n")
        assert out == b"0.500000\n"
        c.close()
    finally:
        srv.shutdown()


def test_parse_error_reply_and_drop(tmp_path):
    args, mi, vw, model, params, _ = build(tmp_path)
    srv, port = start_server(args, mi, vw, model, params)
    try:
        c = Client(port)
        out = c.send(b"|Z unknown_namespace\n")
        assert out.startswith(b"ERR: ")
        # connection is dropped after an error, as in the reference
        assert c.fh.readline() == b""
        c.close()
    finally:
        srv.shutdown()


def test_flush_and_multiple_clients(tmp_path):
    args, mi, vw, model, params, _ = build(tmp_path)
    srv, port = start_server(args, mi, vw, model, params)
    try:
        clients = [Client(port) for _ in range(4)]
        for c in clients:
            assert c.send(b"|A cat |B milk\n") == b"0.500000\n"
        # flush produces no reply but keeps the connection alive
        clients[0].fh.write(b"flush\n")
        clients[0].fh.flush()
        assert clients[0].send(b"|A cat\n") == b"0.500000\n"
        for c in clients:
            c.close()
    finally:
        srv.shutdown()


def test_native_engine_serving(tmp_path):
    """The embedded C++ engine behind the TCP protocol: same wire format,
    error handling, and live hogwild_load as the device engine."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    args, mi, vw, model, params, mpath = build(tmp_path)
    untrained_path = mpath.with_name("untrained.fwt")
    mpath.rename(untrained_path)
    _, _, _, _, _p1, trained_path = build(tmp_path, train_steps=5)
    srv = Serving(args, mi, vw, model, params, model_path=untrained_path)
    assert srv.native_predictor is not None
    import threading

    from fwumious_wabbit_tpu.serve import server as server_mod

    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 10)
    s.fwt_serving = srv
    srv._server = s
    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    try:
        c = Client(port)
        assert c.send(b"|A cat |B milk\n") == b"0.500000\n"
        out = c.send(b"|Z nope\n")
        assert out.startswith(b"ERR: ")
        c.close()
        c = Client(port)
        assert c.send(f"hogwild_load {trained_path}\n".encode()) == b"hogwild_load success\n"
        after = float(c.send(b"|A cat |B milk\n"))
        assert after != 0.5
        # matches the device engine's prediction for the same weights
        mi2, vw2, model2, params2 = __import__(
            "fwumious_wabbit_tpu.persistence.model_file", fromlist=["load_model"]
        ).load_model(trained_path, immutable=True)
        from fwumious_wabbit_tpu.ingest.parser import VowpalParser
        from fwumious_wabbit_tpu.ingest.translator import Batcher, FeatureTranslator
        from fwumious_wabbit_tpu.train.loop import _batch_dict
        from fwumious_wabbit_tpu.train.step import make_predict_step

        parser2 = VowpalParser(vw2)
        ft2 = FeatureTranslator(mi2)
        te = ft2.translate(parser2.parse_line(b"|A cat |B milk\n"))
        b = Batcher(1).make_batch([te], pad_to_batch=False)
        expected = float(make_predict_step(model2)(params2, _batch_dict(b))[0])
        assert abs(after - expected) < 2e-6
        c.close()
    finally:
        srv.shutdown()


def test_native_engine_soak_under_hot_swap(tmp_path):
    """8 concurrent clients hammering predictions while another client swaps
    models repeatedly — no errors, every reply well-formed."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    import threading

    from fwumious_wabbit_tpu.serve import server as server_mod

    args, mi, vw, model, params, mpath = build(tmp_path)
    m0 = mpath.with_name("gen0.fwt")
    mpath.rename(m0)
    _, _, _, _, _p, m1 = build(tmp_path, train_steps=3)
    srv = Serving(args, mi, vw, model, params, model_path=m0)
    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 10)
    s.fwt_serving = srv
    srv._server = s
    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    errors = []
    latencies = []  # per-request seconds, all clients (list.append is atomic)

    def client(k):
        try:
            c = Client(port)
            for i in range(200):
                t0 = time.perf_counter()
                out = c.send(f"|A a{k}_{i} |B b{i}\n".encode())
                latencies.append(time.perf_counter() - t0)
                v = float(out)
                assert 0.0 <= v <= 1.0
            c.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def swapper():
        try:
            c = Client(port)
            for i in range(30):
                path = m1 if i % 2 == 0 else m0
                out = c.send(f"hogwild_load {path}\n".encode())
                assert out == b"hogwild_load success\n", out
            c.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(8)]
    threads.append(threading.Thread(target=swapper))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    srv.shutdown()
    assert not errors, errors
    # latency percentiles under concurrency + live swaps (the reference
    # publishes no serving percentiles — BENCHMARK.md omits them)
    lat = np.sort(np.asarray(latencies))
    p50 = lat[int(0.50 * (len(lat) - 1))]
    p99 = lat[int(0.99 * (len(lat) - 1))]
    print(f"soak latency: n={len(lat)} p50={p50 * 1e6:.0f}us "
          f"p99={p99 * 1e6:.0f}us max={lat[-1] * 1e6:.0f}us")
    assert p99 < 0.5, f"p99 latency {p99:.3f}s"


def test_num_children_pool_is_bounded(tmp_path):
    """--num_children must cap the worker thread count: with a pool of 2,
    many sequential connections are all served and no per-connection threads
    accumulate (the round-1 server spawned one thread per connection;
    reference uses a fixed pool, src/serving.rs:231-241)."""
    import threading

    args, mi, vw, model, params, _ = build(tmp_path)
    srv, port = start_server(args, mi, vw, model, params, num_children=2)
    try:
        names = {t.name for t in threading.enumerate()}
        assert sum(1 for n in names if n.startswith("fwt-serve-")) == 2
        before = threading.active_count()
        for k in range(12):
            c = Client(port)
            out = c.send(f"|A a{k} |B b{k}\n".encode())
            assert 0.0 <= float(out) <= 1.0
            c.close()
        assert threading.active_count() <= before + 1  # no thread growth
        # two concurrent persistent clients saturate the pool; both served
        c1, c2 = Client(port), Client(port)
        assert 0.0 <= float(c1.send(b"|A x |B y\n")) <= 1.0
        assert 0.0 <= float(c2.send(b"|A p |B q\n")) <= 1.0
        c1.close()
        c2.close()
    finally:
        srv.shutdown()


def test_hogwild_load_hot_swap(tmp_path):
    # train a model, save it, serve the UNtrained one, hot-swap to trained
    args, mi, vw, model, params0, _ = build(tmp_path)
    _, _, _, _, _params1, trained_path = build(tmp_path, train_steps=5)
    srv, port = start_server(args, mi, vw, model, params0)
    try:
        c = Client(port)
        before = float(c.send(b"|A cat |B milk\n"))
        assert before == 0.5
        out = c.send(f"hogwild_load {trained_path}\n".encode())
        assert out == b"hogwild_load success\n"
        after = float(c.send(b"|A cat |B milk\n"))
        assert after != 0.5  # trained weights now serve
        c.close()

        c2 = Client(port)
        out = c2.send(b"hogwild_load /nonexistent/model.fwt\n")
        assert out == b"ERR: hogwild_load fail\n"
        c2.close()
    finally:
        srv.shutdown()


def test_fwt_serve_engine_selection(tmp_path):
    """--fwt_serve_engine: 'device' forces the JAX predictor even when a
    model path is given; 'native' requires the C++ engine (raises without
    it); 'auto' falls back silently."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    args, mi, vw, model, params, mpath = build(tmp_path)

    args.fwt_serve_engine = "device"
    srv = Serving(args, mi, vw, model, params, model_path=mpath)
    assert srv.native_predictor is None

    args.fwt_serve_engine = "native"
    srv = Serving(args, mi, vw, model, params, model_path=mpath)
    assert srv.native_predictor is not None

    with pytest.raises(Exception):
        Serving(args, mi, vw, model, params,
                model_path=tmp_path / "nonexistent.fwt")

    args.fwt_serve_engine = "auto"
    srv = Serving(args, mi, vw, model, params,
                  model_path=tmp_path / "nonexistent.fwt")
    assert srv.native_predictor is None  # fell back, no raise


def _recv_lines(sock, n, timeout=30):
    """Collect exactly n newline-terminated replies from the socket."""
    sock.settimeout(timeout)
    data = bytearray()
    while data.count(b"\n") < n:
        chunk = sock.recv(65536)
        if not chunk:
            break
        data += chunk
    return bytes(data).split(b"\n")[:n]


@pytest.mark.parametrize("engine", ["device", "native"])
def test_pipelined_burst(tmp_path, engine):
    """A pipelined client writing one burst of N lines gets N in-order
    replies identical to per-line request/response (the drain-and-reply
    handler batches device predicts + coalesces replies per burst)."""
    if engine == "native":
        from fwumious_wabbit_tpu import native

        if native.load() is None:
            pytest.skip("no native toolchain")
    args, mi, vw, model, params, mpath = build(tmp_path, train_steps=5)
    args.fwt_serve_engine = engine
    srv = Serving(args, mi, vw, model, params,
                  model_path=mpath if engine == "native" else None)
    from fwumious_wabbit_tpu.serve import server as server_mod

    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 4)
    s.fwt_serving = srv
    srv._server = s
    import threading

    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    lines = [b"1 |A cat |B milk\n", b"-1 |A dog |B stone\n",
             b"|A cat |B stone\n", b"|A dog |B milk\n"] * 8
    try:
        # per-line baseline
        c = Client(port)
        expected = [c.send(l) for l in lines]
        c.close()
        # one burst, all lines in a single send
        c = Client(port)
        c.sock.sendall(b"".join(lines))
        got = _recv_lines(c.sock, len(lines))
        assert got == [e.rstrip(b"\n") for e in expected]
        c.close()
        # burst with a mid-stream parse error: in-order replies for the
        # earlier lines arrive BEFORE the ERR, then the connection drops
        c = Client(port)
        c.sock.sendall(lines[0] + lines[1] + b"|Z nope\n" + lines[2])
        got = _recv_lines(c.sock, 3)
        assert got[0] == expected[0].rstrip(b"\n")
        assert got[1] == expected[1].rstrip(b"\n")
        assert got[2].startswith(b"ERR: ")
        assert c.sock.recv(4096) == b""  # dropped
        c.close()
        # trailing unterminated line is served at EOF (readline semantics)
        c = Client(port)
        c.sock.sendall(lines[0] + lines[1].rstrip(b"\n"))
        c.sock.shutdown(socket.SHUT_WR)
        got = _recv_lines(c.sock, 2)
        assert got == [e.rstrip(b"\n") for e in expected[:2]]
        c.close()
    finally:
        srv.shutdown()


def test_bind_failure_raises_oserror():
    """TCPServer.__init__ calls server_close() when bind() fails — before
    the worker-pool attributes exist. The pool's server_close must not mask
    the real OSError with an AttributeError (found driving two daemons on
    one port)."""
    from fwumious_wabbit_tpu.serve import server as server_mod

    a = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 2)
    port = a.server_address[1]
    try:
        with pytest.raises(OSError) as ei:
            server_mod._PooledTCPServer(("127.0.0.1", port),
                                        server_mod._Handler, 2)
        assert not isinstance(ei.value, AttributeError)
    finally:
        a.server_close()


@pytest.mark.parametrize("engine", ["device", "native"])
def test_whitespace_only_line_closes_cleanly(tmp_path, engine):
    """A whitespace-only line (b'  \\n') ends the stream cleanly on BOTH
    engines — the C parser classifies it an error, but the wire contract
    treats any blank line as end-of-stream (no ERR reply)."""
    if engine == "native":
        from fwumious_wabbit_tpu import native

        if native.load() is None:
            pytest.skip("no native toolchain")
    args, mi, vw, model, params, mpath = build(tmp_path, train_steps=3)
    args.fwt_serve_engine = engine
    srv = Serving(args, mi, vw, model, params,
                  model_path=mpath if engine == "native" else None)
    from fwumious_wabbit_tpu.serve import server as server_mod

    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 2)
    s.fwt_serving = srv
    srv._server = s
    import threading

    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    try:
        c = Client(port)
        one = c.send(b"1 |A cat |B milk\n")
        assert one.endswith(b"\n") and not one.startswith(b"ERR")
        c.sock.sendall(b"  \n")
        rest = c.sock.recv(4096)
        assert rest == b""  # clean close, no ERR reply
        c.close()
    finally:
        srv.shutdown()


def test_predict_examples_shape_stable(tmp_path):
    """Arbitrary burst sizes must not each compile a fresh device program:
    predict_examples pads chunks to the batcher's fixed batch size, so the
    jitted predict sees ONE batch shape across burst sizes."""
    from fwumious_wabbit_tpu.ingest.parser import VowpalParser
    from fwumious_wabbit_tpu.ingest.translator import FeatureTranslator

    args, mi, vw, model, params, _ = build(tmp_path, train_steps=2)
    args.fwt_serve_engine = "device"
    srv = Serving(args, mi, vw, model, params)
    parser = VowpalParser(vw)
    ft = FeatureTranslator(mi)
    ex = ft.translate(parser.parse_line(b"1 |A cat |B milk\n"))
    shapes = set()
    orig = srv.predictor._predict

    def spy(p, bd):
        shapes.add(bd["label"].shape)
        return orig(p, bd)

    srv.predictor._predict = spy
    singles = [float(srv.predictor.predict_examples([ex])[0])
               for _ in range(2)]
    for n in (1, 3, 7, 50, 300):
        preds = srv.predictor.predict_examples([ex] * n)
        assert preds.shape == (n,)
        assert all(float(p) == singles[0] for p in preds)
    assert len(shapes) == 1, shapes  # one compiled shape for every burst


@pytest.mark.parametrize("engine", ["device", "native"])
def test_burst_segmentation_fuzz(tmp_path, engine):
    """Property test: ANY segmentation of the same byte stream into sends
    must produce the same reply stream (the drain-and-reply handler's
    behavior is a function of the bytes, not of TCP framing). Streams mix
    predictions, flush commands, and a hogwild_load."""
    if engine == "native":
        from fwumious_wabbit_tpu import native

        if native.load() is None:
            pytest.skip("no native toolchain")
    import random

    args, mi, vw, model, params, mpath = build(tmp_path, train_steps=4)
    args.fwt_serve_engine = engine
    srv = Serving(args, mi, vw, model, params,
                  model_path=mpath if engine == "native" else None)
    from fwumious_wabbit_tpu.serve import server as server_mod

    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 2)
    s.fwt_serving = srv
    srv._server = s
    import threading

    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    vocab = [b"1 |A cat |B milk\n", b"-1 |A dog |B stone\n",
             b"|A cat |B stone\n", b"flush\n",
             b"hogwild_load %s\n" % str(mpath).encode()]
    rng = random.Random(7)
    try:
        for trial in range(6):
            stream = b"".join(rng.choice(vocab) for _ in range(40))
            n_preds = stream.count(b"|A")
            n_hog = stream.count(b"hogwild_load")
            want = n_preds + n_hog
            replies = []
            for seg in range(2):
                c = Client(port)
                if seg == 0:  # one burst
                    c.sock.sendall(stream)
                else:  # random segmentation with tiny pauses
                    i = 0
                    while i < len(stream):
                        j = min(len(stream), i + rng.randint(1, 37))
                        c.sock.sendall(stream[i:j])
                        i = j
                replies.append(b"".join(_recv_lines(c.sock, want)))
                c.close()
            assert replies[0] == replies[1], f"trial {trial}"
            assert replies[0].count(b"hogwild_load success") == n_hog
    finally:
        srv.shutdown()


def test_burst_soak_under_hot_swap(tmp_path):
    """4 concurrent PIPELINED clients (full bursts through the block-predict
    path) while another client hot-swaps models — every client gets exactly
    one in-order well-formed reply per line, no errors."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    import threading

    from fwumious_wabbit_tpu.serve import server as server_mod

    args, mi, vw, model, params, mpath = build(tmp_path)
    m0 = mpath.with_name("gen0.fwt")
    mpath.rename(m0)
    _, _, _, _, _p, m1 = build(tmp_path, train_steps=3)
    srv = Serving(args, mi, vw, model, params, model_path=m0)
    s = server_mod._PooledTCPServer(("127.0.0.1", 0), server_mod._Handler, 8)
    s.fwt_serving = srv
    srv._server = s
    threading.Thread(target=s.serve_forever, daemon=True).start()
    port = s.server_address[1]
    errors = []

    def burst_client(k):
        try:
            for r in range(6):
                n = 150 + 50 * (k % 3)
                lines = [f"|A a{k}_{r}_{i} |B b{i}\n".encode()
                         for i in range(n)]
                c = Client(port)
                c.sock.sendall(b"".join(lines))
                got = _recv_lines(c.sock, n)
                assert len(got) == n
                for g in got:
                    v = float(g)
                    assert 0.0 <= v <= 1.0
                c.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def swapper():
        try:
            c = Client(port)
            for i in range(20):
                path = m1 if i % 2 == 0 else m0
                out = c.send(f"hogwild_load {path}\n".encode())
                assert out == b"hogwild_load success\n", out
            c.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=burst_client, args=(k,))
               for k in range(4)]
    threads.append(threading.Thread(target=swapper))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    srv.shutdown()
    assert not errors, errors
