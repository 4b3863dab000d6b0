"""Multi-host initialization plumbing (parallel/distributed.py).

jax.distributed.initialize must run before any backend init, so the real
check runs in a subprocess with a clean JAX. A genuine N≥2-host run needs N
machines; the single-process bring-up below validates the full code path
(coordinator service, process registration, device discovery) end to end.
"""

import subprocess
import sys


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd="/root/repo",
    )


def test_initialize_single_process():
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from fwumious_wabbit_tpu.parallel.distributed import initialize_multihost\n"
        "assert initialize_multihost('localhost:19731', 1, 0) is True\n"
        "assert jax.process_count() == 1 and jax.process_index() == 0\n"
        "assert jax.device_count() >= 1\n"
        "from fwumious_wabbit_tpu.parallel.distributed import is_initialized\n"
        "assert is_initialized()\n"
        "print('OK')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_noop_without_flags():
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from fwumious_wabbit_tpu.parallel.distributed import initialize_multihost\n"
        "assert initialize_multihost(None, None, None) is False\n"
        "assert initialize_multihost(None, 1, None) is False\n"
        "print('OK')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_cli_accepts_multihost_flags():
    """The CLI wires --fwt_hosts/--fwt_host_id/--fwt_coordinator through
    main() before any backend init (single-process bring-up + a real tiny
    train run on the virtual mesh with the a2a exchange)."""
    r = _run(
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'\n"
        "import tempfile, pathlib\n"
        "d = pathlib.Path(tempfile.mkdtemp())\n"
        "(d / 'vw_namespace_map.csv').write_text('A,animal\\nB,food\\n')\n"
        "lines = []\n"
        "for i in range(64):\n"
        "    lines.append(f\"{1 if i % 2 else -1} |A a{i % 7} |B b{i % 5}\")\n"
        "(d / 'data.vw').write_text('\\n'.join(lines) + '\\n')\n"
        "from fwumious_wabbit_tpu.train.loop import main\n"
        "rc = main(['--data', str(d / 'data.vw'), '--keep', 'A', '--keep', 'B',\n"
        "           '--interactions', 'AB', '-l', '0.1', '-b', '18', '--adaptive',\n"
        "           '--sgd', '--loss_function', 'logistic', '--link', 'logistic',\n"
        "           '--fwt_platform', 'cpu', '--fwt_batch_size', '32',\n"
        "           '--fwt_hosts', '1', '--fwt_host_id', '0',\n"
        "           '--fwt_coordinator', 'localhost:19733',\n"
        "           '--fwt_table_axis', '2', '--fwt_exchange', 'a2a',\n"
        "           '--fwt_a2a_capacity', '8.0',\n"
        "           '-p', str(d / 'preds.txt')])\n"
        "assert rc == 0, rc\n"
        "preds = [float(x) for x in open(d / 'preds.txt')]\n"
        "assert len(preds) == 64 and len(set(preds)) > 1\n"
        "print('OK')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
