"""--daemon without --foreground must detach (double fork) and keep serving
after the launcher exits — the reference's daemonize behavior
(reference: src/serving.rs:215-225). The daemon is located via its listening
socket's inode in /proc and killed by exact PID (never by pattern).
"""

import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

from tests.test_serving import build


def _pid_listening_on(port: int) -> int | None:
    want_hex = f":{port:04X}"
    inodes = set()
    for tcp in ("/proc/net/tcp", "/proc/net/tcp6"):
        try:
            lines = open(tcp).read().splitlines()[1:]
        except OSError:
            continue
        for line in lines:
            parts = line.split()
            if parts[1].endswith(want_hex) and parts[3] == "0A":  # LISTEN
                inodes.add(parts[9])
    if not inodes:
        return None
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        fd_dir = f"/proc/{pid}/fd"
        try:
            for fd in os.listdir(fd_dir):
                try:
                    target = os.readlink(f"{fd_dir}/{fd}")
                except OSError:
                    continue
                if target.startswith("socket:[") and target[8:-1] in inodes:
                    return int(pid)
        except OSError:
            continue
    return None


def test_daemon_detaches_and_serves(tmp_path):
    _args, _mi, _vw, _model, _params, mpath = build(tmp_path, train_steps=2)
    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    launcher = subprocess.run(
        [sys.executable, "-m", "fwumious_wabbit_tpu", "--daemon",
         "-i", str(mpath), "--port", str(port), "--fwt_platform", "cpu",
         "--keep", "A", "--keep", "B", "-b", "18", "--adaptive",
         "-l", "0.1", "--data", "x"],
        env=env, cwd="/root/repo", capture_output=True, timeout=120,
    )
    # the launcher must RETURN (first fork's parent) while the daemon serves
    assert launcher.returncode == 0, launcher.stderr.decode()

    daemon_pid = None
    try:
        # wait for the detached grandchild to come up
        deadline = time.time() + 60
        last_err = None
        while time.time() < deadline:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=5)
                break
            except OSError as e:
                last_err = e
                time.sleep(0.5)
        else:
            pytest.fail(f"daemon never started listening: {last_err}")
        fh = c.makefile("rwb")
        fh.write(b"|A cat |B milk\n")
        fh.flush()
        reply = fh.readline()
        assert reply.endswith(b"\n") and 0.0 <= float(reply) <= 1.0
        fh.close()
        c.close()

        daemon_pid = _pid_listening_on(port)
        assert daemon_pid is not None
        # detached: its parent is not our launcher (it was re-parented)
        ppid = int(open(f"/proc/{daemon_pid}/status").read()
                   .split("PPid:")[1].split()[0])
        assert ppid != launcher.returncode  # launcher is gone entirely
        assert daemon_pid != launcher.args  # sanity
    finally:
        if daemon_pid is None:
            daemon_pid = _pid_listening_on(port)
        if daemon_pid is not None:
            os.kill(daemon_pid, signal.SIGTERM)
            time.sleep(0.3)
            try:
                os.kill(daemon_pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
