"""In-framework supervision (VERDICT r3 item 5): stall detection kills the
wedged child's process group and resumes; crashes restart; clean exits stop.

The wedged-tunnel simulation: a child that heartbeats briefly, then stops
heartbeating while staying alive — exactly what a hung axon tunnel looks like
from the host (process alive, zero device progress)."""

import os
import subprocess
import sys
import textwrap
import time

from nvfi_tpu.train.supervisor import run_supervised, touch


def _write_child(tmp_path, body: str) -> str:
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_stall_is_killed_and_resumed(tmp_path):
    hb = str(tmp_path / "heartbeat")
    marker = str(tmp_path / "first_attempt_done")
    child = _write_child(tmp_path, f"""
        import os, sys, time
        hb, marker = {hb!r}, {marker!r}
        def touch(p):
            open(p, 'a').close(); os.utime(p, None)
        if not os.path.exists(marker):
            # attempt 0: heartbeat once, then WEDGE (alive, no progress)
            touch(marker); touch(hb)
            time.sleep(600)
            sys.exit(7)  # never reached: the supervisor kills the group
        # attempt 1 ("resumed from checkpoint"): finishes cleanly
        assert '--resume' in sys.argv, sys.argv
        touch(hb)
        sys.exit(0)
    """)

    calls = []

    def build_argv(attempt):
        argv = [sys.executable, child]
        if attempt:
            argv.append("--resume")
        calls.append(attempt)
        return argv

    t0 = time.time()
    rc, restarts = run_supervised(
        build_argv, hb, stall_timeout=2.0, poll=0.2, grace=2.0, max_restarts=3,
        log=lambda *_: None,
    )
    assert rc == 0
    assert restarts == 1
    assert calls == [0, 1]
    assert time.time() - t0 < 60  # the 600s wedge was actually killed


def test_crash_restarts_and_gives_up_at_cap(tmp_path):
    hb = str(tmp_path / "heartbeat")
    touch(hb)
    child = _write_child(tmp_path, """
        import sys
        sys.exit(3)  # crashes every attempt
    """)
    rc, restarts = run_supervised(
        lambda attempt: [sys.executable, child], hb,
        stall_timeout=30.0, poll=0.1, max_restarts=2, log=lambda *_: None,
    )
    assert rc == 3
    assert restarts == 2


def test_clean_exit_no_restart(tmp_path):
    hb = str(tmp_path / "heartbeat")
    child = _write_child(tmp_path, """
        import sys
        sys.exit(0)
    """)
    rc, restarts = run_supervised(
        lambda attempt: [sys.executable, child], hb,
        stall_timeout=30.0, poll=0.1, log=lambda *_: None,
    )
    assert (rc, restarts) == (0, 0)


def test_cli_wires_supervise_flag():
    """--supervise re-execs the same command minus the flag, adding --resume
    on restarts (checked statically: the flag exists and the supervisor import
    path is the in-framework module, not the round-3 shell script)."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "train_nvfi.py")).read()
    assert "--supervise" in src
    assert "from nvfi_tpu.train.supervisor import run_supervised" in src
