"""In-framework training supervision: stall detection + auto-resume.

The reference has no failure detection at all — recovery is a manual restart
from the latest checkpoint (SURVEY.md §5.3).  On this TPU setup the dominant
failure mode is a wedged device tunnel: the training process stays alive but
no step completes, so only liveness-by-progress detects it.  Round 3 ran this
logic as a shell watchdog (scripts/r3_watchdog.sh, which recovered two wedged
30k runs); round 4 promotes it into the framework as
``train_nvfi.py --supervise`` (VERDICT r3 item 5).

Design:

* The Trainer heartbeats by *device round trip*: every few steps it fetches a
  scalar off the device and touches ``<logdir>/heartbeat``.  A fresh mtime
  therefore proves steps are actually completing on the accelerator —
  dispatch being async (and ``block_until_ready`` unreliable through the
  tunnel, CLAUDE.md) makes host-loop progress alone meaningless.
* The supervisor runs the real training CLI as a child in its OWN session and
  watches the heartbeat.  Stall (or nonzero exit) => SIGTERM/SIGKILL the
  child's process group — never a pattern-matched kill — and relaunch with
  ``--resume`` so the run continues from the latest checkpoint.
* Clean exit 0 ends supervision; ``max_restarts`` bounds pathological loops.
"""

from __future__ import annotations

import os
import signal
import subprocess
import time


def touch(path: str) -> None:
    """Create/refresh a heartbeat file's mtime."""
    with open(path, "a"):
        os.utime(path, None)


def _kill_group(child: subprocess.Popen, grace: float) -> None:
    """Terminate the child's whole process group (it was started with
    ``start_new_session=True``), escalating to SIGKILL after ``grace``."""
    try:
        pgid = os.getpgid(child.pid)
    except ProcessLookupError:
        return
    try:
        os.killpg(pgid, signal.SIGTERM)
    except ProcessLookupError:
        return
    deadline = time.time() + grace
    while time.time() < deadline:
        if child.poll() is not None:
            return
        time.sleep(0.2)
    try:
        os.killpg(pgid, signal.SIGKILL)
    except ProcessLookupError:
        pass


def run_supervised(
    build_argv,
    heartbeat_path: str,
    stall_timeout: float = 720.0,
    poll: float = 5.0,
    max_restarts: int = 5,
    grace: float = 10.0,
    log=print,
):
    """Supervise a training command with stall detection and auto-resume.

    Args:
      build_argv: ``attempt -> list[str]`` — the command for attempt N.
        Attempt 0 is the initial launch; attempts >= 1 must resume from the
        latest checkpoint (the CLI wires ``--resume`` in).
      heartbeat_path: file whose mtime proves device-side progress.  Missing
        file counts age from the attempt's launch (startup/compile time is
        covered by ``stall_timeout`` too — remote compiles take minutes, so
        keep the timeout above the worst compile).
      stall_timeout: seconds of heartbeat silence that declare a stall.
      max_restarts: restarts allowed before giving up with the last rc.

    Returns:
      (rc, restarts): final child exit code (0 on success) and the number of
      restarts performed.
    """
    restarts = 0
    while True:
        argv = build_argv(restarts)
        launched = time.time()
        log(f"[supervise] attempt {restarts}: {' '.join(map(str, argv))}")
        child = subprocess.Popen(argv, start_new_session=True)
        stalled = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            try:
                last = os.path.getmtime(heartbeat_path)
            except OSError:
                last = launched
            age = time.time() - max(last, launched)
            if age > stall_timeout:
                stalled = True
                log(f"[supervise] STALL: heartbeat {age:.0f}s old; killing "
                    f"process group of pid {child.pid}")
                _kill_group(child, grace)
                rc = child.wait()
                break
            time.sleep(poll)
        if not stalled and rc == 0:
            log(f"[supervise] clean exit after {restarts} restart(s)")
            return 0, restarts
        restarts += 1
        if restarts > max_restarts:
            log(f"[supervise] giving up after {max_restarts} restarts (rc={rc})")
            return int(rc) if rc else 1, restarts - 1
        log(f"[supervise] child {'stalled' if stalled else f'died rc={rc}'}; "
            f"restart #{restarts} with resume")
