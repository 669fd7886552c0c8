"""OS-level stderr capture (XLA's C++ warnings bypass ``sys.stderr``).

Used by ``__graft_entry__.dryrun_multichip`` and
``scripts/flagship_mesh_compile.py`` to scan compile logs for
spmd_partitioner resharding warnings.  The capture is a live TEE, not a
redirect-then-replay: a pump thread copies every chunk to the real
stderr the moment it is written, so even a hard abort that bypasses
Python ``finally`` (XLA's rendezvous-watchdog ``LOG(FATAL)`` →
``abort()``, an OOM SIGKILL) leaves the log on the console up to the
instant of death — the evidence trail a redirect into an unlinked
tempfile would lose (round-4 review finding).
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading

#: Compile-log lines containing any of these tokens indicate a GSPMD
#: partitioning pathology (resharding / involuntary rematerialization).
#: Shared by the dryrun gate and the flagship compile report so the two
#: "partitions cleanly" verdicts cannot drift.
GSPMD_WARN_TOKENS = ("spmd_partitioner",
                     "Involuntary full rematerialization")


def gspmd_warning_lines(text: str) -> list[str]:
    """The lines of a captured XLA compile log that flag GSPMD
    partitioning pathologies (see ``GSPMD_WARN_TOKENS``)."""
    return [ln for ln in text.splitlines()
            if any(tok in ln for tok in GSPMD_WARN_TOKENS)]


@contextlib.contextmanager
def capture_fd2(box: list):
    """Capture file descriptor 2 into ``box`` (a list; the text is
    appended as its last element) while live-teeing it to the real
    stderr."""
    sys.stderr.flush()
    saved = os.dup(2)
    r, w = os.pipe()
    chunks: list[bytes] = []

    def pump():
        while True:
            b = os.read(r, 65536)
            if not b:
                return
            chunks.append(b)
            # live tee at the FD level: sys.stderr may be a replaced
            # object (pytest capture) that no longer wraps fd 2, and C++
            # writers never went through it anyway.  If the real stderr
            # is gone (EPIPE/closed), keep DRAINING regardless — a dead
            # tee target must not back up the 64 KB pipe buffer and
            # block every fd-2 writer in the process (advisor r4).
            try:
                os.write(saved, b)
            except OSError:
                pass

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        os.dup2(w, 2)
        os.close(w)  # fd 2 is now the pipe's only write end
        yield
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)  # closes the last write end -> pump sees EOF
        t.join(timeout=10)
        if t.is_alive():
            # a subprocess inherited the dup2'd write end and still holds
            # it: the pump never saw EOF.  Closing r here would hand the
            # fd number to unrelated code while the daemon thread still
            # reads it (advisor r4) — leave both fds to the thread and
            # report what we captured so far.
            print("capture_fd2: pump still draining (inherited fd 2 "
                  "write end?); leaving pipe open", file=sys.stderr)
        else:
            os.close(r)
            os.close(saved)
        box.append(b"".join(chunks).decode("utf-8", "replace"))
