"""utils.capture.capture_fd2 — the evidence-trail fd-2 capture used by
dryrun_multichip and scripts/flagship_mesh_compile."""

import os

import pytest

from transeditor_tpu.utils.capture import capture_fd2


def _read_fd2_via_pipe():
    """Redirect REAL fd 2 to a pipe for the duration of a test so we
    can observe what capture_fd2 re-emits."""
    r, w = os.pipe()
    saved = os.dup(2)
    os.dup2(w, 2)
    os.close(w)
    return r, saved


def test_captures_and_reemits():
    r, saved = _read_fd2_via_pipe()
    try:
        box = []
        with capture_fd2(box):
            os.write(2, b"xla warning line\n")
        assert box[-1] == "xla warning line\n"
    finally:
        os.dup2(saved, 2)
        os.close(saved)
    # the captured text was re-emitted to the (outer) fd 2
    assert os.read(r, 4096) == b"xla warning line\n"
    os.close(r)


def test_tee_is_live():
    """The capture must be a live tee: text written inside the block is
    visible on the REAL fd 2 before the block exits, so a hard abort
    that bypasses ``finally`` (rendezvous F-abort, OOM SIGKILL) cannot
    lose the log (round-4 review finding on the replay version)."""
    import select
    import time
    r, saved = _read_fd2_via_pipe()
    try:
        box = []
        with capture_fd2(box):
            os.write(2, b"live line\n")
            deadline = time.time() + 10
            got = b""
            while b"live line" not in got and time.time() < deadline:
                # bounded poll: a regressed tee must FAIL the assert,
                # not hang the suite in a blocking os.read (advisor r4)
                ready, _, _ = select.select([r], [], [], 0.2)
                if ready:
                    got += os.read(r, 4096)  # still INSIDE the block
        assert got == b"live line\n"
        assert box[-1] == "live line\n"
    finally:
        os.dup2(saved, 2)
        os.close(saved)
    os.close(r)


def test_reemits_on_exception():
    """A failure inside the block must NOT lose the log (the r4 review
    finding: the old inline version re-emitted only on success)."""
    r, saved = _read_fd2_via_pipe()
    try:
        box = []
        with pytest.raises(RuntimeError):
            with capture_fd2(box):
                os.write(2, b"abort explanation\n")
                raise RuntimeError("boom")
        assert box[-1] == "abort explanation\n"
    finally:
        os.dup2(saved, 2)
        os.close(saved)
    assert os.read(r, 4096) == b"abort explanation\n"
    os.close(r)
