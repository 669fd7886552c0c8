"""OS-level stderr capture (XLA's C++ warnings bypass ``sys.stderr``).

Used by ``__graft_entry__.dryrun_multichip`` and
``scripts/flagship_mesh_compile.py`` to scan compile logs for
spmd_partitioner resharding warnings.  The captured text is ALWAYS
re-emitted to the real stderr in ``finally`` — including on exception
or KeyboardInterrupt — so a failure inside the block (rendezvous
F-abort, Gloo deadline, non-finite assert) never loses the XLA log
that explains it.
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile


@contextlib.contextmanager
def capture_fd2(box: list):
    """Capture file descriptor 2 into ``box`` (a list; the text is
    appended as its last element) while re-emitting it afterwards."""
    sys.stderr.flush()
    saved = os.dup(2)
    tf = tempfile.TemporaryFile(mode="w+b")
    text = ""
    try:
        os.dup2(tf.fileno(), 2)
        yield
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)
        os.close(saved)
        try:
            tf.seek(0)
            text = tf.read().decode("utf-8", "replace")
        finally:
            tf.close()
        box.append(text)
        if text:
            # keep the log visible wherever it would have gone (on the
            # exception path too — this is the evidence trail).  Write
            # at the FD level: sys.stderr may be a replaced object
            # (pytest capture) that no longer wraps fd 2.
            os.write(2, text.encode("utf-8", "replace"))
