"""Debug helpers for long-running CLI processes."""

import faulthandler
import io
import signal


def register_stack_dump():
    """`kill -USR1 <pid>` dumps all thread stacks to stderr — the one
    diagnostic channel for a run wedged on the axon tunnel (no-op where
    stderr has no fileno, e.g. under pytest capture)."""
    try:
        faulthandler.register(signal.SIGUSR1)
    except (io.UnsupportedOperation, ValueError, AttributeError):
        pass
