"""Fail loudly when the TPU backend cannot be reached.

On this build's runtime the first device query dials a local TCP relay
to the tunneled chip; if the relay process is dead the dial blocks
forever inside the PJRT client, uninterruptible from Python (observed
live: ``jax.devices()`` hanging indefinitely after the relay exited).
Driver entry points (bench.py, __graft_entry__.py) wrap their first
device query with :func:`device_init_or_die` so a dead tunnel produces
a diagnosable non-zero exit instead of an infinite hang.
"""

from __future__ import annotations

import json
import os
import sys
import threading


def device_init_or_die(
    timeout_s: float = 180.0,
    json_stdout: bool = False,
    metric: str | None = None,
):
    """Return ``jax.devices()``, or ``os._exit(3)`` after ``timeout_s``.

    ``os._exit`` (not ``sys.exit``) because the hang is inside a C++
    call in the main thread — only a hard exit from the watchdog thread
    can terminate the process. With ``json_stdout`` an error JSON line
    is emitted first so callers that parse stdout (the bench driver)
    see a structured failure rather than silence.
    """
    import jax

    done = threading.Event()

    def _fire() -> None:
        if done.wait(timeout_s):
            return
        msg = (
            f"device init did not complete within {timeout_s:.0f}s — "
            "TPU tunnel relay down? (see utils/watchdog.py)"
        )
        if json_stdout:
            print(
                json.dumps(
                    {
                        "metric": metric,
                        "value": None,
                        "error": msg,
                        "note": (
                            "hardware unreachable, not a regression; last "
                            "measured numbers: ARCHITECTURE.md perf table "
                            "(646 frames/s/chip @ batch 16, 897 @ 64)"
                        ),
                    }
                ),
                flush=True,
            )
        print(msg, file=sys.stderr, flush=True)
        os._exit(3)

    threading.Thread(target=_fire, daemon=True).start()
    # finally: a FAILED backend registration makes jax.devices() raise
    # rather than hang (e.g. a swallowed axon register() error); the
    # watchdog must disarm on that path too, or a caller that catches the
    # exception gets hard-killed up to timeout_s later.
    try:
        devices = jax.devices()
    finally:
        done.set()
    return devices
