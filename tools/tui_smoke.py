#!/usr/bin/env python
"""Scripted end-to-end drive of the curses TUI through a real pty.

Three sessions against a planted-match ROM:

1. launch with a keyword, press Enter, verify the painted screen shows
   the full search flow (gauge, deduped result row, values column,
   counter), then toggle dedup/offsets (F2/F3) and quit;
2. relaunch and verify the display state persisted via the prefs store
   (``dedup=off offsets=dec`` in the header);
3. send an F-key as a SPLIT escape sequence (bare ESC, 30 ms gap, rest)
   and verify via saved state that it registered instead of quitting.

Exit code 0 = all sessions verified.  Usage: python tools/tui_smoke.py
"""

import fcntl
import os
import pty
import re
import select
import struct
import sys
import tempfile
import termios
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ANSI = re.compile(r"\x1b\[[0-9;?]*[A-Za-z]|\x1b[=>]|\r|\x0f|\x0e")

F2, F3 = b"\x1bOQ", b"\x1bOR"  # xterm function-key sequences
ESC, ENTER = b"\x1b", b"\r"


def run_session(rom, prefs, keys):
    """Drive one TUI session.  ``keys`` is a list of (bytes, expect)
    pairs: after sending the bytes, the session polls the (ANSI-stripped)
    screen buffer until ``expect`` appears or a 60 s deadline passes —
    deterministic on slow CI runners, unlike fixed sleeps (the first
    Enter triggers the lazy engine import, which can take many seconds
    cold)."""
    pid, fd = pty.fork()
    if pid == 0:
        os.environ["TERM"] = "xterm"
        os.chdir(str(REPO))
        os.execvp(
            sys.executable,
            [sys.executable, "-m", "monkey_moore_tpu.cli", "tui",
             str(rom), "--keyword", "monkey", "--prefs", str(prefs)],
        )
    fcntl.ioctl(fd, termios.TIOCSWINSZ, struct.pack("HHHH", 28, 100, 0, 0))
    buf = b""

    def drain(sec):
        nonlocal buf
        end = time.time() + sec
        while time.time() < end:
            r, _, _ = select.select([fd], [], [], 0.2)
            if r:
                try:
                    buf += os.read(fd, 65536)
                except OSError:
                    return

    def wait_for(expect, timeout=60.0):
        nonlocal buf
        end = time.time() + timeout
        while time.time() < end:
            if expect in ANSI.sub("", buf.decode("utf-8", "replace")):
                return True
            drain(0.3)
        return False

    wait_for("keyword: monkey_", timeout=30.0)  # initial paint
    for key, expect in keys:
        os.write(fd, key)
        if expect:
            wait_for(expect)
        else:
            # deliberate short inter-byte gap (split-sequence scenario):
            # must stay under the driver's 80 ms escdelay
            time.sleep(0.03)
    os.write(fd, ESC)
    drain(2.0)
    try:
        os.waitpid(pid, 0)
    except ChildProcessError:
        pass
    return ANSI.sub("", buf.decode("utf-8", "replace"))


def main():
    import numpy as np

    td = Path(tempfile.mkdtemp())
    rom = td / "rom.bin"
    prefs = td / "config.xml"
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 50_000).astype(np.uint8)
    enc = np.array([ord(c) + 4 for c in "monkey"], dtype=np.uint8)
    data[700:706] = enc
    data[9000:9006] = enc  # same equivalency map -> deduped to one row
    rom.write_bytes(data.tobytes())

    s1 = run_session(
        rom, prefs,
        [(ENTER, "result(s)"), (F2, "dedup=off"), (F3, "offsets=dec")],
    )
    checks = {
        "file shown": str(rom) in s1,
        "keyword field": "keyword: monkey_" in s1,
        "gauge filled": "#####" in s1,
        "dedup result row": "0x2BC" in s1,
        "counter": "result(s)" in s1,
        "prefs saved": prefs.exists(),
    }
    s2 = run_session(rom, prefs, [])
    checks["state restored"] = "dedup=off" in s2 and "offsets=dec" in s2

    # Session 3: SPLIT escape sequences (a slow link can deliver an
    # F-key's bytes across reads; nodelay-mode curses would surface a
    # bare ESC and QUIT).  F2 sent as ESC + "OQ" 30 ms apart must still
    # register.  Screen diffs repaint only changed cells, so the evidence
    # is state, not scraped text: the app survives to complete a search,
    # and the saved prefs show the toggle (sessions 1-2 left dedup=off ->
    # show-all=true; the split F2 flips it back to dedup=on).
    s3 = run_session(
        rom, prefs,
        [(b"\x1b", None), (F2[1:], None), (ENTER, "result(s)")],
    )
    saved = prefs.read_text()
    checks["split-sequence F-key"] = (
        "result(s)" in s3
        and '<show-all-results value="false"' in saved
    )
    for name, ok in checks.items():
        print(f"  {'OK ' if ok else 'FAIL'} {name}")
    if not all(checks.values()):
        print("TUI smoke FAILED")
        return 1
    print("TUI smoke OK (3 sessions: search flow, persistence, split-sequence keys)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
