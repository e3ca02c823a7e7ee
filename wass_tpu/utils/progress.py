"""The [P|cur|tot] machine-readable progress protocol.

The reference emits `[P|cur|tot]` lines on stdout so external monitors can
track each stage (e.g. /root/reference/src/wass_prepare/wass_prepare.cpp:426,
wass_match.cpp:232, wass_stereo.cpp:2139).  Same contract here.
"""

from __future__ import annotations

import sys


def progress(cur: int, tot: int = 100, stream=None) -> None:
    (stream or sys.stdout).write(f"[P|{int(cur)}|{int(tot)}]\n")
    (stream or sys.stdout).flush()
