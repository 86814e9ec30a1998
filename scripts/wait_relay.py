#!/usr/bin/env python
"""Block until the TPU relay backend comes back up.

The relay can go down hard: backend init either fails fast with
"UNAVAILABLE: TPU backend setup/compile error" or hangs indefinitely
inside ``jax.devices()`` (observed >10 min; CLAUDE.md). Each probe runs
in a SUBPROCESS with a hard timeout so a hung init cannot wedge the
watcher itself.

Usage:
    python scripts/wait_relay.py [--marker /tmp/relay_up] \
        [--probe-timeout 300] [--interval 240] [--max-wait 36000]

Exits 0 (and writes the marker file) once ``jax.devices()`` succeeds on
the relay backend; exits 1 if max-wait elapses first. Chain TPU sessions
behind it:  python scripts/wait_relay.py && python scripts/ab_session.py ...
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

_PROBE = """
import jax
d = jax.devices()
print("OK", d)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--marker", default="/tmp/relay_up",
                    help="file written (with timestamp + device list) on success")
    ap.add_argument("--probe-timeout", type=int, default=300)
    ap.add_argument("--interval", type=int, default=240,
                    help="sleep between probes")
    ap.add_argument("--max-wait", type=int, default=36000)
    args = ap.parse_args()

    deadline = time.time() + args.max_wait
    while time.time() < deadline:
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE],
                capture_output=True, text=True, timeout=args.probe_timeout,
            )
            out = (r.stdout + r.stderr).strip()
            if "OK" in r.stdout:
                with open(args.marker, "w") as f:
                    f.write(time.strftime("%Y-%m-%d %H:%M:%S") + "\n" + r.stdout)
                print("relay up:", r.stdout.strip(), flush=True)
                return 0
            msg = out.splitlines()[-1][:150] if out else "no output"
        except subprocess.TimeoutExpired:
            msg = f"probe hung {args.probe_timeout}s"
        print(time.strftime("%H:%M:%S"), "down:", msg, flush=True)
        time.sleep(args.interval)
    print("max-wait elapsed; relay still down", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
