"""Axon relay liveness probe — the CLAUDE.md "TUNNEL OUTAGE MODE" playbook
as a command.

    python tools/tunnel_probe.py            # one-shot: socket state + bounded
                                            # device round-trip, exit 0=alive
    python tools/tunnel_probe.py --wait     # poll every --interval s until
                                            # the tunnel answers (exit 0)

The two signals (see bench.py for their rationale):
  * an ESTABLISHED TCP socket on :8082 — present while some client holds a
    live relay connection; during an outage the blocked client's socket is
    GONE while the local listener still accepts fresh connects;
  * a bounded device_put + host-read round-trip in a subprocess — the only
    authoritative test (fresh processes hang in backend init during an
    outage; the timeout is the detection).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _device_roundtrip_probe, _tunnel_established  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--wait", action="store_true",
                    help="poll until the device answers")
    ap.add_argument("--interval", type=float, default=240.0,
                    help="seconds between polls with --wait")
    ap.add_argument("--timeout", type=float, default=90.0,
                    help="per-probe subprocess timeout")
    args = ap.parse_args()

    while True:
        estab = _tunnel_established()
        t0 = time.monotonic()
        alive = _device_roundtrip_probe(timeout_s=args.timeout)
        dt = time.monotonic() - t0
        stamp = time.strftime("%H:%M:%S")
        print(f"[{stamp}] estab_8082={estab} device_roundtrip="
              f"{'ok' if alive else 'TIMEOUT' if alive is False else 'error'}"
              f" ({dt:.1f}s)", flush=True)
        if alive:
            return 0
        if not args.wait:
            return 1
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
