"""Probe the remote-TPU tunnel once: tiny jit + scalar fetch on a watchdog.

Exit 0 and print latency if the chip answers within --timeout seconds;
exit 1 on hang/failure (the fetch runs on a daemon thread so a dead
tunnel cannot block the probe itself). Used by the round driver loop to
know when chip benchmarking is possible (the tunnel is observed to go
down for hours at a stretch — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import threading
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=75.0)
    args = ap.parse_args()

    t0 = time.time()
    result = []

    def probe():
        import jax
        import jax.numpy as jnp

        v = float(jnp.sum(jnp.ones((8, 8))))
        dev = jax.devices()[0]
        result.append((v, dev))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(args.timeout)
    if not result:
        print(f"tunnel down: no answer in {args.timeout:.0f}s", flush=True)
        return 1
    v, dev = result[0]
    dt = time.time() - t0
    print(f"tunnel up: sum={v} in {dt:.2f}s on {dev.platform}:{dev.device_kind}")
    return 0 if v == 64.0 else 1


if __name__ == "__main__":
    # os._exit: jax's atexit teardown can itself hang on a dead tunnel
    import os

    rc = main()
    sys.stdout.flush()
    os._exit(rc)
