"""Tiny TPU-tunnel health probe: jit one add on the axon chip, bounded.

    python tools/tpu_health.py [--wait]

Exits 0 when a trivial compile+execute round-trips, 1 otherwise. --wait
loops (60 s backoff, 30 min cap) until healthy — the gate bench/probe
windows use before grabbing the chip (CLAUDE.md: the tunnel has flaky
windows where remote compiles hang indefinitely; a subprocess with a hard
timeout is the only reliable detector)."""

import argparse
import subprocess
import sys
import time

_CHILD = r"""
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((128, 128)))
x.block_until_ready()
print("HEALTH OK", jax.devices()[0].platform)
"""


def probe(timeout: float = 120.0) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", _CHILD],
                           capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0 and "HEALTH OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", action="store_true")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--max-wait", type=float, default=1800.0)
    args = ap.parse_args()
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        ts = time.time()
        ok = probe(args.timeout)
        print(f"[health] attempt {attempt}: {'OK' if ok else 'FAIL'} "
              f"({time.time()-ts:.0f}s)", flush=True)
        if ok:
            return 0
        if not args.wait or time.time() - t0 > args.max_wait:
            return 1
        time.sleep(60)


if __name__ == "__main__":
    sys.exit(main())
