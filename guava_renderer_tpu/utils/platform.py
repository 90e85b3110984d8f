"""In-process JAX platform pinning + backend probing.

The container's sitecustomize force-registers an `axon` TPU backend and
re-exports JAX_PLATFORMS=axon at interpreter startup — *after* any parent
process set its own environment. Exporting JAX_PLATFORMS=cpu in a shell or
subprocess env therefore does NOT survive; the only reliable pin is
in-process, before the first backend initialization (what tests/conftest.py
does). Every CLI entry point routes through here so `-d cpu` / `-d tpu`
actually controls the backend (the reference's `-d '0,1'` GPU-selection
role, ref: utils/general_utils.py:254-282).

When the axon tunnel is down, backend init *hangs indefinitely* (not an
exception), so probing must run in a subprocess with a hard timeout.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def pin_platform(platform: str | None, host_devices: int | None = None) -> None:
    """Pin the JAX platform before backend init. Safe to call repeatedly.

    platform: 'cpu' | 'tpu' | 'axon' | None (None = leave default).
    host_devices: if set, force that many virtual CPU host devices.
    """
    if host_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_devices}"
            ).strip()
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass  # backend already initialized; env pin still helps children
    if platform in ("axon", "tpu"):
        # Persistent compilation cache: remote TPU compiles of the full
        # 512^2 pipeline take tens of minutes through the tunnel; caching
        # compiled executables makes every later run start hot. CPU stays
        # uncached: XLA:CPU AOT reloads warn about machine-feature
        # mismatches ("could lead to SIGILL") on this host.
        # default derived from the repo root at runtime (utils/ is two
        # levels below it) so non-/root/repo checkouts still get a cache
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(repo_root, ".jax_cache"))
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass


def normalize_device_arg(d: str | None) -> str | None:
    """Map the reference-style -d flag to a platform name.

    The reference uses CUDA ordinals ('0' / '0,1'); here any numeric list
    means 'the accelerator' (axon TPU), and 'cpu'/'tpu'/'axon' are taken
    literally."""
    if d is None:
        return None
    d = d.strip().lower()
    if d in ("auto", ""):
        return None
    if d in ("cpu", "tpu", "axon"):
        return "axon" if d == "tpu" else d
    return "axon"  # numeric GPU-style list -> the one TPU chip


def probe_backend(platform: str = "axon", timeout_s: float = 120.0) -> tuple[bool, str]:
    """Check that `platform` can init and run a tiny op, in a subprocess.

    Returns (ok, detail). A hung tunnel is reported as a timeout instead of
    hanging the caller."""
    code = (
        "import os, jax\n"
        f"os.environ['JAX_PLATFORMS']={platform!r}\n"
        f"jax.config.update('jax_platforms', {platform!r})\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((8, 8))\n"
        "print('PROBE_OK', float((x @ x).sum()))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s (tunnel down?)"
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return True, "ok"
    tail = (r.stderr or r.stdout).strip().splitlines()
    return False, tail[-1] if tail else f"probe exited rc={r.returncode}"


def probe_backend_retry(
    platform: str = "axon",
    attempts: int = 3,
    timeout_s: float = 120.0,
    backoff_s: float = 20.0,
    verbose: bool = True,
) -> tuple[bool, str]:
    """Probe with bounded retries; progress on stderr so a driver-captured
    timeout is diagnosable from the log (VERDICT r2 item 2)."""
    detail = "no attempts"
    for i in range(attempts):
        t0 = time.time()
        ok, detail = probe_backend(platform, timeout_s)
        if verbose:
            print(
                f"[probe] attempt {i + 1}/{attempts}: "
                f"{'OK' if ok else detail} ({time.time() - t0:.0f}s)",
                file=sys.stderr, flush=True,
            )
        if ok:
            return True, detail
        if i + 1 < attempts:
            time.sleep(backoff_s)
    return False, detail
