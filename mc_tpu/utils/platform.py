"""Backend platform guard: never hang on an unreachable accelerator.

The reference's driver always runs (``hello.cu:3-48`` executes on whatever
GPU ``cudaSetDevice(0)`` finds, or errors out immediately).  In this image
the JAX default backend is a *remote* TPU behind a tunnel, and backend
initialization can block for minutes — or forever — when the tunnel is
down.  Three facts shape this module (measured, see docs/PARITY.md):

* ``JAX_PLATFORMS=cpu`` in the environment alone does NOT stick — the
  container registers the TPU plugin first; ``jax.config.update`` before
  the first device touch is also required.
* Backend init happens at the first device access (e.g. ``jnp.asarray``),
  not at ``import jax`` — so a CLI can parse flags and apply the config
  update safely as long as no module-level code builds arrays.
* A hung init cannot be cancelled from within the process; the only safe
  bound is a watchdog that hard-exits, or probing in a subprocess.

``apply_platform`` + ``bounded_backend_init`` give user-facing commands a
guaranteed-progress startup; ``probe_backend`` gives harnesses (bench.py)
a subprocess probe with retries that can never wedge the parent.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading

__all__ = ["apply_platform", "bounded_backend_init", "probe_backend",
           "resolve_platform"]

_ENV_FLAG = "MC_TPU_PLATFORM"
_ENV_TIMEOUT = "MC_TPU_INIT_TIMEOUT"
_DEFAULT_TIMEOUT = 300.0  # tunnel first-init is bimodal: 20-40s or 150-450s


def resolve_platform(platform: str | None) -> str | None:
    """Explicit flag beats the MC_TPU_PLATFORM env var beats None (default
    backend resolution — the TPU tunnel in this image)."""
    plat = platform or os.environ.get(_ENV_FLAG) or None
    if plat in (None, "", "default", "auto"):
        return None
    return plat


def apply_platform(platform: str | None) -> str | None:
    """Pin the JAX platform BEFORE any device touch; returns the resolved
    name (None = leave the default backend resolution alone).

    Must be called before the first array/device operation in the process;
    both the env var and the config update are set because the env var
    alone is ignored once the plugin registry is populated.

    "tpu" deliberately does NOT pin ``jax_platforms="tpu"``: in this
    image the real chip registers under a custom PJRT plugin name
    ("axon"), and pinning the literal "tpu" platform would look for a
    local libtpu device and fail.  "tpu" therefore means "default
    accelerator resolution" — clear any JAX_PLATFORMS override so the
    plugin registry picks the accelerator.
    """
    plat = resolve_platform(platform)
    if plat == "tpu":
        os.environ.pop("JAX_PLATFORMS", None)
        return plat
    if plat is not None:
        import jax
        os.environ["JAX_PLATFORMS"] = plat
        jax.config.update("jax_platforms", plat)
    return plat


def bounded_backend_init(timeout_s: float | None = None,
                         announce=print) -> str:
    """Initialize the default backend with a hard time bound.

    Prints a one-line notice first (so a slow tunnel is never a *silent*
    hang), then touches the backend.  If init has not completed within
    ``timeout_s`` (flag > $MC_TPU_INIT_TIMEOUT > 300 s default), a watchdog
    thread prints a clear diagnosis — including the ``--platform cpu``
    escape hatch — and hard-exits with code 3.  A blocked backend init
    holds the GIL-released C++ tunnel call, so ``os._exit`` from the
    watchdog is the only reliable bound.

    Returns the initialized backend name ("tpu", "cpu", ...).
    """
    import jax

    if timeout_s is None:
        timeout_s = float(os.environ.get(_ENV_TIMEOUT, _DEFAULT_TIMEOUT))

    done = threading.Event()

    def _watchdog():
        if not done.wait(timeout_s):
            sys.stderr.write(
                f"\nerror: JAX backend initialization exceeded "
                f"{timeout_s:.0f}s.\n"
                "The default backend here is a remote TPU tunnel; it is "
                "probably down.\nRe-run with `--platform cpu` (or set "
                f"{_ENV_FLAG}=cpu) to use the host CPU,\nor raise the "
                f"bound with {_ENV_TIMEOUT}=<seconds>.\n")
            sys.stderr.flush()
            os._exit(3)

    t = threading.Thread(target=_watchdog, daemon=True)
    t.start()
    try:
        announce(f"initializing JAX backend "
                 f"(bound {timeout_s:.0f}s; --platform cpu to skip the "
                 f"TPU tunnel) ...")
        backend = jax.default_backend()  # first device touch => init
        n = len(jax.devices())
        announce(f"backend: {backend} ({n} device{'s' if n != 1 else ''})")
        return backend
    finally:
        done.set()


def probe_backend(timeout_s: float = 120.0, retries: int = 3,
                  platform: str | None = None) -> dict:
    """Subprocess probe: can the (default or pinned) backend initialize?

    Runs ``jax.default_backend()`` in a clean child with a hard timeout,
    retrying up to ``retries`` times (the tunnel recovers from transient
    congestion; a down tunnel fails all attempts).  The parent process is
    never touched — its backend stays uninitialized, so the caller can
    still fall back to CPU afterwards.

    Returns ``{"ok": bool, "backend": str|None, "device": str|None,
    "error": str|None, "attempts": int}``.
    """
    code = (
        "import jax\n"
        + (f"jax.config.update('jax_platforms', {platform!r})\n"
           if platform else "")
        + "d = jax.devices()[0]\n"
        "print(jax.default_backend())\n"
        "print(str(d))\n"
    )
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
    else:
        env.pop("JAX_PLATFORMS", None)
    last_err = None
    for attempt in range(1, retries + 1):
        try:
            proc = subprocess.run([sys.executable, "-c", code], env=env,
                                  capture_output=True, text=True,
                                  timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last_err = f"backend init exceeded {timeout_s:.0f}s"
            continue
        if proc.returncode == 0:
            lines = proc.stdout.strip().splitlines()
            if len(lines) >= 2:
                return {"ok": True, "backend": lines[0],
                        "device": lines[1], "error": None,
                        "attempts": attempt}
        last_err = (proc.stderr.strip().splitlines() or ["unknown error"])[-1]
    return {"ok": False, "backend": None, "device": None,
            "error": last_err, "attempts": retries}
