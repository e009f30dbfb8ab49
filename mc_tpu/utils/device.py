"""Device capability reporting — the ``getDeviceProperty`` equivalent
(``inc/tool.cuh:56-88``: the reference dumps name, memory, clock, SM count
before pricing; here the analogous facts for the JAX backend/mesh)."""

from __future__ import annotations

import jax

__all__ = ["device_summary"]


def device_summary() -> str:
    lines = [f"backend: {jax.default_backend()}",
             f"devices: {len(jax.devices())}"]
    for d in jax.devices():
        desc = f"  [{d.id}] {d.device_kind} ({d.platform})"
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:
            pass
        if stats:
            lim = stats.get("bytes_limit")
            use = stats.get("bytes_in_use")
            if lim:
                desc += f" mem {use/2**30:.2f}/{lim/2**30:.2f} GiB"
        lines.append(desc)
    return "\n".join(lines)
