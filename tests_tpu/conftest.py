"""TPU smoke suite configuration — runs on the REAL default backend.

Unlike tests/conftest.py this does NOT force the CPU platform: the whole
point of this suite is to exercise the compiled Mosaic lowering of every
kernel family on an actual TPU chip and assert it agrees bitwise with the
Pallas interpreter and the XLA dual ON THE SAME DEVICE (the f32
transcendental implementations differ across backends, so cross-backend
comparisons are only statistical — same-device comparisons are exact).

Run with:  make tpu-smoke   (or  python -m pytest tests_tpu -q)
Skipped automatically when no TPU backend is available.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "none"
    if backend != "tpu":
        skip = pytest.mark.skip(reason=f"TPU backend required for the "
                                       f"Mosaic parity gate (got {backend})")
        for item in items:
            item.add_marker(skip)
