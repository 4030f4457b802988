"""Shared smoke-budget knob for the runnable examples.

Every ``examples/*.py`` script consults :func:`budget` for its iteration /
sample counts, so the whole directory can be EXECUTED (not just parsed) as
a fast gate: ``make examples`` / ``tests/test_examples.py`` run each script
in a subprocess with ``VIABEL_EXAMPLES_SCALE`` set to a small fraction
(execution receipts — a broken example fails the gate instead of rotting
silently).  Run directly, the scripts use their full documented budgets.

``VIABEL_FORCE_CPU=1`` additionally pins the scripts to the CPU backend
(the dev image's sitecustomize force-registers the TPU platform, so the
env-var-only ``JAX_PLATFORMS=cpu`` is not enough — the config update must
happen after ``import jax``; same workaround as tests/conftest.py).
"""

import os

SCALE = float(os.environ.get("VIABEL_EXAMPLES_SCALE", "1"))
if not 0.0 < SCALE <= 1.0:
    raise ValueError("VIABEL_EXAMPLES_SCALE must be in (0, 1]")

if os.environ.get("VIABEL_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def budget(n, lo=20):
    """``n`` scaled by ``VIABEL_EXAMPLES_SCALE``, floored at ``lo``."""
    return max(int(lo), int(round(n * SCALE)))


def full():
    """True when running at the full documented budgets (no smoke knob)."""
    return SCALE >= 1.0
