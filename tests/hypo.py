"""Hypothesis budget policy (round-7).

Two registered profiles:

* ``smoke`` (default): each property module keeps its tuned per-test
  example count (Spark jobs per example make these expensive), with a
  DERANDOMIZED fixed seed so CI runs are reproducible.
* ``thorough``: every test built through :func:`budget` is raised to
  at least ``THOROUGH_MIN_EXAMPLES`` examples with fresh randomness —
  run this before each end-of-round snapshot so boundary-seeking
  strategies (exact-tie session gaps, trigger-boundary counts) get a
  real search budget:

      python -m pytest tests/ -q --hypothesis-profile=thorough -k property

Every falsifying example a thorough run finds must ALSO be pinned as an
explicit constructed-case test — the smoke profile alone must re-catch
any regression of a bug we have already seen.
"""

from __future__ import annotations

from hypothesis import HealthCheck, settings

THOROUGH_MIN_EXAMPLES = 250

settings.register_profile("smoke", derandomize=True, deadline=None)
settings.register_profile("thorough", derandomize=False, deadline=None)
settings.load_profile("smoke")

_ACTIVE = "smoke"


def activate(name: str) -> None:
    """Called from conftest's pytest_configure BEFORE test modules are
    imported, so module-level :func:`budget` decorators see the
    requested profile."""
    global _ACTIVE
    settings.load_profile(name)
    _ACTIVE = name


def budget(smoke_examples: int, **kw) -> settings:
    """Profile-aware ``hypothesis.settings``: the module's tuned count
    under ``smoke``, raised to ``>= THOROUGH_MIN_EXAMPLES`` under
    ``thorough``."""
    kw.setdefault("deadline", None)
    kw.setdefault("suppress_health_check", [HealthCheck.too_slow])
    n = (max(smoke_examples, THOROUGH_MIN_EXAMPLES)
         if _ACTIVE == "thorough" else smoke_examples)
    return settings(max_examples=n, **kw)
