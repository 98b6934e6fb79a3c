"""Shared Hypothesis configuration (VERDICT r11 task 2: reproducible
property greens).

Round 11 proved the old setup (`max_examples=4`, random seed, gitignored
example DB) could hide a real counterexample for >=3 rounds of green
gates: the judge's run drew an example the builder's never did
(`funnel_levels(strict_increase=True)` vs the ClickHouse slot scan).
Policy now:

- **default profile: `derandomize=True`** — every gate run draws the
  SAME example sequence, so "845 passed" means the same thing on every
  machine and a green can never silently depend on the draw. (With
  derandomization Hypothesis ignores the example database, which is why
  the DB is not committed; found counterexamples are instead promoted to
  explicit pinned tests — see
  `test_funnel_strict_increase_scan_vs_recurrence_divergence_pinned`.)
- **`HYPOTHESIS_PROFILE=thorough`: randomized exploration** for
  periodic high-budget hunts; combine with `PROP_MAX_EXAMPLES` (every
  property decorator routes its budget through :func:`prop_examples`)
  to raise budgets without editing tests, e.g.::

      HYPOTHESIS_PROFILE=thorough PROP_MAX_EXAMPLES=500 \
          python -m pytest tests/test_funnel_property.py -q

  Any counterexample a thorough run finds MUST be added as an explicit
  regression test (so it "can never un-find itself") — the
  round-11 find and the round-12 sweep results live in
  `bisect/PROP_SWEEP_r12.md`.

Import this module BEFORE any `@settings(...)` decorator runs (i.e. at
the top of every property-test module): settings objects resolve unset
attributes from the profile active at decoration time.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, settings

_COMMON = dict(
    deadline=None,
    print_blob=True,
    # the session-scoped `spark` fixture is intentionally reused across
    # examples (JVM startup is ~15 s); differing-executors is spurious here
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

settings.register_profile("default", derandomize=True, **_COMMON)
settings.register_profile("thorough", derandomize=False, **_COMMON)
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default"))


def prop_examples(default: int) -> int:
    """Per-test example budget: the test's declared default, overridable
    for exploration runs via PROP_MAX_EXAMPLES."""
    return int(os.environ.get("PROP_MAX_EXAMPLES", default))
