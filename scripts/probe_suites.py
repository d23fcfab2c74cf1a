"""Probe every reference conformance suite through the harness and
report per-suite pass/fail/skip — used to pick which suites to enable
in tests/test_conformance.py (a suite is enabled only at 0 failures).

Usage: python scripts/probe_suites.py [suite-prefix ...]
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)

from miller_ray import conformance as C  # noqa: E402
import tests.test_conformance as T  # noqa: E402

prefixes = sys.argv[1:] or [""]
base = os.path.join(C.REFERENCE, "test/cases")
enabled = set(T.SUITES)
rows = []
for suite in sorted(os.listdir(base)):
    if suite in enabled:
        continue
    if not any(suite.startswith(p) for p in prefixes):
        continue
    try:
        r = C.run_suite(suite)
    except Exception as e:  # noqa: BLE001
        print(f"{suite}: CRASH {type(e).__name__}: {e}")
        continue
    rows.append((suite, r))
    flag = "ENABLE" if r["fail"] == 0 and r["pass"] > 0 else ""
    print(f"{suite}: pass={r['pass']} fail={r['fail']} skip={r['skip']} {flag}")
    for f in r["failures"][:2]:
        print("    ", f[:180])

good = [s for s, r in rows if r["fail"] == 0 and r["pass"] > 0]
tot = sum(r["pass"] for s, r in rows if s in good)
print("\nenable candidates (+%d cases):" % tot)
print(good)
ray.shutdown()
