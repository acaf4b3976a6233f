"""Physical-plan audit CLI: assert the plans we claim are the plans we
get. Checks live in ``wikidata_pq_spark.plans.audit`` (shared with
tests/test_plan_goldens.py, which additionally pins each plan's operator
signature to a golden file).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from wikidata_pq_spark.plans import audit  # noqa: E402
from wikidata_pq_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    failures = 0
    for name, (must, must_not) in audit.CHECKS.items():
        plan = audit.plan_text(audit.build(spark, name, sf))
        problems = audit.audit_one(plan, must, must_not)
        status = "ok " if not problems else "FAIL"
        failures += bool(problems)
        print(f"{status} {name}" + ("" if not problems else ": " + "; ".join(problems)))
        if problems:
            print(plan[:4000])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
