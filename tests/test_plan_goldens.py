"""Plan-snapshot regression guard.

Every query in plans.audit.CHECKS gets two assertions:

1. the live must/must_not regex audit (same as tools/explain_audit.py);
2. its plan SIGNATURE -- the ordered list of physical operator names --
   must equal the golden file under tests/goldens/plans/.

The signature strips everything unstable (expression ids, paths,
partition counts), so a golden only changes when the plan SHAPE changes:
a Spark upgrade or code edit that flips a BroadcastHashJoin to
SortMergeJoin, drops a pushed filter's scan node, or sneaks Python into
a Catalyst-only chain fails here loudly instead of waiting for someone
to run the audit CLI by hand.

Goldens are pinned at sf0.001 (the pytest dataset; plan shape at the
audited properties is sf-independent -- the CLI audits sf0.01 live).
Regenerate after an INTENTIONAL plan change with:

    REGEN_PLAN_GOLDENS=1 python -m pytest tests/test_plan_goldens.py -q
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from wikidata_pq_spark.plans import audit

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = Path(__file__).parent / "goldens" / "plans"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", sorted(audit.CHECKS))
def test_plan_matches_golden(spark, name):
    must, must_not = audit.CHECKS[name]
    plan = audit.plan_text(audit.build(spark, name, SF))

    problems = audit.audit_one(plan, must, must_not)
    assert not problems, f"{name}: {'; '.join(problems)}\n{plan[:3000]}"

    sig = "\n".join(audit.plan_signature(plan)) + "\n"
    golden = GOLDEN_DIR / f"{name}.txt"
    if os.environ.get("REGEN_PLAN_GOLDENS"):
        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        golden.write_text(sig)
        return
    assert golden.exists(), (
        f"no golden for {name}; run REGEN_PLAN_GOLDENS=1 pytest "
        f"tests/test_plan_goldens.py"
    )
    assert sig == golden.read_text(), (
        f"plan shape changed for {name} -- if intentional, regenerate "
        f"goldens with REGEN_PLAN_GOLDENS=1\n--- got ---\n{sig}\n"
        f"--- golden ---\n{golden.read_text()}"
    )
