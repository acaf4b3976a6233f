"""Package wikidata_pq_spark as a --py-files zip for spark-submit."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "wikidata_pq_spark.zip"
    out.parent.mkdir(exist_ok=True)
    pkg = REPO / "wikidata_pq_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
