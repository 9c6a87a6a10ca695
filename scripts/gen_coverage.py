#!/usr/bin/env python3
"""Regenerate SURVEY.md §8 (the §2-id → catalog-query coverage map)
from plans/catalog.py.  Run after adding or re-oracling queries:

    python scripts/gen_coverage.py
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from end_end_data_pipeline__spark.plans.catalog import load_all  # noqa: E402

HEADER = (
    "## 8. Coverage map (§2 row → catalog queries; "
    "auto-generated from plans/catalog.py)"
)

# §2 row ordering (prefix rank, then numeric suffix)
_PREFIX_ORDER = ["S", "P", "J", "A", "W", "O", "U", "F", "ST", "UD"]


def _row_key(sid: str) -> tuple[int, int]:
    m = re.match(r"([A-Z]+)(\d+)", sid)
    return (_PREFIX_ORDER.index(m.group(1)), int(m.group(2)))


def main() -> None:
    by_id: dict[str, list[str]] = defaultdict(list)
    for name, q in load_all().items():
        mark = "✓" if q.oracle is not None else "○"
        for sid in q.survey_ids:
            by_id[sid].append(f"`{name}` {mark}")

    n_total = len(load_all())
    n_rows_only = sum(1 for q in load_all().values() if q.oracle is None)
    status = (
        f"As of round 6 the ○ class is EMPTY — all {n_total} catalog "
        "queries are oracle-backed (the last two rows-only entries, "
        "`maintenance_truncate_reset` and `banking_generator_fanout`, "
        "gained oracles via the truncate contract and a pinned checksum "
        "summary)."
        if n_rows_only == 0
        else f"{n_rows_only} of {n_total} catalog queries are rows-only (○)."
    )
    lines = [HEADER, "", (
        "Legend: ✓ = DuckDB-oracle hash parity; ○ = rows-only driver check "
        "(plus pytest)."
    ), status, (
        "Connectors S1/S4/S6/S7 additionally have construction tests in "
        "tests/test_connectors.py."
    ), "", "| §2 id | queries |", "|---|---|"]
    for sid in sorted(by_id, key=_row_key):
        lines.append(f"| {sid} | {', '.join(sorted(by_id[sid]))} |")
    table = "\n".join(lines)

    survey = Path(__file__).resolve().parent.parent / "SURVEY.md"
    text = survey.read_text()
    # §8 is SURVEY.md's last section: replace from its header to EOF
    idx = text.find(HEADER)
    if idx < 0:
        raise SystemExit("SURVEY.md §8 header not found")
    survey.write_text(text[:idx] + table + "\n")
    print(f"regenerated §8: {len(by_id)} §2 rows")


if __name__ == "__main__":
    main()
