"""CDC + streaming query catalog (SURVEY.md §2.9) — filled in as the
streaming core lands (SURVEY.md §7 step 4)."""

from __future__ import annotations
