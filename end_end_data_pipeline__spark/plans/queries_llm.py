"""LLM-training-data operator catalog (SURVEY.md §2.10 / north star):
dedup, similarity search, text analysis, multimodal — filled in as the
X-class operators land (SURVEY.md §7 step 5)."""

from __future__ import annotations
