"""Operator catalog (SURVEY.md §2) — each reference operator as a
documented DataFrame combinator, plus the large-scale training-data
extensions (dedup, similarity, text analysis, multimodal)."""
