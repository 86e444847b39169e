"""Beyond-reference operator libraries for large-scale training-data
pipelines: deduplication, similarity search, text analysis, multimodal
column processing, as-of/range joins.

The reference engine (/root/reference) has none of these (SURVEY.md §2.5);
they are first-class here because the north-star workload is a 100 TB
LLM-data pipeline (BASELINE.json "north_star").
"""
