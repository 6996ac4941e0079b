"""LLM-training-data operators (SURVEY.md §2.11 + BASELINE.json
north star): dedup, similarity search, text analysis, multimodal
column plumbing — all expressed as DataFrame transforms designed for
100 TB corpora."""

from configdrivendatapipeline_spark.llm import dedup, multimodal, similarity, textstats

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
