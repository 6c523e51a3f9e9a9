"""Operators: the reference's dataflow surface (SURVEY.md §2.1 R1-R15)
re-expressed as Catalyst plans, plus the LLM-data-pipeline extensions
(dedup, similarity, text analysis, sessionization) the engine adds on top.
"""
