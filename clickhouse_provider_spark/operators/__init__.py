"""Dataflow operators: the reference's pipeline operators (SURVEY.md §2A)
and the LLM-data-pipeline layer (dedup / similarity / text / multimodal)."""
