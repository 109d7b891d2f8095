"""LLM training-data pipeline operators (SURVEY.md §2.11, north star).

All hot paths are built-in Column expressions (JVM, codegen); Python appears
only in the multimodal decode stubs (Arrow-batched mapInPandas).
"""
