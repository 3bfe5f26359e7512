"""Query registries.

``declared`` — the 44-query correctness contract of SURVEY.md §2 (Q01–Q44).
``extra``    — LLM-pipeline operators beyond the declared contract
               (MinHash-LSH, SimHash, ANN, text analysis, multimodal).
"""

from swivel_spark_prep_spark.queries.declared import DECLARED_QUERIES, DECLARED_ORACLES  # noqa: F401
