"""Relational operator library: the Spark-first re-expression of the
reference's Pig/Scalding/SQL operator inventory (SURVEY.md §2) plus the
training-data-pipeline operators (dedup, similarity, text analysis)."""
