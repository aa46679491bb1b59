"""End-to-end pipelines re-expressing the reference's flagship DAG chains
(SURVEY.md §3) as Spark lineages composed from the operator library."""
