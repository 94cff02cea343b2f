"""Query registry: every module contributes QUERIES (name -> callable
(spark, sf_dir) -> DataFrame) and ORACLES (name -> DuckDB SQL).
__spark_entry__ merges all registries."""
