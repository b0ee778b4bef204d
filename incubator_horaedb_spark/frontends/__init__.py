"""Query frontends: compile SQL-dialect / PromQL / InfluxQL / OpenTSDB
requests into DataFrames — the Spark rendering of src/query_frontend/."""
