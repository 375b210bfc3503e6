"""Composite operators the reference's workloads need but Spark lacks as
built-ins. Each is a composition of DataFrame primitives (SURVEY.md §4:
no custom Catalyst rules are required for parity)."""
