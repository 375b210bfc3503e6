"""Scalar function breadth + UDF surface (SURVEY.md §2 Table B phase 3).

Populated in phase 3: fn_string/date/math/array/map/json,
udf_scalar_pandas, udaf_grouped_agg, udtf_apply_in_pandas, udtf_python.
"""
