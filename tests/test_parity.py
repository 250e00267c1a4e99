"""Every registered (query, oracle) pair must match DuckDB exactly —
this mirrors the driver's sf0.01 correctness gate locally at sf0.001.

Queries registered WITHOUT an oracle get a smoke check: runs, stable
schema, >= 0 rows.
"""

from __future__ import annotations

import pytest

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR

registry.load_all()
_PAIRS = sorted(registry.ORACLES)
_ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", _PAIRS)
def test_oracle_parity(spark, name):
    qfn = registry.QUERIES[name]
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    oracle_pdf = run_oracle(registry.ORACLES[name], SF_DIR)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_oracle_queries_emit_only_hashable_columns(spark):
    """The external driver canonicalizes oracle-checked results with
    pandas sort_values over EVERY column, which crashes on unhashable
    cells (list/dict). Any array/map/struct column in an oracle-checked
    projection is therefore unverifiable — serialize it (array_join,
    to_json, md5) instead. Guards the q_emb_quantize_int8 regression."""
    from pyspark.sql import types as T

    bad = []
    for name in _PAIRS:
        for f in registry.QUERIES[name](spark, SF_DIR).schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, "unhashable driver-checked columns: " + "; ".join(bad)
