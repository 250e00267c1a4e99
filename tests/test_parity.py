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
