"""Function-registration surface: SQL scalar UDFs + Python handlers."""

from __future__ import annotations

from pyspark.sql import functions as F

from espkinesis_spark.functions import dedup
from espkinesis_spark.functions.registry import (
    register_python_functions,
    register_sql_functions,
)
from espkinesis_spark.tables import load_table


def test_sql_functions_register_and_inline(spark):
    names = register_sql_functions(spark)
    assert "espk_remap" in names
    row = spark.sql(
        """SELECT espk_remap(1000) AS lo, espk_remap(2000) AS hi,
                  espk_mac(X'A1B2C3D4E5F6') AS mac,
                  espk_patch(array(-1, 1500), array(1200, 1300)) AS patched,
                  espk_valid_channels(array(-1, 1000, 2000)) AS ok,
                  espk_valid_channels(array(999)) AS bad,
                  espk_ttl_ms(1000000, 4000000) AS clamped"""
    ).first()
    assert (row.lo, row.hi) == (172, 1811)  # P1 endpoints
    assert row.mac == "A1:B2:C3:D4:E5:F6"
    assert row.patched == [1200, 1500]  # -1 keeps live value
    assert row.ok is True and row.bad is False
    assert row.clamped == 0  # expired -> clamp at 0


def test_python_simhash_udf_matches_library(spark, sf_dir):
    register_python_functions(spark)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("__docs_udf")
    via_udf = spark.sql(
        "SELECT doc_id, espk_simhash48(text) AS simhash FROM __docs_udf"
    )
    via_lib = dedup.simhash(docs)
    diff = via_udf.join(via_lib.withColumnRenamed("simhash", "s2"), "doc_id").filter(
        F.col("simhash") != F.col("s2")
    )
    assert diff.count() == 0
