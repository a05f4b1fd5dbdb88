"""Rule engine tests — NUMBER bucketing per bucket boundary, overrides,
defaults (spec: mapping_mysql.go:82-486, FIXTURES.md B1)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from transferdb_spark.rules.datatypes import (
    OracleColumn,
    map_mysql_to_oracle_type,
    map_oracle_type,
)
from transferdb_spark.rules.defaults import rewrite_default_m2o, rewrite_default_o2m
from transferdb_spark.rules.resolution import RuleSet, resolve_type


def col(dt, p=None, s=None, length=0, char_used="B", char_length=0):
    return OracleColumn(
        "C", dt, data_length=length, data_precision=p, data_scale=s,
        char_used=char_used, char_length=char_length,
    )


@pytest.mark.parametrize(
    "p,expected_mysql,expected_spark",
    [
        (1, "TINYINT", T.ByteType()),
        (2, "TINYINT", T.ByteType()),
        (3, "SMALLINT", T.ShortType()),
        (4, "SMALLINT", T.ShortType()),
        (5, "INT", T.IntegerType()),
        (8, "INT", T.IntegerType()),
        (9, "BIGINT", T.LongType()),
        (18, "BIGINT", T.LongType()),
        (19, "DECIMAL(19)", T.DecimalType(19, 0)),
        (38, "DECIMAL(38)", T.DecimalType(38, 0)),
    ],
)
def test_number_integer_buckets(p, expected_mysql, expected_spark):
    _, mysql_t, spark_t = map_oracle_type(col("NUMBER", p, 0))
    assert mysql_t == expected_mysql
    assert spark_t == expected_spark


@pytest.mark.parametrize(
    "p,s,expected",
    [
        (10, 2, "DECIMAL(10,2)"),
        (38, 2, "DECIMAL(65,2)"),      # p=38 promotes to MySQL max
        (38, 31, "DECIMAL(65,30)"),    # scale clamped to 30
        (20, 31, "DECIMAL(20,30)"),    # scale clamp, precision kept
    ],
)
def test_number_decimal_buckets(p, s, expected):
    _, mysql_t, _ = map_oracle_type(col("NUMBER", p, s))
    assert mysql_t == expected


def test_number_no_precision_is_38_127():
    origin, mysql_t, spark_t = map_oracle_type(col("NUMBER"))
    assert origin == "NUMBER(38,127)"  # reverse.go:542-543 normalization
    assert mysql_t == "DECIMAL(65,30)"
    assert spark_t == T.DecimalType(38, 38)


def test_char_vs_byte_semantics():
    # CHAR_USED='C' uses char_length (mapping_mysql.go:183-189)
    _, m1, _ = map_oracle_type(col("VARCHAR2", length=300, char_used="C", char_length=100))
    _, m2, _ = map_oracle_type(col("VARCHAR2", length=300, char_used="B", char_length=100))
    assert m1 == "VARCHAR(100)" and m2 == "VARCHAR(300)"


@pytest.mark.parametrize(
    "dt,expected",
    [
        ("CLOB", "LONGTEXT"),
        ("NCLOB", "TEXT"),
        ("LONG", "LONGTEXT"),
        ("LONG RAW", "LONGBLOB"),
        ("BFILE", "VARCHAR(255)"),
        ("BINARY_DOUBLE", "DOUBLE"),
        ("XMLTYPE", "LONGTEXT"),
        ("INTERVAL YEAR(2) TO MONTH", "VARCHAR(30)"),
        ("INTERVAL DAY(2) TO SECOND(6)", "VARCHAR(30)"),
    ],
)
def test_fixed_type_map(dt, expected):
    _, mysql_t, _ = map_oracle_type(col(dt))
    assert mysql_t == expected


def test_timestamp_scale_cap():
    _, m9, _ = map_oracle_type(col("TIMESTAMP(9)", s=9))
    _, m3, _ = map_oracle_type(col("TIMESTAMP(3)", s=3))
    _, tz, _ = map_oracle_type(col("TIMESTAMP(9) WITH TIME ZONE", s=9))
    assert m9 == "TIMESTAMP(6)"  # >6 truncates (mapping_mysql.go:463-479)
    assert m3 == "TIMESTAMP(3)"
    assert tz == "DATETIME(6)"


def test_raw_maps_varbinary():
    _, m, spark_t = map_oracle_type(col("RAW", length=100))
    assert m == "VARBINARY(100)" and spark_t == T.BinaryType()


def test_unknown_type_degrades_to_text():
    _, m, _ = map_oracle_type(col("SDO_GEOMETRY"))
    assert m == "TEXT"


def test_rule_priority_column_over_table_over_schema():
    c = col("NUMBER", 10, 0)
    rules = RuleSet(
        column_rules={("S", "T", "C"): "BIGINT UNSIGNED"},
        table_rules={("S", "T", "NUMBER"): "DECIMAL(20)"},
        schema_rules={("S", "NUMBER"): "DECIMAL(30)"},
    )
    assert resolve_type("s", "t", c, rules) == "BIGINT UNSIGNED"
    rules.column_rules.clear()
    assert resolve_type("s", "t", c, rules) == "DECIMAL(20)"
    rules.table_rules.clear()
    assert resolve_type("s", "t", c, rules) == "DECIMAL(30)"
    rules.schema_rules.clear()
    assert resolve_type("s", "t", c, rules) == "BIGINT"  # builtin


def test_default_value_rewrite():
    assert rewrite_default_o2m("SYSDATE") == "NOW()"
    assert rewrite_default_o2m("SYS_GUID()") == "UUID()"
    assert rewrite_default_o2m(None) == "NULL"
    assert rewrite_default_o2m("abc", string_typed=True) == "'abc'"
    assert rewrite_default_o2m("0") == "0"
    assert rewrite_default_m2o("CURRENT_TIMESTAMP") == "SYSDATE"


def test_m2o_direction():
    assert map_mysql_to_oracle_type("BIGINT") == "NUMBER(19,0)"
    assert map_mysql_to_oracle_type("VARCHAR", 100) == "VARCHAR2(100)"
    assert map_mysql_to_oracle_type("LONGTEXT") == "CLOB"
    with pytest.raises(ValueError):
        map_mysql_to_oracle_type("ENUM")  # unsupported (common/reverse.go:362)


def test_collation_o2m_matrix():
    from transferdb_spark.rules.collation import oracle_to_mysql_collation as o2m

    # sensitive default -> binary collation per charset
    assert o2m("BINARY_CS", "utf8mb4") == "UTF8MB4_BIN"
    assert o2m("BINARY", "GBK") == "GBK_BIN"
    # case-insensitive accent-sensitive: 0900_AS_CI on unicode only
    assert o2m("BINARY_CI", "utf8mb4") == "UTF8MB4_0900_AS_CI"
    assert o2m("BINARY_CI", "gb18030") == "GB18030_CHINESE_CI"
    # fully insensitive
    assert o2m("BINARY_AI", "utf8") == "UTF8_GENERAL_CI"
    assert o2m("BINARY_AI", "big5") == "BIG5_CHINESE_CI"
    with pytest.raises(ValueError):
        o2m("BINARY_CS", "latin1")


def test_collation_m2o_roundtrip():
    from transferdb_spark.rules.collation import (
        mysql_to_oracle_collation as m2o,
        oracle_to_mysql_collation as o2m,
    )

    for oc in ("BINARY_CS", "BINARY_CI", "BINARY_AI"):
        got = m2o(o2m(oc, "utf8mb4"))
        assert got == oc
    # CJK ambiguity resolves to the stricter CI class
    assert m2o("GBK_CHINESE_CI") == "BINARY_CI"
