"""CLI front-door contract: list/oracle work without Spark; run/explain
execute a query end to end."""

from __future__ import annotations

from kafka_pyspark_bigdata_spark.__main__ import main


def test_list_filters_and_exits_zero(capsys):
    assert main(["list", "dedup_"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact" in out and "q_top_customers" not in out


def test_oracle_prints_sql_and_flags_rows_only(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()
    assert main(["oracle", "ml_grid_search"]) == 1  # rows-only contract
    assert main(["oracle", "nope_not_a_query"]) == 1


def test_run_unknown_query_errors(capsys):
    assert main(["run", "nope_not_a_query"]) == 1


def test_run_executes(spark, capsys):
    assert main(["run", "q_topk_orders", "--sf-dir", "/root/testdata/sf0.001", "-n", "3"]) == 0
    assert "o_orderkey" in capsys.readouterr().out
