"""DB upsert sink (A7) semantics: idempotence and last-write-wins
(SURVEY §5.3.3 — apply batch twice ⇒ same table state)."""

from __future__ import annotations

import functools
import sqlite3

from upc_sku_data_loader_spark.sources.db import db_sink_upsert, db_source, upsert_sql


def _table_state(path: str) -> list[tuple]:
    conn = sqlite3.connect(path)
    try:
        return sorted(conn.execute("SELECT * FROM t").fetchall())
    finally:
        conn.close()


def test_upsert_idempotent_and_updates(spark, tmp_path):
    db = str(tmp_path / "t.sqlite")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT, x REAL)")
    conn.commit()
    conn.close()
    factory = functools.partial(sqlite3.connect, db, timeout=60.0)

    batch1 = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], "k bigint, v string, x double"
    )
    sink = functools.partial(
        db_sink_upsert, conn_factory=factory, table="t", key_cols=["k"],
        dialect="sqlite", max_connections=2,
    )
    sink(batch1)
    state1 = _table_state(db)
    sink(batch1)  # replay the same batch (simulates a task retry)
    assert _table_state(db) == state1

    sink(spark.createDataFrame([(2, "B", 9.0), (4, "d", 4.5)], batch1.schema))
    assert _table_state(db) == [
        (1, "a", 1.5), (2, "B", 9.0), (3, "c", 3.5), (4, "d", 4.5)
    ]

    got = db_source(spark, factory, "SELECT k, v, x FROM t", "k bigint, v string, x double")
    assert got.count() == 4


def test_upsert_sql_dialects():
    sql = upsert_sql("mysql", "prod", ["upc", "sku", "price"], ["upc"])
    assert "ON DUPLICATE KEY UPDATE" in sql and "sku=VALUES(sku)" in sql
    sql = upsert_sql("postgres", "prod", ["upc", "sku"], ["upc"])
    assert "ON CONFLICT (upc) DO UPDATE" in sql
    sql = upsert_sql("sqlite", "prod", ["upc", "sku"], ["upc"])
    assert "ON CONFLICT(upc) DO UPDATE" in sql and "excluded.sku" in sql
