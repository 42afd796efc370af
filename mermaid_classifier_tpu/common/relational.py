"""Relational ETL engine: sqlite3 + pyarrow.

The reference drives its ETL through DuckDB (reference:
mermaid_classifier/common/duckdb_utils.py:10-250, dataset.py throughout).
DuckDB is not available in this image, so the same relational discipline is
rebuilt on the stdlib sqlite3 engine (C, in-process, SQL window functions)
with pyarrow handling parquet transport. The API mirrors the capabilities the
ETL layer needs:

- temp-table names handed out by a context manager that drops on exit;
- Python-function column transforms implemented the DuckDB-utils way: build
  a DISTINCT-values mapping table, apply the function once per distinct
  value, JOIN it back — never a per-row Python loop over the engine;
- add/replace/filter column helpers on the same mapping-table pattern;
- chunked row iteration and a grouped-rows generator;
- DataFrame in/out and parquet read/write.

Determinism contract: every subsetting operation must ORDER BY an explicit
key (the reference's nondeterministic-LIMIT lesson, reference:
options.py:110-115); helpers here never emit un-ordered LIMITs.
"""

from __future__ import annotations

import sqlite3
import uuid
from collections.abc import Callable, Iterator
from contextlib import contextmanager
from typing import Any

import pandas as pd


def _quote_ident(name: str) -> str:
    if not name.replace("_", "").isalnum():
        raise ValueError(f"suspicious SQL identifier: {name!r}")
    return f'"{name}"'


class Database:
    """One in-memory (or file-backed) sqlite database with ETL helpers."""

    def __init__(self, path: str = ":memory:"):
        self.conn = sqlite3.connect(path)
        self.conn.execute("PRAGMA temp_store = MEMORY")

    # -- basics ---------------------------------------------------------------

    def execute(self, sql: str, params: Any = ()) -> sqlite3.Cursor:
        return self.conn.execute(sql, params)

    def executemany(self, sql: str, rows: Any) -> sqlite3.Cursor:
        return self.conn.executemany(sql, rows)

    def query_df(self, sql: str, params: Any = ()) -> pd.DataFrame:
        cur = self.conn.execute(sql, params)
        columns = [d[0] for d in cur.description]
        return pd.DataFrame(cur.fetchall(), columns=columns)

    def scalar(self, sql: str, params: Any = ()) -> Any:
        row = self.conn.execute(sql, params).fetchone()
        return row[0] if row else None

    def table_exists(self, name: str) -> bool:
        return (
            self.scalar(
                "SELECT count(*) FROM sqlite_master WHERE type='table' AND name=?",
                (name,),
            )
            > 0
        )

    def columns(self, table: str) -> list[str]:
        cur = self.conn.execute(f"SELECT * FROM {_quote_ident(table)} LIMIT 0")
        return [d[0] for d in cur.description]

    def row_count(self, table: str) -> int:
        return int(self.scalar(f"SELECT count(*) FROM {_quote_ident(table)}"))

    # -- frames & parquet --------------------------------------------------------

    def create_table_from_df(self, name: str, df: pd.DataFrame) -> None:
        df.to_sql(name, self.conn, index=False, if_exists="replace")

    def insert_df(self, name: str, df: pd.DataFrame) -> None:
        df.to_sql(name, self.conn, index=False, if_exists="append")

    def read_parquet(self, path: str, table: str) -> None:
        import pyarrow.parquet as pq

        self.create_table_from_df(table, pq.read_table(path).to_pandas())

    def write_parquet(self, sql_or_table: str, path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        sql = (
            f"SELECT * FROM {_quote_ident(sql_or_table)}"
            if sql_or_table.isidentifier()
            else sql_or_table
        )
        pq.write_table(pa.Table.from_pandas(self.query_df(sql)), path)

    def write_csv(self, sql_or_table: str, path: str) -> None:
        sql = (
            f"SELECT * FROM {_quote_ident(sql_or_table)}"
            if sql_or_table.isidentifier()
            else sql_or_table
        )
        self.query_df(sql).to_csv(path, index=False)

    # -- temp tables --------------------------------------------------------------

    @contextmanager
    def temp_table(self, prefix: str = "tmp") -> Iterator[str]:
        """Yield a unique table name; DROP it on exit
        (reference analog: duckdb_temp_table_name, duckdb_utils.py:10-37)."""
        name = f"{prefix}_{uuid.uuid4().hex[:12]}"
        try:
            yield name
        finally:
            self.conn.execute(f"DROP TABLE IF EXISTS {_quote_ident(name)}")

    # -- python-function column ops ---------------------------------------------

    def transform_column(
        self, table: str, column: str, fn: Callable[[Any], Any]
    ) -> None:
        """Replace ``column`` with ``fn(column)`` applied once per DISTINCT
        value via a mapping-table JOIN
        (reference analog: duckdb_transform_column, duckdb_utils.py:40-128)."""
        q_table, q_col = _quote_ident(table), _quote_ident(column)
        distinct = [
            r[0]
            for r in self.conn.execute(
                f"SELECT DISTINCT {q_col} FROM {q_table}"
            ).fetchall()
        ]
        mapping = [(v, fn(v)) for v in distinct]
        with self.temp_table("map") as map_table:
            q_map = _quote_ident(map_table)
            self.conn.execute(f"CREATE TABLE {q_map} (old_value, new_value)")
            self.conn.executemany(
                f"INSERT INTO {q_map} VALUES (?, ?)", mapping
            )
            self.conn.execute(
                f"UPDATE {q_table} SET {q_col} ="
                f" (SELECT new_value FROM {q_map} WHERE old_value IS {q_table}.{q_col})"
            )

    def add_column_from(
        self,
        table: str,
        new_column: str,
        source_columns: list[str],
        fn: Callable[..., Any],
    ) -> None:
        """Add ``new_column`` computed by a Python function of other columns,
        applied once per DISTINCT source tuple
        (reference analog: duckdb_add_column, duckdb_utils.py:77-160)."""
        q_table = _quote_ident(table)
        q_new = _quote_ident(new_column)
        q_srcs = ", ".join(_quote_ident(c) for c in source_columns)
        distinct = self.conn.execute(
            f"SELECT DISTINCT {q_srcs} FROM {q_table}"
        ).fetchall()
        mapping = [(*vals, fn(*vals)) for vals in distinct]
        with self.temp_table("map") as map_table:
            q_map = _quote_ident(map_table)
            src_defs = ", ".join(f"src{i}" for i in range(len(source_columns)))
            self.conn.execute(f"CREATE TABLE {q_map} ({src_defs}, out_value)")
            placeholders = ", ".join("?" for _ in range(len(source_columns) + 1))
            self.conn.executemany(
                f"INSERT INTO {q_map} VALUES ({placeholders})", mapping
            )
            self.conn.execute(f"ALTER TABLE {q_table} ADD COLUMN {q_new}")
            match = " AND ".join(
                f"{q_map}.src{i} IS {q_table}.{_quote_ident(c)}"
                for i, c in enumerate(source_columns)
            )
            self.conn.execute(
                f"UPDATE {q_table} SET {q_new} ="
                f" (SELECT out_value FROM {q_map} WHERE {match})"
            )

    def filter_on_column(
        self, table: str, column: str, keep_fn: Callable[[Any], bool]
    ) -> int:
        """Delete rows whose ``column`` value fails ``keep_fn`` (applied per
        DISTINCT value). Returns the number of deleted rows
        (reference analog: duckdb_filter_on_column, duckdb_utils.py:163-189)."""
        q_table, q_col = _quote_ident(table), _quote_ident(column)
        distinct = [
            r[0]
            for r in self.conn.execute(
                f"SELECT DISTINCT {q_col} FROM {q_table}"
            ).fetchall()
        ]
        drop_values = [v for v in distinct if not keep_fn(v)]
        if not drop_values:
            return 0
        before = self.row_count(table)
        with self.temp_table("drop") as drop_table:
            q_drop = _quote_ident(drop_table)
            self.conn.execute(f"CREATE TABLE {q_drop} (value)")
            self.conn.executemany(
                f"INSERT INTO {q_drop} VALUES (?)", [(v,) for v in drop_values]
            )
            self.conn.execute(
                f"DELETE FROM {q_table} WHERE {q_col} IN (SELECT value FROM {q_drop})"
            )
        return before - self.row_count(table)

    # -- iteration -------------------------------------------------------------

    def iter_rows(
        self, sql: str, params: Any = (), chunk_size: int = 10000
    ) -> Iterator[dict[str, Any]]:
        """Yield rows as dicts, fetching in chunks
        (reference analog: duckdb_utils.py:192-219)."""
        cur = self.conn.execute(sql, params)
        columns = [d[0] for d in cur.description]
        while True:
            rows = cur.fetchmany(chunk_size)
            if not rows:
                return
            for row in rows:
                yield dict(zip(columns, row))

    def grouped_rows(
        self, table: str, group_columns: list[str], chunk_size: int = 10000
    ) -> Iterator[list[dict[str, Any]]]:
        """Yield lists of rows sharing the same group-column values, streaming
        in group order (reference analog: duckdb_grouped_rows,
        duckdb_utils.py:222-250)."""
        order = ", ".join(_quote_ident(c) for c in group_columns)
        current_key: tuple | None = None
        group: list[dict[str, Any]] = []
        for row in self.iter_rows(
            f"SELECT * FROM {_quote_ident(table)} ORDER BY {order}",
            chunk_size=chunk_size,
        ):
            key = tuple(row[c] for c in group_columns)
            if current_key is not None and key != current_key:
                yield group
                group = []
            current_key = key
            group.append(row)
        if group:
            yield group

    def close(self) -> None:
        self.conn.close()
