"""Live JDBC catalog introspection → TableMeta (the target-side twin
of the fixture catalog).

The reference reads the target's actual structure from
information_schema before diffing (/root/reference/database/mysql/
check.go:31-48, reverse.go); the JDBC-generic equivalent is
java.sql.DatabaseMetaData — getColumns / getPrimaryKeys /
getIndexInfo / getImportedKeys — which every driver implements, so
the same reader serves Derby in tests and MySQL/Oracle in production.

All calls are driver-side py4j over ONE connection: catalog reads are
O(columns), never data-sized.
"""

from __future__ import annotations

from transferdb_spark.catalog.meta import ConstraintMeta, IndexMeta, TableMeta
from transferdb_spark.rules.datatypes import OracleColumn

# java.sql.DatabaseMetaData.columnNullable == 1
_COLUMN_NULLABLE = 1


def _connect(spark, url: str, driver: str, user: str, password: str):
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    if user:
        return jvm.java.sql.DriverManager.getConnection(url, user, password)
    return jvm.java.sql.DriverManager.getConnection(url)


def rendered_type(type_name: str, size: int, digits: int | None) -> str:
    """Canonical dialect string for a JDBC metadata column — the SAME
    renderings rules/ansi.ansi_type produces, so generator output and
    introspected actual compare equal when the structure matches."""
    t = type_name.upper()
    if "FOR BIT DATA" in t:
        prefix = t.split(" ", 1)[0].strip("()")
        return f"{prefix} ({size}) FOR BIT DATA"
    if t in ("DECIMAL", "NUMERIC", "DEC"):
        return f"DECIMAL({size},{digits or 0})"
    if t in ("VARCHAR", "CHAR VARYING", "CHARACTER VARYING"):
        return f"VARCHAR({size})"
    if t in ("CHAR", "CHARACTER"):
        return f"CHAR({size})"
    if t == "INT":
        return "INTEGER"
    if t == "FLOAT":
        return "REAL"
    return t


def read_jdbc_table(
    spark,
    url: str,
    table: str,
    schema: str | None = None,
    driver: str = "",
    user: str = "",
    password: str = "",
) -> TableMeta:
    """One live table's structure as a TableMeta whose columns carry
    the target's OWN dialect types (data_type = rendered JDBC type) —
    feed to check via tgt_types=rendered_types(meta)."""
    conn = _connect(spark, url, driver, user, password)
    try:
        md = conn.getMetaData()
        tname = table.upper()
        sname = schema.upper() if schema else None

        cols: list[OracleColumn] = []
        rs = md.getColumns(None, sname, tname, None)
        while rs.next():
            type_name = rs.getString("TYPE_NAME")
            size = rs.getInt("COLUMN_SIZE")
            digits = rs.getInt("DECIMAL_DIGITS")
            cols.append(
                OracleColumn(
                    name=rs.getString("COLUMN_NAME").upper(),
                    data_type=rendered_type(type_name, size, digits),
                    data_length=size,
                    data_precision=size,
                    data_scale=digits,
                    nullable=rs.getInt("NULLABLE") == _COLUMN_NULLABLE,
                )
            )
        rs.close()
        if not cols:
            raise LookupError(f"table {table!r} not found via JDBC metadata at {url}")

        constraints: list[ConstraintMeta] = []
        pk_cols: list[tuple[int, str]] = []
        pk_name = ""
        rs = md.getPrimaryKeys(None, sname, tname)
        while rs.next():
            pk_cols.append((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME").upper()))
            pk_name = rs.getString("PK_NAME") or pk_name
        rs.close()
        if pk_cols:
            constraints.append(
                ConstraintMeta(
                    name=(pk_name or f"PK_{tname}").upper(),
                    ctype="P",
                    columns=tuple(c for _, c in sorted(pk_cols)),
                )
            )

        # FKs: group getImportedKeys rows by FK_NAME (multi-column FKs
        # arrive one row per column, ordered by KEY_SEQ)
        fk_rows: dict[str, list[tuple[int, str, str, str, str]]] = {}
        rs = md.getImportedKeys(None, sname, tname)
        while rs.next():
            fk = (rs.getString("FK_NAME") or "FK").upper()
            delete_rule = {
                0: "CASCADE",  # importedKeyCascade
                2: "SET NULL",  # importedKeySetNull
            }.get(rs.getShort("DELETE_RULE"), "NO ACTION")
            fk_rows.setdefault(fk, []).append(
                (
                    rs.getShort("KEY_SEQ"),
                    rs.getString("FKCOLUMN_NAME").upper(),
                    rs.getString("PKTABLE_NAME").upper(),
                    rs.getString("PKCOLUMN_NAME").upper(),
                    delete_rule,
                )
            )
        rs.close()
        for fk, rows in sorted(fk_rows.items()):
            rows.sort()
            constraints.append(
                ConstraintMeta(
                    name=fk,
                    ctype="R",
                    columns=tuple(r[1] for r in rows),
                    r_table=rows[0][2],
                    r_columns=tuple(r[3] for r in rows),
                    delete_rule=rows[0][4],
                )
            )

        pk_set = set(constraints[0].columns) if pk_cols else set()
        ix_rows: dict[str, list[tuple[int, str, bool]]] = {}
        rs = md.getIndexInfo(None, sname, tname, False, False)
        while rs.next():
            name = rs.getString("INDEX_NAME")
            col = rs.getString("COLUMN_NAME")
            if name is None or col is None:
                continue  # statistics pseudo-rows
            ix_rows.setdefault(name.upper(), []).append(
                (rs.getShort("ORDINAL_POSITION"), col.upper(), not rs.getBoolean("NON_UNIQUE"))
            )
        rs.close()
        indexes: list[IndexMeta] = []
        for name, rows in sorted(ix_rows.items()):
            rows.sort()
            columns = tuple(r[1] for r in rows)
            # drop system-generated backing indexes for PK/unique
            # constraints (Derby names them SQLyyMMdd...): their column
            # set duplicates a constraint the check already diffs
            if set(columns) == pk_set and name.startswith("SQL"):
                continue
            indexes.append(
                IndexMeta(name=name, columns=columns, unique=rows[0][2])
            )

        return TableMeta(
            schema=sname or "",
            name=tname,
            columns=cols,
            constraints=constraints,
            indexes=indexes,
        )
    finally:
        conn.close()


def rendered_types(meta: TableMeta) -> dict[str, str]:
    """column -> dialect type string, for check_table(tgt_types=...)."""
    return {c.name.upper(): c.data_type for c in meta.columns}


def read_jdbc_catalog(
    spark,
    url: str,
    tables: list[str],
    schema: str | None = None,
    driver: str = "",
    user: str = "",
    password: str = "",
) -> dict[str, TableMeta]:
    out: dict[str, TableMeta] = {}
    for t in tables:
        try:
            out[t] = read_jdbc_table(
                spark, url, t, schema=schema, driver=driver, user=user, password=password
            )
        except LookupError:
            continue  # missing on target: check_catalogs reports full-DDL need
    return out
